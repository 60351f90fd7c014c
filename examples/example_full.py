"""Full-featured usage (counterpart of reference examples/example_full.py):
gym.make an O2ARC env with all options and take masked random actions."""
import gymnasium as gym
import numpy as np
import arcle_tpu
from arcle_tpu.loaders import SyntheticLoader

env = gym.make("ARCLE-TPU/O2ARCv2Env-v0", data_loader=SyntheticLoader(8),
               max_grid_size=(30, 30), colors=10, max_trial=3)
obs, info = env.reset(options={"adaptation": True, "prob_index": 1})
for _ in range(20):
    action = env.action_space.sample()
    obs, reward, term, trunc, info = env.step(action)
    if term or trunc:
        obs, info = env.reset()
print("ok, steps:", info["steps"])
