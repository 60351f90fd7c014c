"""RawARCEnv at 5x5 with Mini-ARC-style tasks (counterpart of
examples/example_bbox_mini.py)."""
import gymnasium as gym
import arcle_tpu
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.wrappers import BBoxWrapper

loader = SyntheticLoader(8, min_size=5, max_size=5)
env = BBoxWrapper(gym.make("ARCLE-TPU/RawARCEnv-v0", data_loader=loader,
                           max_grid_size=(5, 5)))
obs, info = env.reset(options={"prob_index": 0})
for _ in range(10):
    obs, reward, term, trunc, info = env.step(env.action_space.sample())
print("ok")
