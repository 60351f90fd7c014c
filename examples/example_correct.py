"""Scripted correct solve (counterpart of examples/example_correct.py):
color the grid to match the answer, resize, submit -> reward 1."""
import numpy as np
import gymnasium as gym
import arcle_tpu
from arcle_tpu.loaders import ListLoader

inp = np.zeros((3, 3), np.int8)
ans = np.full((3, 3), 4, np.int8)
env = gym.make("ARCLE-TPU/O2ARCv2Env-v0",
               data_loader=ListLoader([([inp], [ans], [inp], [ans], {})]))
obs, info = env.reset(options={"prob_index": 0, "subprob_index": 0})
sel = np.zeros((30, 30), np.int8)
sel[:3, :3] = 1
obs, r, term, *_ = env.step({"selection": sel, "operation": 4})  # Color4
obs, r, term, *_ = env.step({"selection": np.zeros((30, 30), np.int8),
                             "operation": 34})                   # Submit
assert r == 1.0 and term, (r, term)
print("solved, reward", r)
