"""BBox-wrapped env (counterpart of reference examples/example_bbox.py)."""
import gymnasium as gym
import arcle_tpu
from arcle_tpu.loaders import SyntheticLoader
from arcle_tpu.wrappers import BBoxWrapper

env = BBoxWrapper(gym.make("ARCLE-TPU/O2ARCv2Env-v0",
                           data_loader=SyntheticLoader(8)))
obs, info = env.reset(options={"prob_index": 0})
for _ in range(10):
    obs, reward, term, trunc, info = env.step(env.action_space.sample())
print("ok")
