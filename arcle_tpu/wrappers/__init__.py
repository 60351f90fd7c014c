"""Action/observation wrappers: Gymnasium classes for the compat layer and
pure functions for the batched engine.

Counterparts of /root/reference/arcle/wrappers/bbox.py:9-49 (BBoxWrapper,
PointWrapper), agents/wrapper.py (max_grid_size variants, O2ARCNoFillEnv
registration) and agents/env.py:89-126 (FilterO2ARC).
"""

from __future__ import annotations

from collections import OrderedDict
from typing import Dict, Tuple

import gymnasium as gym
import jax
import jax.numpy as jnp
import numpy as np
from gymnasium import spaces

from ..core.geometry import bbox_selection, point_selection
from ..core.state import Action, EnvState, I32


# ---------------------------------------------------------------------------
# Functional action builders (for the batched/jit path)
# ---------------------------------------------------------------------------
def bbox_action(x1, y1, x2, y2, op, H: int = 30, W: int = 30) -> Action:
    """(x1,y1,x2,y2,op) -> selection-mask action (bbox.py:22-30)."""
    return Action(selection=bbox_selection(x1, y1, x2, y2, H, W),
                  operation=jnp.asarray(op, I32))


def point_action(x, y, op, H: int = 30, W: int = 30) -> Action:
    """(x,y,op) -> one-pixel action (bbox.py:43-49)."""
    return Action(selection=point_selection(x, y, H, W),
                  operation=jnp.asarray(op, I32))


batched_bbox_action = jax.vmap(bbox_action, in_axes=(0, 0, 0, 0, 0, None, None))
batched_point_action = jax.vmap(point_action, in_axes=(0, 0, 0, None, None))


# The 9-key observation projection of FilterO2ARC (agents/env.py:109-126).
FILTER_O2ARC_KEYS = ("trials_remain", "grid", "grid_dim", "clip", "clip_dim",
                     "active", "object", "object_dim", "object_pos")


def filter_obs(state: EnvState) -> Dict[str, jax.Array]:
    """Project a (possibly batched) EnvState to the FilterO2ARC key set."""
    return OrderedDict(
        (k, getattr(state, k)) for k in FILTER_O2ARC_KEYS)


def flatten_obs(state: EnvState) -> jax.Array:
    """FilterO2ARC + FlattenObservation as one pure function: concatenation
    in alphabetical key order, matching Gymnasium's Dict flattening (the
    order GPTPolicy.unflatten_vec hard-codes, GPTPolicy.py:17-42)."""
    flat = []
    for k in sorted(FILTER_O2ARC_KEYS):
        v = getattr(state, k)
        if k in ("grid", "clip", "object"):          # [..., H, W] -> [..., H*W]
            if v.shape[-2:] == (30, 30):             # square layout
                v = v.reshape(*v.shape[:-2], -1)
            flat.append(v)                           # flat layout: as-is
        elif k in ("grid_dim", "clip_dim", "object_dim", "object_pos"):
            flat.append(v)                            # [..., 2]
        else:                                         # scalars -> [..., 1]
            flat.append(v[..., None])
    # int8 keeps rollout storage/traffic 4x smaller; every field fits the
    # int8 range by the observation-space contract. Models cast on entry.
    return jnp.concatenate([f.astype(jnp.int8) for f in flat], axis=-1)


# Full 16-field flattening in the reference's FlattenObservation order
# (GPTPolicy.unflatten_vec hard-codes it, GPTPolicy.py:17-42): Dict keys
# alphabetical with object_states nested between input_dim and selected.
FULL_OBS_FIELDS = (
    ("clip", 900), ("clip_dim", 2), ("grid", 900), ("grid_dim", 2),
    ("input", 900), ("input_dim", 2), ("active", 1), ("background", 900),
    ("object", 900), ("object_dim", 2), ("object_pos", 2),
    ("object_sel", 900), ("rotation_parity", 1), ("selected", 900),
    ("terminated", 1), ("trials_remain", 1),
)
FULL_OBS_DIM = sum(n for _, n in FULL_OBS_FIELDS)   # 6314


def full_flatten_obs(state: EnvState) -> jax.Array:
    """Full observation vector (the GPT training path, which does not use
    FilterO2ARC — train_gpt.py feeds the complete flattened dict)."""
    flat = []
    for k, n in FULL_OBS_FIELDS:
        v = getattr(state, k)
        if n == 900:
            if v.shape[-2:] == (30, 30):
                v = v.reshape(*v.shape[:-2], -1)
            flat.append(v)
        elif n == 2:
            flat.append(v)
        else:
            flat.append(v[..., None])
    return jnp.concatenate([f.astype(jnp.int8) for f in flat], axis=-1)


def unflatten_full(obs: jax.Array, H: int = 30, W: int = 30):
    """Inverse of :func:`full_flatten_obs` -> dict of int arrays
    (GPTPolicy.unflatten_vec counterpart)."""
    out = {}
    ofs = 0
    for k, n in FULL_OBS_FIELDS:
        v = obs[..., ofs:ofs + n]
        ofs += n
        if n == 900:
            v = v.reshape(*v.shape[:-1], H, W)
        elif n == 1:
            v = v.squeeze(-1)
        out[k] = v.astype(jnp.int32)
    return out


# ---------------------------------------------------------------------------
# Gymnasium wrappers (compat layer)
# ---------------------------------------------------------------------------
class BBoxWrapper(gym.ActionWrapper):
    def __init__(self, env: gym.Env):
        super().__init__(env)
        u = env.unwrapped
        self.action_space = spaces.Tuple((
            spaces.Discrete(u.H), spaces.Discrete(u.W),
            spaces.Discrete(u.H), spaces.Discrete(u.W),
            spaces.Discrete(len(u.operations)),
        ))

    def action(self, action: Tuple):
        x1, y1, x2, y2, op = action
        u = self.env.unwrapped
        sel = np.zeros((u.H, u.W), np.int8)
        x1, x2 = min(x1, x2), max(x1, x2)
        y1, y2 = min(y1, y2), max(y1, y2)
        sel[x1:x2 + 1, y1:y2 + 1] = 1
        return {"selection": sel, "operation": op}


class PointWrapper(gym.ActionWrapper):
    def __init__(self, env: gym.Env):
        super().__init__(env)
        u = env.unwrapped
        self.action_space = spaces.Tuple((
            spaces.Discrete(u.H), spaces.Discrete(u.W),
            spaces.Discrete(len(u.operations)),
        ))

    def action(self, action: Tuple):
        x, y, op = action
        u = self.env.unwrapped
        sel = np.zeros((u.H, u.W), np.int8)
        sel[x, y] = 1
        return {"selection": sel, "operation": op}


class FilterO2ARC(gym.ObservationWrapper):
    """Project the O2ARC dict obs to 9 keys for MLP training
    (agents/env.py:89-126)."""

    def __init__(self, env: gym.Env):
        super().__init__(env)
        u = env.unwrapped
        H, W = u.H, u.W
        self.observation_space = spaces.Dict({
            "trials_remain": spaces.Box(-1, u.max_trial, shape=(1,),
                                        dtype=np.int8),
            "grid": spaces.Box(0, u.colors, (H, W), dtype=np.int8),
            "grid_dim": spaces.Box(low=np.array([1, 1]),
                                   high=np.array([H, W]), dtype=np.int8),
            "clip": spaces.Box(0, u.colors, (H, W), dtype=np.int8),
            "clip_dim": spaces.Box(low=np.array([0, 0]),
                                   high=np.array([H, W]), dtype=np.int8),
            "active": spaces.MultiBinary(1),
            "object": spaces.Box(0, u.colors, (H, W), dtype=np.int8),
            "object_dim": spaces.Box(low=np.array([0, 0]),
                                     high=np.array([H, W]), dtype=np.int8),
            "object_pos": spaces.Box(low=np.array([-128, -128]),
                                     high=np.array([127, 127]),
                                     dtype=np.int8),
        })

    def observation(self, observation):
        o2s = observation["object_states"]
        return OrderedDict([
            ("trials_remain", observation["trials_remain"]),
            ("grid", observation["grid"]),
            ("grid_dim", observation["grid_dim"]),
            ("clip", observation["clip"]),
            ("clip_dim", observation["clip_dim"]),
            ("active", o2s["active"]),
            ("object", o2s["object"]),
            ("object_dim", o2s["object_dim"]),
            ("object_pos", o2s["object_pos"]),
        ])


__all__ = [
    "bbox_action", "point_action", "batched_bbox_action",
    "batched_point_action", "filter_obs", "flatten_obs",
    "full_flatten_obs", "unflatten_full", "FULL_OBS_DIM",
    "FILTER_O2ARC_KEYS", "BBoxWrapper", "PointWrapper", "FilterO2ARC",
]
