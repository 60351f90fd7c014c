"""Environment state pytree.

The reference keeps env state as a mutable dict of ``np.int8`` arrays
(``/root/reference/arcle/envs/base.py:155-166`` plus the O2ARC additions at
``o2arcenv.py:16-34``).  Here the complete state of *one* environment is a
frozen dataclass of fixed-shape ``jnp.int8`` arrays so that a batch of B
environments is simply the same pytree with a leading batch axis (``vmap``),
shardable over a device mesh on that axis.

One unified struct serves all three env families (Raw / ARC / O2ARCv2): the
families differ only in which fields their observation exposes and which
operations their op-table enables.  Keeping the superset in one struct keeps
the stepping code monomorphic (a single compiled kernel per family).

Scalar-ish fields are stored as rank-0 arrays; the observation builders in
``arcle_tpu.envs`` reshape them to the reference's ``(1,)`` convention.

All *semantic* fields are int8 to match the reference's observation dtype
contract exactly (int8 wraparound on trial counters / positions included).
Bookkeeping fields that never enter the observation (steps, submit_count,
...) are int32.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

I8 = jnp.int8
I32 = jnp.int32


def _field(**kw):
    return dataclasses.field(**kw)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class EnvState:
    """Complete per-environment state (superset across env families).

    Field parity with the reference state dict:

    ===================  =============================================
    field                reference source
    ===================  =============================================
    trials_remain        base.py:158
    terminated           base.py:159
    input / input_dim    base.py:161-162
    grid / grid_dim      base.py:164-165
    selected             o2arcenv.py:20
    clip / clip_dim      o2arcenv.py:21-22 (also arcenv.py:84-88)
    active               o2arcenv.py:24  (object_states.active)
    object               o2arcenv.py:25
    object_sel           o2arcenv.py:26
    object_dim           o2arcenv.py:27
    object_pos           o2arcenv.py:28
    background           o2arcenv.py:29
    rotation_parity      o2arcenv.py:30
    ===================  =============================================

    The task context (``answer``) lives *inside* the state because in a
    lockstep batch every env instance solves its own task; the reference
    keeps it as an env attribute (``base.py:34``).
    """

    # --- core (all env families) ---
    trials_remain: jax.Array   # i8 []      countdown; -1 keeps decrementing
    terminated: jax.Array      # i8 []      sticky flag
    input: jax.Array           # i8 [H,W]   padded task input
    input_dim: jax.Array       # i8 [2]
    grid: jax.Array            # i8 [H,W]   working grid (junk legal outside dims)
    grid_dim: jax.Array        # i8 [2]

    # --- clipboard (ARCEnv, O2ARCv2Env) ---
    clip: jax.Array            # i8 [H,W]
    clip_dim: jax.Array        # i8 [2]

    # --- object-selection state machine (O2ARCv2Env) ---
    selected: jax.Array        # i8 [H,W]   last committed selection
    active: jax.Array          # i8 []
    object: jax.Array          # i8 [H,W]   floating object buffer (origin-anchored)
    object_sel: jax.Array      # i8 [H,W]
    object_dim: jax.Array      # i8 [2]
    object_pos: jax.Array      # i8 [2]     signed; may go off-grid
    background: jax.Array      # i8 [H,W]
    rotation_parity: jax.Array # i8 []

    # --- task context ---
    answer: jax.Array          # i8 [H,W]   padded solution grid
    answer_dim: jax.Array      # i8 [2]

    # --- reset-time options (dynamic per env, base.py:87-93) ---
    reset_on_submit: jax.Array # i8 []

    # --- bookkeeping (not part of the observation) ---
    steps: jax.Array           # i32 []     action counter (info["steps"])
    submit_count: jax.Array    # i32 []     info["submit_count"]
    last_action_op: jax.Array  # i32 []     -1 before first step
    last_reward: jax.Array     # f32 []

    @property
    def hw(self) -> Tuple[int, int]:
        return self.input.shape[-2], self.input.shape[-1]

    def replace(self, **kw: Any) -> "EnvState":
        return dataclasses.replace(self, **kw)


def empty_state(H: int = 30, W: int = 30, max_trial: int = -1) -> EnvState:
    """An all-zero single-env state (useful as a shape/dtype template)."""
    g = jnp.zeros((H, W), I8)
    d2 = jnp.zeros((2,), I8)
    s0 = jnp.zeros((), I8)
    return EnvState(
        trials_remain=jnp.asarray(max_trial, I8),
        terminated=s0,
        input=g, input_dim=d2,
        grid=g, grid_dim=d2,
        clip=g, clip_dim=d2,
        selected=g, active=s0,
        object=g, object_sel=g,
        object_dim=d2, object_pos=d2,
        background=g, rotation_parity=s0,
        answer=g, answer_dim=d2,
        reset_on_submit=s0,
        steps=jnp.zeros((), I32),
        submit_count=jnp.zeros((), I32),
        last_action_op=jnp.asarray(-1, I32),
        last_reward=jnp.zeros((), jnp.float32),
    )


def init_state(
    input_grid: jax.Array,    # i8 [H,W] padded
    input_dim: jax.Array,     # [2]
    answer: jax.Array,        # i8 [H,W] padded
    answer_dim: jax.Array,    # [2]
    max_trial: int | jax.Array = -1,
    reset_on_submit: int | jax.Array = 0,
) -> EnvState:
    """Fresh state for a task pair.

    Mirrors the reference's ``init_state`` semantics (base.py:155-166 +
    o2arcenv.py:16-34): grid starts as a copy of the input, grid_dim =
    input_dim, everything else zeroed, trials_remain = max_trial.
    """
    H, W = input_grid.shape[-2], input_grid.shape[-1]
    rows = jax.lax.broadcasted_iota(I32, (H, W), 0)
    cols = jax.lax.broadcasted_iota(I32, (H, W), 1)
    ind = input_dim.astype(I32)
    inside = (rows < ind[0]) & (cols < ind[1])
    # base.py:164 pads the initial grid with zeros outside the input dims.
    grid0 = jnp.where(inside, input_grid, 0).astype(I8)
    g = jnp.zeros((H, W), I8)
    d2 = jnp.zeros((2,), I8)
    s0 = jnp.zeros((), I8)
    return EnvState(
        trials_remain=jnp.asarray(max_trial, I8).reshape(()),
        terminated=s0,
        input=grid0, input_dim=input_dim.astype(I8),
        grid=grid0, grid_dim=input_dim.astype(I8),
        clip=g, clip_dim=d2,
        selected=g, active=s0,
        object=g, object_sel=g,
        object_dim=d2, object_pos=d2,
        background=g, rotation_parity=s0,
        answer=answer.astype(I8), answer_dim=answer_dim.astype(I8),
        reset_on_submit=jnp.asarray(reset_on_submit, I8).reshape(()),
        steps=jnp.zeros((), I32),
        submit_count=jnp.zeros((), I32),
        last_action_op=jnp.asarray(-1, I32),
        last_reward=jnp.zeros((), jnp.float32),
    )


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class Action:
    """selection mask + operation index (base.py:134-138)."""

    selection: jax.Array   # i8 [H,W]
    operation: jax.Array   # i32 []

    def replace(self, **kw: Any) -> "Action":
        return dataclasses.replace(self, **kw)


def make_action(selection: np.ndarray, operation: int) -> Action:
    return Action(
        selection=jnp.asarray(selection, I8),
        operation=jnp.asarray(operation, I32).reshape(()),
    )
