"""On-device trajectory collection.

The TPU answer to the reference's Ray RolloutWorker sampling loop
(emaml.py:367-401 -> RolloutWorker -> env.step): a ``lax.scan`` over T
lockstep steps of a :class:`BatchedEnv`, with the policy applied on device
and actions decoded through the bbox wrapper — no host round-trips inside
an iteration.  Everything rides through jit as arguments (axon rule: no
captured device arrays).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..core.state import Action
from ..core.geometry import bbox_selection, bbox_selection_flat
from ..envs.core import BatchedEnv, BatchedState, flatten_grids, \
    unflatten_grids


class Trajectory(NamedTuple):
    """Time-major rollout storage ([T, B, ...])."""

    obs: jax.Array        # f32 [T, B, D]    flattened FilterO2ARC obs
    actions: jax.Array    # i32 [T, B, 5]    (x1, y1, x2, y2, op)
    log_probs: jax.Array  # f32 [T, B]
    values: jax.Array     # f32 [T, B]
    rewards: jax.Array    # f32 [T, B]
    dones: jax.Array      # bool [T, B]      terminated | truncated
    terminated: jax.Array # bool [T, B]      true terminations (solves /
                          # trial exhaustion) — metrics only; GAE cuts at
                          # any episode boundary


def decode_bbox_actions(actions: jax.Array, H: int = 30, W: int = 30,
                        flat: bool = False) -> Action:
    """[B,5] ints -> selection-mask Action (BBoxWrapper semantics)."""
    builder = bbox_selection_flat if flat else bbox_selection
    return Action(
        selection=jax.vmap(builder, in_axes=(0, 0, 0, 0, None, None))(
            actions[:, 0], actions[:, 1], actions[:, 2], actions[:, 3], H, W),
        operation=actions[:, 4],
    )


def rollout(env: BatchedEnv, bs: BatchedState, params, key: jax.Array,
            n_steps: int, agent,
            deterministic: bool = False) -> Tuple[BatchedState, Trajectory, jax.Array]:
    """Collect ``n_steps`` of experience with an :class:`Agent`;
    returns (carry, traj, last_value)."""

    # With the pallas megakernel the whole loop stays in the flat layout
    # (step_flat + flat action masks + obs concatenated from flat grids):
    # no relayout copies anywhere in the steady state.  The XLA path keeps
    # the square step but still rides a flat carry (4x less HBM).
    pure_flat = env.use_pallas

    def body(carry, _):
        bs_flat, key = carry
        key, ka = jax.random.split(key)
        if pure_flat:
            obs = agent.obs_fn(bs_flat.env)
            acts, lp, value = agent.sample_fn(params, obs, ka, deterministic)
            bs2, obs_env, rew, term, trunc = env.step_flat(
                bs_flat, decode_bbox_actions(acts, flat=True))
            next_carry = bs2
        else:
            bs = unflatten_grids(bs_flat)
            obs = agent.obs_fn(bs.env)
            acts, lp, value = agent.sample_fn(params, obs, ka, deterministic)
            bs2, obs_env, rew, term, trunc = env.step(
                bs, decode_bbox_actions(acts))
            next_carry = flatten_grids(bs2)
        out = Trajectory(obs=obs, actions=acts, log_probs=lp, values=value,
                         rewards=rew, dones=term | trunc, terminated=term)
        return (next_carry, key), out

    (bs_flat, key), traj = jax.lax.scan(
        body, (flatten_grids(bs), key), None, length=n_steps)
    bs = unflatten_grids(bs_flat)
    last_obs = agent.obs_fn(bs.env)
    zero_act = jnp.zeros(last_obs.shape[:-1] + (5,), jnp.int32)
    _, last_value, _ = agent.evaluate_fn(params, last_obs, zero_act)
    return bs, traj, last_value


def gae(traj: Trajectory, last_value: jax.Array, gamma: float,
        lam: float) -> Tuple[jax.Array, jax.Array]:
    """Generalized advantage estimation over time-major trajectories
    (the reference's RLlib GAE postprocessing, emaml_policy.py:449-460).

    With in-graph auto-reset the observation after a ``done`` belongs to a
    fresh episode, so value bootstrapping is cut at *any* episode boundary
    (truncations are treated as terminations — the standard lockstep
    simplification; the reference's TimeLimit path bootstraps truncations
    host-side instead).
    """
    def body(carry, xs):
        adv_next, v_next = carry
        value, reward, done = xs
        noncut = 1.0 - done.astype(jnp.float32)
        delta = reward + gamma * v_next * noncut - value
        adv = delta + gamma * lam * noncut * adv_next
        return (adv, value), adv

    (_, _), advs = jax.lax.scan(
        body, (jnp.zeros_like(last_value), last_value),
        (traj.values, traj.rewards, traj.dones),
        reverse=True)
    returns = advs + traj.values
    return advs, returns
