"""E-MAML meta-RL learner, fully on-device.

TPU re-design of the reference's Ray-based EMAML algorithm
(/root/reference/agents/emaml.py:329-527 and the MAMLLoss in
emaml_policy.py:141-281):

* tasks map onto slices of the lockstep env batch (one ``prob_index`` per
  task, pinned through per-env ResetOptions) instead of Ray rollout
  workers (emaml.py:352-361);
* inner adaptation = per-task SGD on the unclipped surrogate over freshly
  collected on-device rollouts (WorkerLoss, emaml_policy.py:101-137),
  vmapped over the task axis;
* the meta update differentiates through the *re-played* inner SGD chain
  on the stored inner batches and applies the clipped PPO loss on the
  post-adaptation batch (MAMLLoss; the reference uses ``higher`` for the
  same thing) — ``jax.grad`` through the chain replaces ``higher``
  entirely;
* ``first_order=True`` stops gradients through the inner gradients
  (FOMAML) to cut memory;
* the per-task-per-step inner KL coefficient ladder follows KLCoeffMixin
  (emaml_policy.py:284-299).

Everything is one jitted function of pytree arguments (no captured device
arrays — see the axon rule in envs/core.py).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from ..envs.core import BatchedEnv, BatchedState
from .agents import Agent
from .ppo import PPOConfig, PPOBatch, batch_from_trajectory, ppo_loss, \
    surrogate_loss
from .rollout import rollout


@dataclasses.dataclass(frozen=True)
class EMAMLConfig:
    """Defaults follow train.py:43-102 scaled to fit on-device."""

    n_tasks: int = 10               # num_workers in the reference
    envs_per_task: int = 10
    rollout_steps: int = 100        # rollout_fragment_length
    inner_steps: int = 5            # inner_adaptation_steps (ref: 20)
    maml_opt_steps: int = 5         # maml_optimizer_steps
    inner_lr: float = 1e-3
    meta_lr: float = 1e-4
    weight_decay: float = 1e-5      # AdamW meta-opt (emaml_policy.py:330-339)
    first_order: bool = False
    kl_target: float = 0.01         # inner_adaptation_kl_target
    ppo: PPOConfig = dataclasses.field(default_factory=PPOConfig)


class EMAMLState(NamedTuple):
    params: dict
    opt_state: optax.OptState
    kl_coeffs: jax.Array       # f32 [n_tasks, inner_steps] KL ladder
    key: jax.Array
    # success bookkeeping across meta-iterations (the reference's
    # tasks_covered/succeed accumulators, train.py:106-108,118-121):
    tasks_covered: jax.Array   # i32 [n_bank_tasks] times each task sampled
    tasks_succeeded: jax.Array # i32 [n_bank_tasks] times each task solved


def make_meta_optimizer(cfg: EMAMLConfig) -> optax.GradientTransformation:
    return optax.adamw(cfg.meta_lr, weight_decay=cfg.weight_decay)


def init_emaml(agent: Agent, cfg: EMAMLConfig, key: jax.Array,
               obs_dim: int = None, n_bank_tasks: int = 1) -> EMAMLState:
    kp, kk = jax.random.split(key)
    obs_dim = obs_dim if obs_dim is not None else agent.obs_dim
    params = agent.init_fn(kp, jnp.zeros((1, obs_dim), jnp.int8))
    tx = make_meta_optimizer(cfg)
    return EMAMLState(
        params=params, opt_state=tx.init(params),
        kl_coeffs=jnp.full((cfg.n_tasks, cfg.inner_steps), 0.0005),
        key=kk,
        tasks_covered=jnp.zeros((n_bank_tasks,), jnp.int32),
        tasks_succeeded=jnp.zeros((n_bank_tasks,), jnp.int32))


def _inner_update(params, batch: PPOBatch, cfg: EMAMLConfig, agent: Agent):
    """One differentiable inner SGD step on the unclipped surrogate."""
    grads = jax.grad(surrogate_loss)(params, agent, batch, cfg.ppo)
    if cfg.first_order:
        grads = jax.lax.stop_gradient(grads)
    return jax.tree.map(lambda p, g: p - cfg.inner_lr * g, params, grads)


def sample_task_assignment(key: jax.Array, n_bank_tasks: int,
                           cfg: EMAMLConfig) -> jax.Array:
    """Per-env prob_index array pinning one bank task per task slot
    (sample_tasks, agents/env.py:66-67: without replacement)."""
    tasks = jax.random.choice(key, n_bank_tasks, (cfg.n_tasks,),
                              replace=False)
    return jnp.repeat(tasks, cfg.envs_per_task).astype(jnp.int32)


def emaml_train_step(state: EMAMLState, env: BatchedEnv, bs: BatchedState,
                     agent: Agent, cfg: EMAMLConfig):
    """One full EMAML.training_step (emaml.py:346-527).

    ``env`` must be built with per-env ``opts.prob_index`` pinned to the
    task assignment and ``adaptation=True``; batch = n_tasks*envs_per_task.
    Returns (new_state, bs, metrics).
    """
    T, E = cfg.n_tasks, cfg.envs_per_task

    def reshape_task(x):
        # (T, -1): env leaves are [T*E, ...] -> (T, E, ...); ResetPool
        # leaves are [T*E*K, ...] -> (T, E*K, ...) — task segments stay
        # contiguous either way, so per-task slot indexing is preserved
        return x.reshape((T, -1) + x.shape[1:])

    def flatten_task(x):
        return x.reshape((-1,) + x.shape[2:])

    def task_rollout(bs_flat, task_params, key, deterministic):
        """Per-task rollout with per-task params: vmap over the task axis.
        The env's per-env reset options (task pinning) are sliced per task
        alongside the batch."""
        bs_t = jax.tree.map(reshape_task, bs_flat)
        opts_t = jax.tree.map(
            lambda x: reshape_task(x) if jnp.ndim(x) > 0 else x, env.opts)
        opts_axes = jax.tree.map(
            lambda x: 0 if jnp.ndim(x) > 1 else None, opts_t)

        def one(bs_task, params_task, k, opts_task):
            env_task = dataclasses.replace(env, opts=opts_task)
            return rollout(env_task, bs_task, params_task, k,
                           cfg.rollout_steps, agent, deterministic)

        keys = jax.random.split(key, T)
        bs_t, traj, last_v = jax.vmap(
            one, in_axes=(0, 0, 0, opts_axes))(bs_t, task_params, keys,
                                               opts_t)
        return jax.tree.map(flatten_task, bs_t), traj, last_v

    key = state.key
    params0 = state.params
    broadcast = lambda p: jax.tree.map(
        lambda x: jnp.broadcast_to(x, (T,) + x.shape), p)

    # ---- inner adaptation loop (emaml.py:367-401) ----
    def inner(carry, _):
        task_params, bs, key = carry
        key, kr = jax.random.split(key)
        bs, traj, last_v = task_rollout(bs, task_params, kr, False)
        batch = jax.vmap(batch_from_trajectory, in_axes=(0, 0, None))(
            traj, last_v, cfg.ppo)
        new_params = jax.vmap(
            lambda p, b: _inner_update(p, b, cfg, agent))(task_params, batch)
        mean_rew = traj.rewards.mean(axis=(1, 2))   # per task
        return (new_params, bs, key), (batch, mean_rew)

    (adapted, bs, key), (inner_batches, inner_rews) = jax.lax.scan(
        inner, (broadcast(params0), bs, key), None, length=cfg.inner_steps)

    # ---- post-adaptation rollouts, explore=False (emaml.py:410-423) ----
    key, kp = jax.random.split(key)
    bs, post_traj, post_last_v = task_rollout(bs, adapted, kp, True)
    post_batch = jax.vmap(batch_from_trajectory, in_axes=(0, 0, None))(
        post_traj, post_last_v, cfg.ppo)

    # ---- meta loss: replay the inner chain differentiably (MAMLLoss) ----
    def meta_loss(params):
        def per_task(task_idx):
            tb = jax.tree.map(lambda x: x[:, task_idx], inner_batches)
            pb = jax.tree.map(lambda x: x[task_idx], post_batch)

            def chain(p, step_batch):
                # inner-step KL term (KLCoeffMixin ladder); scanned so the
                # replay graph stays one body regardless of inner_steps
                lp, _, _ = agent.evaluate_fn(p, step_batch.obs,
                                             step_batch.actions)
                kl = (step_batch.log_probs - lp).mean()
                p2 = _inner_update(p, step_batch, cfg, agent)
                return p2, kl

            p, kls = jax.lax.scan(chain, params, tb)
            loss, stats = ppo_loss(p, agent, pb, cfg.ppo)
            kl_pen = jnp.sum(state.kl_coeffs[task_idx] * kls)
            return loss + kl_pen, (kls, stats)

        losses, (kls, stats) = jax.vmap(per_task)(jnp.arange(T))
        return losses.mean(), (kls, jax.tree.map(jnp.mean, stats))

    tx = make_meta_optimizer(cfg)

    def meta_opt_step(carry, _):
        params, opt_state = carry
        (loss, aux), grads = jax.value_and_grad(
            meta_loss, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), (loss, aux)

    (params, opt_state), (losses_seq, aux_seq) = jax.lax.scan(
        meta_opt_step, (params0, state.opt_state), None,
        length=cfg.maml_opt_steps)
    loss = losses_seq[-1]
    # KLs / outer stats from the last meta-opt step
    inner_kls = jax.tree.map(lambda x: x[-1], aux_seq[0])
    outer_stats = jax.tree.map(lambda x: x[-1], aux_seq[1])

    # ---- inner KL coefficient ladder (emaml_policy.py:284-299) ----
    kc = state.kl_coeffs
    kc = jnp.where(inner_kls > 2.0 * cfg.kl_target, kc * 1.5, kc)
    kc = jnp.where(inner_kls < 0.5 * cfg.kl_target, kc * 0.5, kc)

    # ---- success bookkeeping (emaml.py:431-454, train.py:118-121) ----
    # a task counts as solved iff its post-adaptation batch contains a
    # positive reward (rewards.max() > 0 in the reference; with the dense
    # shaping 100*sparse - 1 + frac this is equivalent to a sparse solve)
    if jnp.ndim(env.opts.prob_index) > 0:
        task_ids = reshape_task(env.opts.prob_index)[:, 0]  # i32 [T]
    else:                               # unpinned opts: degenerate slot 0
        task_ids = jnp.zeros((T,), jnp.int32)
    task_success = post_traj.rewards.max(axis=(1, 2)) > 0.0
    covered = state.tasks_covered.at[task_ids].add(1)
    succeeded = state.tasks_succeeded.at[task_ids].add(
        task_success.astype(jnp.int32))

    # per-episode reward aggregates for the wandb schema
    # (train.py:130-150: adapt/post eprew max/mean/min); episodes are
    # approximated by per-env rollout sums, as RLlib's episode_reward_*
    # aggregates completed episodes per phase
    post_ep = post_traj.rewards.sum(axis=1)              # [T, E] per-env sum
    metrics = {
        "meta_loss": loss,
        "outer_policy_loss": outer_stats["policy_loss"],
        "outer_vf_loss": outer_stats["vf_loss"],
        "outer_kl_loss": outer_stats["kl"],
        "outer_total_loss": outer_stats["total_loss"],
        "adapt_reward_mean": inner_rews.mean(),
        "adapt_reward_max": inner_rews.max(),
        "adapt_reward_min": inner_rews.min(),
        "post_reward_mean": post_traj.rewards.mean(),
        "post_reward_per_task": post_traj.rewards.mean(axis=(1, 2)),
        "post_eprew_mean": post_ep.mean(),
        "post_eprew_max": post_ep.max(),
        "post_eprew_min": post_ep.min(),
        "inner_kl_mean": inner_kls.mean(),
        "sampled_tasks": task_ids,
        "once_successful": task_success,
        "num_covered_tasks": (covered > 0).sum(),
        "num_succeed_tasks": (succeeded > 0).sum(),
        # the post-adaptation batch, for successful-batch persistence
        # (train.py:126-128); a device array — the driver only pays the
        # host transfer when it actually saves
        "post_batch": post_batch,
    }
    new_state = EMAMLState(params=params, opt_state=opt_state,
                           kl_coeffs=kc, key=key,
                           tasks_covered=covered, tasks_succeeded=succeeded)
    return new_state, bs, metrics
