"""PPO learner (flax/optax), sharded-data-parallel ready.

The loss mirrors the reference's functional ``PPOLoss``
(/root/reference/agents/emaml_policy.py:38-99): clipped surrogate +
clipped value loss + entropy bonus + KL penalty against the behavior
policy.  Gradient sync across a device mesh happens automatically when the
train step is jitted with the batch sharded and params replicated — the
TPU counterpart of the reference's single-GPU learn_on_batch.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import optax

from .rollout import Trajectory, gae


@dataclasses.dataclass(frozen=True)
class PPOConfig:
    """Hyperparameters; defaults follow the reference EMAMLConfig / drivers
    (train.py:43-59, emaml.py:161-280)."""

    gamma: float = 0.9
    gae_lambda: float = 1.0
    clip_eps: float = 0.3        # clip_param (emaml.py:122)
    vf_clip: float = 10.0        # vf_clip_param (emaml.py:123)
    vf_coeff: float = 0.1        # vf_loss_coeff (train.py:56)
    entropy_coeff: float = 0.0   # (emaml.py:121)
    kl_coeff: float = 0.0005
    lr: float = 1e-4
    n_epochs: int = 1
    n_minibatches: int = 1
    max_grad_norm: float = 10.0  # grad_clip (train.py:58); 0 = off


class PPOBatch(NamedTuple):
    obs: jax.Array        # [N, D]
    actions: jax.Array    # [N, 5]
    log_probs: jax.Array  # [N]
    values: jax.Array     # [N]
    advantages: jax.Array # [N]
    returns: jax.Array    # [N]


def batch_from_trajectory(traj: Trajectory, last_value: jax.Array,
                          cfg: PPOConfig) -> PPOBatch:
    adv, ret = gae(traj, last_value, cfg.gamma, cfg.gae_lambda)
    adv_n = (adv - adv.mean()) / (adv.std() + 1e-8)
    flat = lambda x: x.reshape((-1,) + x.shape[2:])
    return PPOBatch(obs=flat(traj.obs), actions=flat(traj.actions),
                    log_probs=flat(traj.log_probs), values=flat(traj.values),
                    advantages=flat(adv_n), returns=flat(ret))


def ppo_loss(params, agent, batch: PPOBatch, cfg: PPOConfig):
    """Clipped PPO loss (emaml_policy.py:38-99)."""
    lp, value, entropy_arr = agent.evaluate_fn(params, batch.obs,
                                               batch.actions)
    ratio = jnp.exp(lp - batch.log_probs)
    surr = jnp.minimum(
        ratio * batch.advantages,
        jnp.clip(ratio, 1 - cfg.clip_eps, 1 + cfg.clip_eps)
        * batch.advantages)
    policy_loss = -surr.mean()

    vf_err = (value - batch.returns) ** 2
    vf_clipped = (batch.values
                  + jnp.clip(value - batch.values, -cfg.vf_clip, cfg.vf_clip)
                  - batch.returns) ** 2
    vf_loss = 0.5 * jnp.maximum(vf_err, vf_clipped).mean()

    entropy = entropy_arr.mean()
    approx_kl = (batch.log_probs - lp).mean()

    total = (policy_loss + cfg.vf_coeff * vf_loss
             - cfg.entropy_coeff * entropy + cfg.kl_coeff * approx_kl)
    stats = {"policy_loss": policy_loss, "vf_loss": vf_loss,
             "entropy": entropy, "kl": approx_kl, "total_loss": total}
    return total, stats


def surrogate_loss(params, agent, batch: PPOBatch, cfg: PPOConfig):
    """The *unclipped* inner-loop surrogate (WorkerLoss,
    emaml_policy.py:101-137): plain importance-weighted advantage +
    value error; used for E-MAML inner adaptation steps."""
    lp, value, _ = agent.evaluate_fn(params, batch.obs, batch.actions)
    ratio = jnp.exp(lp - batch.log_probs)
    policy_loss = -(ratio * batch.advantages).mean()
    vf_loss = 0.5 * ((value - batch.returns) ** 2).mean()
    return policy_loss + cfg.vf_coeff * vf_loss


def make_optimizer(cfg: PPOConfig) -> optax.GradientTransformation:
    tx = [optax.adam(cfg.lr)]
    if cfg.max_grad_norm > 0:
        tx.insert(0, optax.clip_by_global_norm(cfg.max_grad_norm))
    return optax.chain(*tx)


def train_step(params, opt_state, batch: PPOBatch, key: jax.Array,
               agent, tx: optax.GradientTransformation,
               cfg: PPOConfig):
    """n_epochs x n_minibatches PPO updates on one batch (pure)."""
    n = batch.obs.shape[0]
    mb = max(1, n // cfg.n_minibatches)

    def epoch(carry, ek):
        params, opt_state = carry
        perm = jax.random.permutation(ek, n)
        shuf = jax.tree.map(lambda x: x[perm], batch)

        def minibatch(carry, i):
            params, opt_state = carry
            sl = jax.tree.map(
                lambda x: jax.lax.dynamic_slice_in_dim(x, i * mb, mb, 0),
                shuf)
            (loss, stats), grads = jax.value_and_grad(
                ppo_loss, has_aux=True)(params, agent, sl, cfg)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), stats

        (params, opt_state), stats = jax.lax.scan(
            minibatch, (params, opt_state),
            jnp.arange(cfg.n_minibatches))
        return (params, opt_state), jax.tree.map(jnp.mean, stats)

    keys = jax.random.split(key, cfg.n_epochs)
    (params, opt_state), stats = jax.lax.scan(
        epoch, (params, opt_state), keys)
    return params, opt_state, jax.tree.map(jnp.mean, stats)
