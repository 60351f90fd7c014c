"""Policy-agnostic agent interface for the rollout/PPO/E-MAML machinery.

An :class:`Agent` packages three pure functions over a flat observation
vector, so the learners never care which network family is behind them:

* ``obs_fn(env_state) -> obs``             batched observation builder
* ``sample_fn(params, obs, key, det) -> (actions[...,5], log_prob, value)``
* ``evaluate_fn(params, obs, actions) -> (log_prob, value, entropy)``

Two factories mirror the reference's two training paths:

* :func:`mlp_agent` — FilterO2ARC+Flatten obs, multi-categorical 5-tuple
  heads (the train.py MLP pipeline, train.py:62-68).
* :func:`gpt_agent` — full flattened obs, transformer forward, categorical
  op + truncated-normal bbox autoregressive head (train_gpt.py +
  bboxdist.py).
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp

from ..models.mlp import (
    FCPolicy, multi_categorical_sample, multi_categorical_log_prob,
    multi_categorical_entropy, onehot_take,
)
from ..models.gpt import GPTPolicy
from ..models.truncated_normal import TruncatedNormal
from ..models.bbox_dist import MIN_LOG_STD, MAX_LOG_STD
from ..wrappers import flatten_obs, full_flatten_obs, unflatten_full


@dataclasses.dataclass(frozen=True)
class Agent:
    obs_fn: Callable
    sample_fn: Callable
    evaluate_fn: Callable
    init_fn: Callable          # (key, example_obs) -> params
    obs_dim: int


def mlp_agent(policy: FCPolicy) -> Agent:
    def sample_fn(params, obs, key, deterministic=False):
        logits_tuple, value = policy.apply(params, obs)
        if deterministic:
            acts = jnp.stack([jnp.argmax(l, -1).astype(jnp.int32)
                              for l in logits_tuple], axis=-1)
            lp = multi_categorical_log_prob(logits_tuple, acts)
        else:
            acts, lp = multi_categorical_sample(key, logits_tuple)
        return acts, lp, value

    def evaluate_fn(params, obs, actions):
        logits_tuple, value = policy.apply(params, obs)
        lp = multi_categorical_log_prob(logits_tuple, actions)
        ent = multi_categorical_entropy(logits_tuple)
        return lp, value, ent

    return Agent(obs_fn=flatten_obs, sample_fn=sample_fn,
                 evaluate_fn=evaluate_fn,
                 init_fn=lambda key, obs: policy.init(key, obs),
                 obs_dim=2710)


def _gpt_forward(model: GPTPolicy, params, obs):
    f = unflatten_full(obs)
    return model.apply(params, f["grid"].astype(jnp.int8), f["grid_dim"],
                       f["input"].astype(jnp.int8), f["input_dim"],
                       f["trials_remain"], f["active"])


def _gpt_bbox_dist(out, operation):
    def take(a):                      # [..., n_ops, 4] select per op
        n = a.shape[-2]
        classes = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
        oh = (operation[..., None] == classes).astype(a.dtype)
        return jnp.einsum("...o,...od->...d", oh, a)
    mean = jax.nn.sigmoid(take(out["bbox_mean_all"]))
    std = jnp.exp(jnp.clip(take(out["bbox_std_all"]),
                           MIN_LOG_STD, MAX_LOG_STD))
    return TruncatedNormal.create(mean, std, 0.0, 1.0)


def gpt_agent(model: GPTPolicy, grid_size: int = 30) -> Agent:
    def sample_fn(params, obs, key, deterministic=False):
        out = _gpt_forward(model, params, obs)
        k_op, k_bb = jax.random.split(key)
        logits = out["op_logits"]
        if deterministic:
            op = jnp.argmax(logits, -1)
        else:
            op = jax.random.categorical(k_op, logits, axis=-1)
        lp_op = onehot_take(jax.nn.log_softmax(logits, -1), op)
        dist = _gpt_bbox_dist(out, op)
        u = dist.mean() if deterministic else dist.sample(k_bb)
        u = jnp.clip(u, 0.0, 1.0)
        bbox = jnp.clip(jnp.floor(u * grid_size), 0,
                        grid_size - 1).astype(jnp.int32)
        lp = lp_op + dist.log_prob(u).sum(-1)
        acts = jnp.concatenate([bbox, op[..., None].astype(jnp.int32)], -1)
        return acts, lp, out["value"]

    def evaluate_fn(params, obs, actions):
        out = _gpt_forward(model, params, obs)
        op = actions[..., 4]
        logits = out["op_logits"]
        lp_op = onehot_take(jax.nn.log_softmax(logits, -1), op)
        dist = _gpt_bbox_dist(out, op)
        u = actions[..., :4].astype(jnp.float32) / grid_size
        lp = lp_op + dist.log_prob(u).sum(-1)
        p = jax.nn.softmax(logits, -1)
        ent = (-jnp.sum(p * jax.nn.log_softmax(logits, -1), -1)
               + dist.entropy().sum(-1))
        return lp, out["value"], ent

    def init_fn(key, obs):
        f = unflatten_full(obs)
        return model.init(key, f["grid"].astype(jnp.int8), f["grid_dim"],
                          f["input"].astype(jnp.int8), f["input_dim"],
                          f["trials_remain"], f["active"])

    return Agent(obs_fn=full_flatten_obs, sample_fn=sample_fn,
                 evaluate_fn=evaluate_fn, init_fn=init_fn, obs_dim=5314)
