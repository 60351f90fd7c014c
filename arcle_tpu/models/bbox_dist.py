"""Autoregressive (operation, bbox) action distribution.

Counterpart of the reference ``AROPandBBox``
(/root/reference/agents/models/bboxdist.py:20-66): a Categorical over the
operation from per-op tokens, then a TruncatedNormal over the 4 bbox
coordinates conditioned on the *chosen* op's head output
(mu = sigmoid(head), sigma = exp(clamp(head, -20, 2)), support [0, 1]);
coordinates are scaled by the grid size and floored to ints, and ``log_prob``
recomputes both terms from stored integer actions (bboxdist.py:51-60).

TPU-first formulation: the bbox heads are applied to *all* op tokens up
front (one batched matmul, ``bbox_mean_all``/``bbox_std_all`` in
GPTPolicy's output) and the chosen op's row is selected with one-hot
arithmetic — batched 1-element gathers are pathologically slow on this
runtime, a compare+einsum fuses into the surrounding pass.

This module is the single source of truth for the distribution math; the
training agents (training/agents.py) call these functions directly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .truncated_normal import TruncatedNormal

MIN_LOG_STD, MAX_LOG_STD = -20.0, 2.0


class OpBBoxSample(NamedTuple):
    operation: jax.Array   # i32 [...]
    bbox: jax.Array        # i32 [..., 4]  (x1, y1, x2, y2)
    log_prob: jax.Array    # f32 [...]


def select_op(per_op: jax.Array, operation: jax.Array) -> jax.Array:
    """Select ``per_op[..., operation, :]`` -> [..., D] without a gather:
    one-hot compare + einsum (fast on TPU, where 1-element gathers are
    scalarized)."""
    n = per_op.shape[-2]
    classes = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    oh = (operation[..., None] == classes).astype(per_op.dtype)
    return jnp.einsum("...o,...od->...d", oh, per_op)


def op_log_softmax_at(op_logits: jax.Array, operation: jax.Array) -> jax.Array:
    """log softmax(op_logits)[operation] via one-hot arithmetic."""
    ls = jax.nn.log_softmax(op_logits, axis=-1)
    n = ls.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    oh = (operation[..., None] == classes).astype(ls.dtype)
    return jnp.sum(ls * oh, axis=-1)


def make_dist(mean_all: jax.Array, std_all: jax.Array,
              operation: jax.Array) -> TruncatedNormal:
    """TruncatedNormal over [0,1]^4 conditioned on the chosen op's head
    outputs (mean_all/std_all: [..., n_ops, 4] raw head values)."""
    mean = jax.nn.sigmoid(select_op(mean_all, operation))
    std = jnp.exp(jnp.clip(select_op(std_all, operation),
                           MIN_LOG_STD, MAX_LOG_STD))
    return TruncatedNormal.create(mean, std, 0.0, 1.0)


def sample(key: jax.Array, op_logits: jax.Array, mean_all: jax.Array,
           std_all: jax.Array, grid_size: int = 30,
           deterministic: bool = False) -> OpBBoxSample:
    """op ~ Categorical(logits); bbox ~ TruncNorm(head(op)) * size, floored
    (bboxdist.py:29-49).  ``deterministic`` takes argmax op + distribution
    mean (the explore=False post-adaptation path)."""
    k_op, k_bb = jax.random.split(key)
    if deterministic:
        operation = jnp.argmax(op_logits, axis=-1)
    else:
        operation = jax.random.categorical(k_op, op_logits, axis=-1)
    lp_op = op_log_softmax_at(op_logits, operation)
    dist = make_dist(mean_all, std_all, operation)
    u = dist.mean() if deterministic else dist.sample(k_bb)
    u = jnp.clip(u, 0.0, 1.0)
    bbox = jnp.clip(jnp.floor(u * grid_size), 0,
                    grid_size - 1).astype(jnp.int32)
    lp = lp_op + dist.log_prob(u).sum(-1)
    return OpBBoxSample(operation.astype(jnp.int32), bbox, lp)


def log_prob(op_logits: jax.Array, mean_all: jax.Array, std_all: jax.Array,
             operation: jax.Array, bbox: jax.Array,
             grid_size: int = 30) -> jax.Array:
    """Recompute log p(op, bbox) for stored integer actions
    (bboxdist.py:51-60: continuous value taken as bbox/size)."""
    lp_op = op_log_softmax_at(op_logits, operation)
    dist = make_dist(mean_all, std_all, operation)
    u = bbox.astype(jnp.float32) / grid_size
    return lp_op + dist.log_prob(u).sum(-1)


def entropy(op_logits: jax.Array, mean_all: jax.Array, std_all: jax.Array,
            operation: jax.Array) -> jax.Array:
    p = jax.nn.softmax(op_logits, axis=-1)
    ent_op = -jnp.sum(p * jax.nn.log_softmax(op_logits, axis=-1), axis=-1)
    dist = make_dist(mean_all, std_all, operation)
    return ent_op + dist.entropy().sum(-1)
