"""Autoregressive (operation, bbox) action distribution.

Counterpart of the reference ``AROPandBBox``
(/root/reference/agents/models/bboxdist.py:20-66): a Categorical over the
operation from per-op tokens, then a TruncatedNormal over the 4 bbox
coordinates conditioned on the *chosen* op's token; coordinates are scaled
by the grid size and floored to ints.  Pure-functional: the model's head
applications are passed in as callables over the token tensor.
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .truncated_normal import TruncatedNormal

MIN_LOG_STD, MAX_LOG_STD = -20.0, 2.0


class OpBBoxSample(NamedTuple):
    operation: jax.Array   # i32 [...]
    bbox: jax.Array        # i32 [..., 4]  (x1, y1, x2, y2)
    log_prob: jax.Array    # f32 [...]


def _bbox_dist(op_tokens: jax.Array, operation: jax.Array,
               head_mean: Callable, head_std: Callable) -> TruncatedNormal:
    target = jnp.take_along_axis(
        op_tokens, operation[..., None, None], axis=-2).squeeze(-2)
    mean = jax.nn.sigmoid(head_mean(target))
    std = jnp.exp(jnp.clip(head_std(target), MIN_LOG_STD, MAX_LOG_STD))
    return TruncatedNormal.create(mean, std, 0.0, 1.0)


def sample(key: jax.Array, op_logits: jax.Array, op_tokens: jax.Array,
           head_mean: Callable, head_std: Callable,
           grid_size: int = 30) -> OpBBoxSample:
    """op ~ Categorical(logits); bbox ~ TruncNorm(head(op_token)) * size."""
    k_op, k_bb = jax.random.split(key)
    operation = jax.random.categorical(k_op, op_logits, axis=-1)
    lp_op = jnp.take_along_axis(
        jax.nn.log_softmax(op_logits, axis=-1), operation[..., None],
        axis=-1).squeeze(-1)
    dist = _bbox_dist(op_tokens, operation, head_mean, head_std)
    u = dist.sample(k_bb)
    bbox = jnp.clip(jnp.floor(u * grid_size), 0, grid_size - 1).astype(jnp.int32)
    lp = lp_op + dist.log_prob(u).sum(-1)
    return OpBBoxSample(operation.astype(jnp.int32), bbox, lp)


def deterministic(op_logits: jax.Array, op_tokens: jax.Array,
                  head_mean: Callable, head_std: Callable,
                  grid_size: int = 30) -> OpBBoxSample:
    operation = jnp.argmax(op_logits, axis=-1)
    dist = _bbox_dist(op_tokens, operation, head_mean, head_std)
    bbox = jnp.clip(jnp.floor(dist.loc * grid_size), 0,
                    grid_size - 1).astype(jnp.int32)
    lp = jnp.zeros(operation.shape, jnp.float32)
    return OpBBoxSample(operation.astype(jnp.int32), bbox, lp)


def log_prob(op_logits: jax.Array, op_tokens: jax.Array,
             operation: jax.Array, bbox: jax.Array,
             head_mean: Callable, head_std: Callable,
             grid_size: int = 30) -> jax.Array:
    """Recompute log p(op, bbox) for stored integer actions
    (bboxdist.py:51-60: continuous value taken as bbox/size)."""
    lp_op = jnp.take_along_axis(
        jax.nn.log_softmax(op_logits, axis=-1), operation[..., None],
        axis=-1).squeeze(-1)
    dist = _bbox_dist(op_tokens, operation, head_mean, head_std)
    u = bbox.astype(jnp.float32) / grid_size
    return lp_op + dist.log_prob(u).sum(-1)


def entropy(op_logits: jax.Array, op_tokens: jax.Array,
            operation: jax.Array, head_mean: Callable,
            head_std: Callable) -> jax.Array:
    p = jax.nn.softmax(op_logits, axis=-1)
    ent_op = -jnp.sum(p * jax.nn.log_softmax(op_logits, axis=-1), axis=-1)
    dist = _bbox_dist(op_tokens, operation, head_mean, head_std)
    return ent_op + dist.entropy().sum(-1)
