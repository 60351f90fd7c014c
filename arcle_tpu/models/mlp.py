"""MLP policies (flax).

- :class:`FCPolicy` — the fcnet the shipped MLP E-MAML run actually uses
  (train.py:97-100: [1024,1024,512,512,256,128] tanh) with multi-categorical
  action heads for the BBoxWrapper tuple action space.
- :class:`WLinear` / :class:`HyperMLP` — the hypernetwork-style linear
  (weights generated from a learned latent z) of the reference MLPPolicy
  (agents/models/MLPPolicy.py:6-34), present for parity.
"""

from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def onehot_take(a: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(a, idx[..., None], -1)[..., 0]`` as one-hot
    arithmetic — batched 1-element gathers are pathologically slow on the
    axon TPU runtime, iota-compare + reduce is a cheap fused pass."""
    n = a.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    oh = (idx[..., None] == classes).astype(a.dtype)
    return jnp.sum(a * oh, axis=-1)


class FCPolicy(nn.Module):
    """Tanh MLP torso + multi-categorical action logits + value head.

    Action space = (x1: H, y1: W, x2: H, y2: W, op: n_ops), the
    BBoxWrapper tuple (wrappers/bbox.py:12-20).
    """

    hidden: Sequence[int] = (1024, 1024, 512, 512, 256, 128)
    n_ops: int = 35
    H: int = 30
    W: int = 30
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, obs: jax.Array):
        x = obs.astype(self.dtype)
        for i, width in enumerate(self.hidden):
            x = nn.tanh(nn.Dense(width, dtype=self.dtype,
                                 name=f"fc_{i}")(x))
        sizes = (self.H, self.W, self.H, self.W, self.n_ops)
        logits = nn.Dense(sum(sizes), dtype=jnp.float32,
                          kernel_init=nn.initializers.orthogonal(0.01),
                          name="pi")(x)
        value = nn.Dense(1, dtype=jnp.float32,
                         kernel_init=nn.initializers.orthogonal(1.0),
                         name="vf")(x).squeeze(-1)
        bounds = [sum(sizes[:i + 1]) for i in range(len(sizes) - 1)]
        return tuple(jnp.split(logits, bounds, axis=-1)), value


def multi_categorical_sample(key, logits_tuple):
    keys = jax.random.split(key, len(logits_tuple))
    samples, lps = [], []
    for k, logits in zip(keys, logits_tuple):
        a = jax.random.categorical(k, logits, axis=-1)
        lp = onehot_take(jax.nn.log_softmax(logits, -1), a)
        samples.append(a.astype(jnp.int32))
        lps.append(lp)
    return jnp.stack(samples, axis=-1), sum(lps)


def multi_categorical_log_prob(logits_tuple, actions):
    lps = []
    for i, logits in enumerate(logits_tuple):
        lps.append(onehot_take(jax.nn.log_softmax(logits, -1),
                               actions[..., i]))
    return sum(lps)


def multi_categorical_entropy(logits_tuple):
    ents = []
    for logits in logits_tuple:
        p = jax.nn.softmax(logits, -1)
        ents.append(-jnp.sum(p * jax.nn.log_softmax(logits, -1), -1))
    return sum(ents)


class WLinear(nn.Module):
    """Linear layer whose weights are generated from a learned latent z
    (MLPPolicy.py:6-34): theta = fc(z); y = x @ W + b.  The latent is the
    only fast-adapted parameter in the hypernetwork variant."""

    in_features: int
    out_features: int
    z_dim: int = 1000

    @nn.compact
    def __call__(self, x: jax.Array):
        z = self.param("z", nn.initializers.normal(1.0 / self.out_features),
                       (self.z_dim,))
        theta = nn.Dense(self.in_features * self.out_features
                         + self.out_features, name="fc")(z)
        w_sz = self.in_features * self.out_features
        w = theta[:w_sz].reshape(self.in_features, self.out_features)
        b = theta[w_sz:]
        return x @ w + b


class HyperMLP(nn.Module):
    """Stack of WLinear layers with tanh (the reference MLPPolicy shape)."""

    widths: Sequence[int]
    out: int

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        for i, w in enumerate(self.widths):
            x = nn.tanh(WLinear(d, w, name=f"wl_{i}")(x))
            d = w
        return WLinear(d, self.out, name="wl_out")(x)
