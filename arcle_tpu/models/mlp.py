"""MLP policies (flax).

- :class:`FCPolicy` — the fcnet the shipped MLP E-MAML run actually uses
  (train.py:97-100: [1024,1024,512,512,256,128] tanh) with multi-categorical
  action heads for the BBoxWrapper tuple action space.
- :class:`WLinear` / :class:`HyperMLP` — the hypernetwork-style linear
  (weights generated from a learned latent z) of the reference MLPPolicy
  (agents/models/MLPPolicy.py:6-34), present for parity.
"""

from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp


def onehot_take(a: jax.Array, idx: jax.Array) -> jax.Array:
    """``take_along_axis(a, idx[..., None], -1)[..., 0]`` as one-hot
    arithmetic — batched 1-element gathers are pathologically slow on the
    axon TPU runtime, iota-compare + select + reduce is a cheap fused
    pass.  Select (not multiply) so non-finite entries at unselected
    positions (e.g. -inf-padded logits) don't poison the sum with NaN."""
    n = a.shape[-1]
    classes = jax.lax.broadcasted_iota(jnp.int32, (n,), 0)
    oh = idx[..., None] == classes
    return jnp.sum(jnp.where(oh, a, 0), axis=-1)


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


def stack_padded_logits(logits_tuple):
    """Stack heads of unequal width into one [..., H, N] tensor padded
    with -inf (masked classes).  One tensor means one kernel for the
    whole multi-head sample/log-prob/entropy — per-head ops cost ~5x the
    kernel launches on this runtime (its fixed per-kernel overhead is the
    rollout bottleneck, not FLOPs)."""
    n = max(l.shape[-1] for l in logits_tuple)
    padded = []
    for l in logits_tuple:
        if l.shape[-1] < n:
            pad = [(0, 0)] * (l.ndim - 1) + [(0, n - l.shape[-1])]
            l = jnp.pad(l, pad, constant_values=-jnp.inf)
        padded.append(l)
    return jnp.stack(padded, axis=-2)


def multi_categorical_sample(key, logits_tuple):
    L = stack_padded_logits(logits_tuple)            # [..., H, N]
    u = jax.random.uniform(key, L.shape, minval=1e-12, maxval=1.0)
    g = -jnp.log(-jnp.log(u))                        # one RNG pass, gumbel
    a = jnp.argmax(L + g, axis=-1).astype(jnp.int32)
    lp = onehot_take(jax.nn.log_softmax(L, -1), a)
    return a, lp.sum(-1)


def multi_categorical_log_prob(logits_tuple, actions):
    L = stack_padded_logits(logits_tuple)
    return onehot_take(jax.nn.log_softmax(L, -1),
                       actions[..., :L.shape[-2]]).sum(-1)


def multi_categorical_entropy(logits_tuple):
    L = stack_padded_logits(logits_tuple)
    ls = jax.nn.log_softmax(L, -1)
    p = jnp.exp(ls)
    # sanitize -inf BEFORE the multiply: p * (-inf) has a NaN derivative
    # (d(p*ls)/dls = p + p*ls) that poisons the backward pass even under
    # a where() — zero the masked entries on both factors instead
    ls_safe = jnp.where(jnp.isfinite(ls), ls, 0.0)
    return -jnp.sum(p * ls_safe, axis=(-2, -1))


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
