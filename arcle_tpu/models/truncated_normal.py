"""Truncated normal distribution (JAX).

Counterpart of the reference's numerically careful implementation
(/root/reference/agents/models/truncated_normal.py): sampling via inverse
CDF of a uniform restricted to the truncation interval, with clamped
log-prob support.  Used by the autoregressive bbox head
(bboxdist.py:29-49).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv

_SQRT2 = math.sqrt(2.0)
_LOG_SQRT_2PI = 0.5 * math.log(2.0 * math.pi)
_EPS = 1e-6


def _phi_cdf(x):
    return 0.5 * (1.0 + erf(x / _SQRT2))


def _phi_icdf(p):
    return _SQRT2 * erfinv(2.0 * p - 1.0)


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class TruncatedNormal:
    """Normal(loc, scale) truncated to [low, high]."""

    loc: jax.Array
    scale: jax.Array
    low: jax.Array
    high: jax.Array

    @staticmethod
    def create(loc, scale, low=0.0, high=1.0) -> "TruncatedNormal":
        loc, scale = jnp.asarray(loc), jnp.asarray(scale)
        return TruncatedNormal(
            loc=loc, scale=scale,
            low=jnp.broadcast_to(jnp.asarray(low, loc.dtype), loc.shape),
            high=jnp.broadcast_to(jnp.asarray(high, loc.dtype), loc.shape),
        )

    # standardized bounds
    @property
    def _alpha(self):
        return (self.low - self.loc) / self.scale

    @property
    def _beta(self):
        return (self.high - self.loc) / self.scale

    @property
    def _z(self):
        return jnp.clip(_phi_cdf(self._beta) - _phi_cdf(self._alpha),
                        _EPS, None)

    def sample(self, key: jax.Array, sample_shape=()) -> jax.Array:
        shape = sample_shape + jnp.broadcast_shapes(
            self.loc.shape, self.scale.shape)
        u = jax.random.uniform(key, shape, minval=_EPS, maxval=1.0 - _EPS)
        p = _phi_cdf(self._alpha) + u * self._z
        x = self.loc + self.scale * _phi_icdf(jnp.clip(p, _EPS, 1.0 - _EPS))
        return jnp.clip(x, self.low, self.high)

    def log_prob(self, value: jax.Array) -> jax.Array:
        z = (value - self.loc) / self.scale
        log_unnorm = -0.5 * z * z - _LOG_SQRT_2PI - jnp.log(self.scale)
        return log_unnorm - jnp.log(self._z)

    def mean(self) -> jax.Array:
        a, b = self._alpha, self._beta
        phi = lambda x: jnp.exp(-0.5 * x * x) / math.sqrt(2 * math.pi)
        return self.loc + self.scale * (phi(a) - phi(b)) / self._z

    def entropy(self) -> jax.Array:
        a, b = self._alpha, self._beta
        phi = lambda x: jnp.exp(-0.5 * x * x) / math.sqrt(2 * math.pi)
        z = self._z
        frac = (a * phi(a) - b * phi(b)) / z
        return (0.5 + _LOG_SQRT_2PI + jnp.log(self.scale * z) + 0.5 * frac)
