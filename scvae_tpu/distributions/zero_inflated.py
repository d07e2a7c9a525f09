"""Zero-inflated wrapper: mixture of a point mass at 0 (prob π) and a base
count distribution.

Semantics match the reference (``scvae/distributions/zero_inflated.py:180-199``):

* ``log_prob(x) = log(1−π) + dist.log_prob(x)``                 for x > 0
* ``log_prob(0) = log(π + (1−π)·dist.prob(0))``
* ``mean = (1−π)·dist.mean()``
* ``variance = (1−π)·(dist.variance() + dist.mean()²) − mean²``

The x == 0 branch is evaluated in log space with ``logaddexp`` for
stability (the reference computes ``log(π + (1−π)·prob)`` directly; ours is
the same quantity, just never underflowing).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.utils.struct import pytree_dataclass, static_field


@pytree_dataclass
class ZeroInflated(Distribution):
    dist: Distribution
    pi: jax.Array

    def log_prob(self, x):
        log_pi = jnp.log(self.pi)
        log1m_pi = jnp.log1p(-self.pi)
        base_lp = self.dist.log_prob(x)
        # x > 0 branch
        y_pos = log1m_pi + base_lp
        # x == 0 branch: log(π + (1−π)·p(x)); evaluate where() both sides safely.
        y_zero = jnp.logaddexp(log_pi, log1m_pi + base_lp)
        return jnp.where(x > 0, y_pos, y_zero)

    def mean(self):
        return (1.0 - self.pi) * self.dist.mean()

    def variance(self):
        base_mean = self.dist.mean()
        second_moment = (1.0 - self.pi) * (
            self.dist.variance() + jnp.square(base_mean)
        )
        return second_moment - jnp.square(self.mean())

    def mode(self):
        return jnp.where(self.pi > 0.5, jnp.zeros_like(self.pi), self.dist.mode())

    def sample(self, rng, sample_shape=()):
        rng_mask, rng_base = jax.random.split(rng)
        base = self.dist.sample(rng_base, sample_shape)
        keep = jax.random.bernoulli(rng_mask, 1.0 - self.pi, shape=base.shape)
        return jnp.where(keep, base, jnp.zeros_like(base))
