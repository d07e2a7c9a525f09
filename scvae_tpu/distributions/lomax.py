"""Lomax (Pareto type II) distribution.

Semantics match the reference (``scvae/distributions/lomax.py:176-255``):
``log_prob(x) = log(α) − log(λ) − (α+1)·log1p(x/λ)``;
``cdf(x) = 1 − (1 + x/λ)^{−α}``; mean defined for α > 1, variance for α > 2
(NaN / inf otherwise, like ``allow_nan_stats=True``); mode = 0.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class Lomax(Distribution):
    concentration: jax.Array  # α
    scale: jax.Array  # λ

    def log_prob(self, x):
        a, lam = self.concentration, self.scale
        return jnp.log(a) - jnp.log(lam) - (a + 1.0) * jnp.log1p(x / lam)

    def cdf(self, x):
        return 1.0 - jnp.power(1.0 + x / self.scale, -self.concentration)

    def log_cdf(self, x):
        return jnp.log(self.cdf(x))

    def mean(self):
        a = self.concentration
        mean = self.scale / (a - 1.0)
        return jnp.where(a > 1.0, mean, jnp.nan)

    def variance(self):
        # λ²α / ((α−1)²(α−2)).  Deviation from the reference: its numerator
        # uses (α−1) instead of α (``scvae/distributions/lomax.py:221-223``),
        # which disagrees with the Lomax variance; we use the correct form.
        a = self.concentration
        var = jnp.square(self.scale) * a / (jnp.square(a - 1.0) * (a - 2.0))
        return jnp.where(a > 2.0, var, jnp.where(a > 1.0, jnp.inf, jnp.nan))

    def mode(self):
        return jnp.zeros(self.batch_shape(), jnp.result_type(self.scale))

    def sample(self, rng, sample_shape=()):
        # Inverse CDF: x = λ·(u^{−1/α} − 1), u ~ U(0, 1].
        shape = tuple(sample_shape) + self.batch_shape()
        dtype = jnp.result_type(self.scale)
        u = jax.random.uniform(
            rng, shape, dtype=dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
        )
        return self.scale * jnp.expm1(-jnp.log(u) / self.concentration)
