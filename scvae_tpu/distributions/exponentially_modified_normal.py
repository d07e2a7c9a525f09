"""Exponentially modified Gaussian: X = Normal(loc, scale) + Exponential(rate).

Semantics match the reference
(``scvae/distributions/exponentially_modified_normal.py:176-226``).  With
``u = rate·(x − loc)`` and ``v = rate·scale``:

``log_prob(x) = −u + v²/2 + log(erfc((−u + v²)/(√2·v))) − log 2 + log rate``

The erfc value is clipped below at float tiny like the reference before the
log to avoid −inf → NaN gradients deep in the right tail.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc, ndtr

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class ExponentiallyModifiedNormal(Distribution):
    loc: jax.Array
    scale: jax.Array
    rate: jax.Array

    def log_prob(self, x):
        dtype = jnp.result_type(x, self.loc)
        u = self.rate * (x - self.loc)
        v = self.rate * self.scale
        v2 = jnp.square(v)
        erfc_value = jnp.clip(
            erfc((-u + v2) / (math.sqrt(2.0) * v)),
            jnp.finfo(dtype).tiny,
            jnp.inf,
        )
        log_unnormalised = -u + 0.5 * v2 + jnp.log(erfc_value)
        log_normalisation = math.log(2.0) - jnp.log(self.rate)
        return log_unnormalised - log_normalisation

    def cdf(self, x):
        u = self.rate * (x - self.loc)
        v = self.rate * self.scale
        v2 = jnp.square(v)
        return ndtr(u / v) - jnp.exp(-u + 0.5 * v2 + jnp.log(ndtr((u - v2) / v)))

    def mean(self):
        return self.loc * jnp.ones_like(self.scale) + 1.0 / self.rate

    def variance(self):
        return jnp.square(self.scale) * jnp.ones_like(self.loc) + jnp.power(
            self.rate, -2.0
        )

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        dtype = jnp.result_type(self.loc)
        rng_n, rng_u = jax.random.split(rng)
        normal = jax.random.normal(rng_n, shape, dtype=dtype)
        uniform = jax.random.uniform(
            rng_u, shape, dtype=dtype, minval=jnp.finfo(dtype).tiny, maxval=1.0
        )
        return normal * self.scale + self.loc - jnp.log(uniform) / self.rate
