"""Discrete / count likelihoods: Poisson, negative binomial, Bernoulli,
categorical, gamma.

Numerics match the TFP 0.7 conventions the reference depends on
(``scvae/distributions/utilities.py:183-305``):

* ``NegativeBinomial(total_count=r, probs=p)`` counts successes before ``r``
  failures: ``log_prob(x) = lgamma(x+r) − lgamma(r) − lgamma(x+1)
  + r·log1p(−p) + x·log(p)``; mean ``r·p/(1−p)``.
* ``Poisson(rate)`` evaluated on (possibly non-integer) float targets via
  ``x·log(rate) − rate − lgamma(1+x)``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import xlogy

from scvae_tpu.distributions.base import Distribution
# Stirling-series lgamma: same float32 accuracy as jax.lax.lgamma (~1.5e-3
# abs, both limited by f32 arithmetic) but ~2x faster on TPU v5e — it
# halves the NB training step time (0.65 vs 1.29 ms/step at B=1024).
from scvae_tpu.ops.special import lgamma as gammaln
from scvae_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class Poisson(Distribution):
    log_rate: jax.Array

    @property
    def rate(self) -> jax.Array:
        return jnp.exp(self.log_rate)

    def log_prob(self, x):
        return x * self.log_rate - self.rate - gammaln(1.0 + x)

    def mean(self):
        return self.rate

    def variance(self):
        return self.rate

    def mode(self):
        return jnp.floor(self.rate)

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        return jax.random.poisson(rng, self.rate, shape=shape).astype(
            jnp.result_type(self.log_rate)
        )


@pytree_dataclass
class NegativeBinomial(Distribution):
    """Number of successes before ``total_count`` failures (TFP convention)."""

    total_count: jax.Array  # r > 0 (may be non-integer)
    probs: jax.Array  # success probability p ∈ (0, 1)

    def log_prob(self, x):
        r = self.total_count
        p = self.probs
        return (
            gammaln(x + r)
            - gammaln(r)
            - gammaln(1.0 + x)
            + r * jnp.log1p(-p)
            + xlogy(x, p)
        )

    def mean(self):
        return self.total_count * self.probs / (1.0 - self.probs)

    def variance(self):
        return self.mean() / (1.0 - self.probs)

    def mode(self):
        return jnp.where(
            self.total_count > 1.0,
            jnp.floor(self.probs * (self.total_count - 1.0) / (1.0 - self.probs)),
            0.0,
        )

    def sample(self, rng, sample_shape=()):
        # Gamma–Poisson mixture: λ ~ Gamma(r, scale = p/(1−p)); x ~ Poisson(λ).
        rng_gamma, rng_poisson = jax.random.split(rng)
        shape = tuple(sample_shape) + self.batch_shape()
        dtype = jnp.result_type(self.probs)
        lam = jax.random.gamma(rng_gamma, self.total_count, shape=shape) * (
            self.probs / (1.0 - self.probs)
        )
        return jax.random.poisson(rng_poisson, lam, shape=shape).astype(dtype)


@pytree_dataclass
class Bernoulli(Distribution):
    logits: jax.Array

    @property
    def probs(self) -> jax.Array:
        return jax.nn.sigmoid(self.logits)

    def log_prob(self, x):
        # x·logits − softplus(logits), stable for any float x ∈ {0, 1}.
        return x * self.logits - jax.nn.softplus(self.logits)

    def mean(self):
        return self.probs

    def variance(self):
        p = self.probs
        return p * (1.0 - p)

    def mode(self):
        return (self.logits > 0).astype(jnp.result_type(self.logits))

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        return jax.random.bernoulli(rng, self.probs, shape=shape).astype(
            jnp.result_type(self.logits)
        )


@pytree_dataclass
class Categorical(Distribution):
    """Categorical over ``{0, …, K−1}``; trailing axis of ``logits`` is K."""

    logits: jax.Array

    @property
    def probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)

    def log_probs(self) -> jax.Array:
        return jax.nn.log_softmax(self.logits, axis=-1)

    def num_categories(self) -> int:
        return self.logits.shape[-1]

    def log_prob(self, x):
        log_p = self.log_probs()
        idx = jnp.clip(jnp.asarray(x).astype(jnp.int32), 0, self.num_categories() - 1)
        # One-hot contraction instead of take_along_axis: the gather's
        # backward is a scatter-add, which serialises on TPU (measured
        # ~90× slower training steps at (B,F,K+1) likelihood shapes); the
        # one-hot multiply-reduce stays on the VPU both ways.
        onehot = jax.nn.one_hot(idx, self.num_categories(), dtype=log_p.dtype)
        return jnp.sum(onehot * log_p, axis=-1)

    def mean(self):
        k = jnp.arange(self.num_categories(), dtype=jnp.result_type(self.logits))
        return jnp.sum(self.probs * k, axis=-1)

    def variance(self):
        k = jnp.arange(self.num_categories(), dtype=jnp.result_type(self.logits))
        second_moment = jnp.sum(self.probs * jnp.square(k), axis=-1)
        return second_moment - jnp.square(self.mean())

    def mode(self):
        return jnp.argmax(self.logits, axis=-1).astype(jnp.result_type(self.logits))

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()[:-1]
        return jax.random.categorical(rng, self.logits, axis=-1, shape=shape).astype(
            jnp.result_type(self.logits)
        )


@pytree_dataclass
class Gamma(Distribution):
    concentration: jax.Array
    rate: jax.Array

    def log_prob(self, x):
        a, b = self.concentration, self.rate
        return a * jnp.log(b) - gammaln(a) + xlogy(a - 1.0, x) - b * x

    def mean(self):
        return self.concentration / self.rate

    def variance(self):
        return self.concentration / jnp.square(self.rate)

    def mode(self):
        return jnp.maximum(self.concentration - 1.0, 0.0) / self.rate

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        return jax.random.gamma(rng, self.concentration, shape=shape) / self.rate
