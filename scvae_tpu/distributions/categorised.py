"""Piecewise-categorical ("categorised") count distribution.

Counts below ``K = event_size − 1`` come from a categorical over
``{0, …, K}``; counts ≥ K use the categorical's mass at class K times a
shifted base count distribution.  Semantics match the reference
(``scvae/distributions/categorised.py:210-260``):

* ``log_prob(x) = cat.log_prob(min(x, K))``                       for x < K
* ``log_prob(x) = cat.log_prob(K) + dist.log_prob(x − K)``        for x ≥ K
* ``mean = Σ_{k<K} k·π_k + π_K·(dist.mean() + K)``
* ``variance`` via the matching second-moment composition.

The categorical has ``K + 1`` classes (``number_of_reconstruction_classes
+ 1`` logits heads, ``scvae/models/variational_autoencoder.py:2508-2527``)
and ``event_size`` is the shift ``K = num_classes − 1``
(``scvae/distributions/categorised.py:166``:
``self._event_size = self._static_cat_event_size - 1``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.distributions.counts import Categorical
from scvae_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class Categorised(Distribution):
    dist: Distribution
    cat: Categorical

    @property
    def event_size(self) -> int:
        """The shift K = number of categorical classes − 1
        (``scvae/distributions/categorised.py:166``)."""
        return self.cat.num_categories() - 1

    def log_prob(self, x):
        k = self.event_size
        cat_lp = self.cat.log_prob(jnp.clip(x, 0, k))
        shifted = jnp.maximum(x - k, 0.0)
        return jnp.where(x < k, cat_lp, cat_lp + self.dist.log_prob(shifted))

    def _cat_probs(self) -> jax.Array:
        return self.cat.probs

    def mean(self):
        k = self.event_size
        probs = self._cat_probs()
        ks = jnp.arange(k, dtype=probs.dtype)
        cat_mean = jnp.sum(probs[..., :k] * ks, axis=-1) if k > 0 else 0.0
        dist_mean = probs[..., -1] * (self.dist.mean() + k)
        return cat_mean + dist_mean

    def variance(self):
        k = self.event_size
        probs = self._cat_probs()
        ks = jnp.arange(k, dtype=probs.dtype)
        cat_m2 = jnp.sum(probs[..., :k] * jnp.square(ks), axis=-1) if k > 0 else 0.0
        base_mean = self.dist.mean()
        dist_m2 = probs[..., -1] * (
            2.0 * k * base_mean
            + self.dist.variance()
            + jnp.square(base_mean)
            + float(k) ** 2
        )
        return cat_m2 + dist_m2 - jnp.square(self.mean())

    def sample(self, rng, sample_shape=()):
        k = self.event_size
        rng_cat, rng_base = jax.random.split(rng)
        cat_draw = self.cat.sample(rng_cat, sample_shape)
        base_draw = self.dist.sample(rng_base, sample_shape)
        return jnp.where(cat_draw < k, cat_draw, base_draw + k)
