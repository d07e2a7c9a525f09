"""Gaussian-mixture distributions over a latent space.

TPU-native replacement for the reference's ``tfp.Mixture`` of K
``MultivariateNormalDiag`` components built from Python lists
(``scvae/distributions/utilities.py:95-123``): components are stacked on a
leading cluster axis and everything is evaluated with one vectorised
``logsumexp`` instead of K subgraphs — this is the shape that XLA tiles
onto the MXU/VPU cleanly.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import logsumexp

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.distributions.normal import MultivariateNormalDiag
from scvae_tpu.utils.struct import pytree_dataclass


@pytree_dataclass
class GaussianMixture(Distribution):
    """Mixture of K diagonal Gaussians.

    ``logits``: (..., K); ``means``/``scale_diags``: (K, ..., D).
    Batch shape is the broadcast of ``logits[..., 0]`` and
    ``means[0, ..., 0]``; the event is the trailing D axis.
    """

    logits: jax.Array
    means: jax.Array
    scale_diags: jax.Array

    @property
    def num_components(self) -> int:
        return self.means.shape[0]

    def mixture_log_probs(self) -> jax.Array:
        return jax.nn.log_softmax(self.logits, axis=-1)

    def mixture_probs(self) -> jax.Array:
        return jax.nn.softmax(self.logits, axis=-1)

    def _component(self, k: int) -> MultivariateNormalDiag:
        return MultivariateNormalDiag(
            loc=self.means[k], scale_diag=self.scale_diags[k]
        )

    def components_log_prob(self, x: jax.Array) -> jax.Array:
        """log N_k(x) for all k; result (K, ...)."""
        def one(mean, scale):
            return MultivariateNormalDiag(loc=mean, scale_diag=scale).log_prob(x)

        return jax.vmap(one)(self.means, self.scale_diags)

    def log_prob(self, x):
        comp_lp = self.components_log_prob(x)  # (K, ...)
        mix_lp = jnp.moveaxis(self.mixture_log_probs(), -1, 0)  # (K, ...)
        return logsumexp(comp_lp + mix_lp, axis=0)

    def mean(self):
        probs = jnp.moveaxis(self.mixture_probs(), -1, 0)  # (K, ...)
        return jnp.sum(probs[..., None] * self.means, axis=0)

    def variance(self):
        # V[x] = Σ_k π_k (σ_k² + μ_k²) − mean²
        probs = jnp.moveaxis(self.mixture_probs(), -1, 0)[..., None]
        second = jnp.sum(
            probs * (jnp.square(self.scale_diags) + jnp.square(self.means)), axis=0
        )
        return second - jnp.square(self.mean())

    def sample(self, rng, sample_shape=()):
        rng_cat, rng_comp = jax.random.split(rng)
        batch = jnp.broadcast_shapes(
            self.logits.shape[:-1], self.means.shape[1:-1]
        )
        event = self.means.shape[-1]
        shape = tuple(sample_shape) + tuple(batch)
        ks = jax.random.categorical(rng_cat, self.logits, axis=-1, shape=shape)
        eps = jax.random.normal(
            rng_comp, shape + (event,), dtype=jnp.result_type(self.means)
        )

        def select(stacked: jax.Array) -> jax.Array:
            # (K, batch..., D) → (sample..., batch..., K, D) → gather along K.
            full = jnp.broadcast_to(
                stacked, (self.num_components,) + tuple(batch) + (event,)
            )
            full = jnp.broadcast_to(
                jnp.moveaxis(full, 0, -2),
                shape + (self.num_components, event),
            )
            return jnp.take_along_axis(full, ks[..., None, None], axis=-2)[..., 0, :]

        return select(self.means) + select(self.scale_diags) * eps
