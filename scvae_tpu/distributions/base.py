"""Distribution protocol for the likelihood library.

Unlike the reference's TFP ``Distribution`` subclasses (stateful graph
objects), these are immutable pytree dataclasses of parameter arrays with
pure ``log_prob`` / ``mean`` / ``variance`` / ``sample`` methods, so a whole
distribution can cross a ``jit`` boundary or be ``vmap``-ed over a cluster
axis.  Parameter layout follows JAX broadcasting: a distribution
parameterised per-cell-per-gene has parameter arrays of shape ``(B, F)`` and
evaluates ``log_prob`` on any broadcast-compatible target.

Reference counterpart: ``scvae/distributions/*.py`` (TFP 0.7 subclasses).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp


class Distribution:
    """Base mixin.  Subclasses implement ``log_prob`` and the stats."""

    def log_prob(self, x: jax.Array) -> jax.Array:
        raise NotImplementedError

    def prob(self, x: jax.Array) -> jax.Array:
        return jnp.exp(self.log_prob(x))

    def mean(self) -> jax.Array:
        raise NotImplementedError

    def variance(self) -> jax.Array:
        raise NotImplementedError

    def stddev(self) -> jax.Array:
        return jnp.sqrt(self.variance())

    def mode(self) -> jax.Array:
        raise NotImplementedError

    def sample(self, rng: jax.Array, sample_shape: tuple[int, ...] = ()) -> jax.Array:
        raise NotImplementedError

    # -- shape helpers -----------------------------------------------------

    def batch_shape(self) -> tuple[int, ...]:
        """Broadcast shape of the parameter leaves."""
        leaves = jax.tree_util.tree_leaves(self)
        shape: tuple[int, ...] = ()
        for leaf in leaves:
            shape = jnp.broadcast_shapes(shape, jnp.shape(leaf))
        return shape


def kl_divergence(q: Any, p: Any) -> jax.Array:
    """Analytic KL(q‖p) where defined (Normal pairs), mirroring
    ``tfp.distributions.kl_divergence`` as used at
    ``scvae/models/variational_autoencoder.py:2627``."""
    from scvae_tpu.distributions.normal import Normal

    if isinstance(q, Normal) and isinstance(p, Normal):
        # KL(N(m1,s1) || N(m2,s2))
        var_ratio = jnp.square(q.scale / p.scale)
        t1 = jnp.square((q.loc - p.loc) / p.scale)
        return 0.5 * (var_ratio + t1 - 1.0 - jnp.log(var_ratio))
    raise NotImplementedError(
        f"No analytic KL for {type(q).__name__} ‖ {type(p).__name__}"
    )
