"""Gaussian-family distributions.

Counterparts of the TFP distributions the reference registry constructs
(``scvae/distributions/utilities.py:31-93, 125-140``) plus the thin
multivariate wrappers (``scvae/distributions/multivariate_normal.py``).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.utils.struct import pytree_dataclass

_LOG_2PI = math.log(2.0 * math.pi)


@pytree_dataclass
class Normal(Distribution):
    loc: jax.Array
    scale: jax.Array

    def log_prob(self, x):
        log_scale = jnp.log(self.scale)
        z = (x - self.loc) / self.scale
        return -0.5 * jnp.square(z) - log_scale - 0.5 * _LOG_2PI

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape())

    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale), self.batch_shape())

    def stddev(self):
        return jnp.broadcast_to(self.scale, self.batch_shape())

    def mode(self):
        return self.mean()

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        eps = jax.random.normal(rng, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale * eps


@pytree_dataclass
class LogNormal(Distribution):
    """exp(Normal(loc, scale)); reference uses loc=mean, scale=sqrt(softplus(v))."""

    loc: jax.Array
    scale: jax.Array

    def _normal(self) -> Normal:
        return Normal(loc=self.loc, scale=self.scale)

    def log_prob(self, x):
        safe_x = jnp.maximum(x, jnp.finfo(jnp.result_type(x, 1.0)).tiny)
        log_x = jnp.log(safe_x)
        return self._normal().log_prob(log_x) - log_x

    def mean(self):
        return jnp.exp(self.loc + 0.5 * jnp.square(self.scale))

    def variance(self):
        s2 = jnp.square(self.scale)
        return (jnp.exp(s2) - 1.0) * jnp.exp(2.0 * self.loc + s2)

    def mode(self):
        return jnp.exp(self.loc - jnp.square(self.scale))

    def sample(self, rng, sample_shape=()):
        return jnp.exp(self._normal().sample(rng, sample_shape))


def fill_triangular(x: jax.Array, dim: int) -> jax.Array:
    """Pack a ``(..., m(m+1)/2)`` vector into a lower-triangular ``(..., m, m)``.

    Semantics match ``tfp.distributions.fill_triangular`` (used by the
    reference's multivariate-gaussian registry entry,
    ``scvae/distributions/utilities.py:89-92``): the vector is split as
    ``[x_tail | x_head]`` and laid out so the result is lower triangular.
    """
    m = dim
    n = m * (m + 1) // 2
    if x.shape[-1] != n:
        raise ValueError(f"expected trailing dim {n} for m={m}, got {x.shape[-1]}")
    # tfp trick: concat([x[..., m:], reversed(x)], reshape to (m, m), take tril.
    x_tail = x[..., m:]
    xc = jnp.concatenate([x_tail, jnp.flip(x, axis=-1)], axis=-1)
    y = jnp.reshape(xc, x.shape[:-1] + (m, m))
    return jnp.tril(y)


@pytree_dataclass
class MultivariateNormalDiag(Distribution):
    """Diagonal MVN; event = trailing axis of ``loc``.

    Counterpart of the reference's broadcast-friendly wrapper
    (``scvae/distributions/multivariate_normal.py:23-88``); with JAX
    broadcasting no expand/squeeze gymnastics are needed.
    """

    loc: jax.Array
    scale_diag: jax.Array

    def log_prob(self, x):
        z = (x - self.loc) / self.scale_diag
        return jnp.sum(
            -0.5 * jnp.square(z) - jnp.log(self.scale_diag) - 0.5 * _LOG_2PI,
            axis=-1,
        )

    def mean(self):
        return jnp.broadcast_to(self.loc, self.batch_shape())

    def variance(self):
        return jnp.broadcast_to(jnp.square(self.scale_diag), self.batch_shape())

    def covariance(self):
        var = self.variance()
        return var[..., :, None] * jnp.eye(var.shape[-1], dtype=var.dtype)

    def mode(self):
        return self.mean()

    def sample(self, rng, sample_shape=()):
        shape = tuple(sample_shape) + self.batch_shape()
        eps = jax.random.normal(rng, shape, dtype=jnp.result_type(self.loc))
        return self.loc + self.scale_diag * eps


@pytree_dataclass
class MultivariateNormalTriL(Distribution):
    """Full-covariance MVN parameterised by a lower-triangular scale.

    Counterpart of ``scvae/distributions/multivariate_normal.py:90-150``.
    ``scale_tril`` has shape ``(..., m, m)``.
    """

    loc: jax.Array
    scale_tril: jax.Array

    def _dim(self) -> int:
        return self.scale_tril.shape[-1]

    def log_prob(self, x):
        diff = x - self.loc
        # Solve L y = diff  →  y = L^{-1} diff.  triangular_solve requires
        # identical batch ranks, so broadcast the scale explicitly.
        m = self._dim()
        batch = jnp.broadcast_shapes(diff.shape[:-1], self.scale_tril.shape[:-2])
        scale = jnp.broadcast_to(self.scale_tril, batch + (m, m))
        diff = jnp.broadcast_to(diff, batch + (m,))
        y = jax.scipy.linalg.solve_triangular(
            scale, diff[..., None], lower=True
        )[..., 0]
        half_log_det = jnp.sum(
            jnp.log(jnp.abs(jnp.diagonal(self.scale_tril, axis1=-2, axis2=-1))),
            axis=-1,
        )
        m = self._dim()
        return -0.5 * jnp.sum(jnp.square(y), axis=-1) - half_log_det - 0.5 * m * _LOG_2PI

    def mean(self):
        return jnp.broadcast_to(
            self.loc, jnp.broadcast_shapes(self.loc.shape, self.scale_tril.shape[:-1])
        )

    def covariance(self):
        return jnp.matmul(self.scale_tril, jnp.swapaxes(self.scale_tril, -1, -2))

    def variance(self):
        return jnp.diagonal(self.covariance(), axis1=-2, axis2=-1)

    def mode(self):
        return self.mean()

    def sample(self, rng, sample_shape=()):
        batch = jnp.broadcast_shapes(self.loc.shape[:-1], self.scale_tril.shape[:-2])
        shape = tuple(sample_shape) + tuple(batch) + (self._dim(),)
        eps = jax.random.normal(rng, shape, dtype=jnp.result_type(self.loc))
        return self.loc + jnp.einsum("...ij,...j->...i", self.scale_tril, eps)
