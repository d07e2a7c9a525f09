"""Special functions implemented with Pallas-lowerable primitives.

Mosaic (the Pallas TPU compiler) has no ``lgamma``/``digamma`` lowering,
so the fused likelihood kernels need their own implementations built from
``log``/``exp``/arithmetic only.  Both use the standard recurrence push-up
to z = x + 8 followed by a Stirling/asymptotic series — accurate to ~1e-6
relative in float32 over the x > 0 domain the count likelihoods use.

These are also valid outside Pallas and are property-tested against
``jax.lax.lgamma`` / ``jax.lax.digamma``.
"""

from __future__ import annotations

import math

import jax.numpy as jnp

_HALF_LOG_2PI = 0.5 * math.log(2.0 * math.pi)
# Push x up to ≥ 3 before the asymptotic series: in float32 the result is
# arithmetic-noise-limited (~4e-3 abs at large x for ANY shift, same as
# jax.lax.lgamma), and at small x shift=3 already gives ~1e-6 abs —
# deeper recurrences only add log() calls (measured: 5 fewer logs ≈
# noticeably faster NB training step).
_SHIFT = 3


def lgamma(x: jnp.ndarray) -> jnp.ndarray:
    """log Γ(x) for x > 0 (Stirling series after an 8-step recurrence)."""
    x = jnp.asarray(x)
    shift_log = jnp.zeros_like(x)
    for k in range(_SHIFT):
        shift_log = shift_log + jnp.log(x + k)
    z = x + _SHIFT
    inv = 1.0 / z
    inv2 = inv * inv
    series = inv * (
        1.0 / 12.0 + inv2 * (-1.0 / 360.0 + inv2 * (1.0 / 1260.0))
    )
    stirling = (z - 0.5) * jnp.log(z) - z + _HALF_LOG_2PI + series
    return stirling - shift_log


def digamma(x: jnp.ndarray) -> jnp.ndarray:
    """ψ(x) = d/dx log Γ(x) for x > 0."""
    x = jnp.asarray(x)
    shift_sum = jnp.zeros_like(x)
    for k in range(_SHIFT):
        shift_sum = shift_sum + 1.0 / (x + k)
    z = x + _SHIFT
    inv = 1.0 / z
    inv2 = inv * inv
    series = inv2 * (
        -1.0 / 12.0 + inv2 * (1.0 / 120.0 + inv2 * (-1.0 / 252.0))
    )
    return jnp.log(z) - 0.5 * inv + series - shift_sum
