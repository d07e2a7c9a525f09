"""Runtime gating for the Pallas fast paths.

The fused-likelihood kernels and the packed row-DMA gather are default-on
for the TPU backend only (measured faster there; the jnp fallbacks are
better served by plain XLA elsewhere).  Tests and the multichip dryrun
force them on under ``pltpu.force_tpu_interpret_mode()`` so the
kernel-under-mesh composition is exercised without TPU hardware — that
needs an explicit switch because the call sites otherwise key off
``jax.default_backend()``.
"""

from __future__ import annotations

import contextlib

import jax

_FORCE_PALLAS = False


def pallas_enabled() -> bool:
    """True when the Pallas fast paths should be used: the TPU backend,
    or anywhere under :func:`force_pallas` (interpreter-mode testing)."""
    return _FORCE_PALLAS or jax.default_backend() == "tpu"


@contextlib.contextmanager
def force_pallas(enabled: bool = True):
    """Force the Pallas fast paths on (or off) regardless of backend.
    Pair with ``pltpu.force_tpu_interpret_mode()`` on non-TPU backends."""
    global _FORCE_PALLAS
    previous = _FORCE_PALLAS
    _FORCE_PALLAS = enabled
    try:
        yield
    finally:
        _FORCE_PALLAS = previous
