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


_REFERENCE_GATHER = False


def reference_gather_enabled() -> bool:
    """True when the packed row gather should run its pure-jnp reference
    implementation instead of the Pallas kernel.

    The reference gather produces bit-identical outputs (the packed
    layout is byte-identical to row-major, so an XLA block gather over it
    reconstructs the exact rows) but needs no Pallas interpreter — which
    is what makes it runnable across PROCESSES: the CPU interpreter's
    global barrier cannot span processes, so multi-process tests of the
    packed data layout (shard-stratified permutations, per-process row
    blocks) verify numerics through this path (VERDICT r04 item 4)."""
    return _REFERENCE_GATHER


@contextlib.contextmanager
def use_reference_gather(enabled: bool = True):
    """Run the packed-layout data path with the jnp reference gather.
    Also makes ``device_resident_data`` choose the packed layout on
    non-TPU backends (same auto rule as ``force_pallas``) WITHOUT
    enabling any Pallas kernel."""
    global _REFERENCE_GATHER
    previous = _REFERENCE_GATHER
    _REFERENCE_GATHER = enabled
    try:
        yield
    finally:
        _REFERENCE_GATHER = previous
