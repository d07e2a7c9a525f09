"""Pallas row-gather for device-resident batching.

The training scan gathers a shuffled batch of cell rows from the
HBM-resident count matrix every step (``jnp.take`` in
``models/step.py``).  XLA's gather lowering reaches only ~65 GB/s on
this pattern — ~0.4 ms of a 0.85 ms step at the flagship shape
(benchmarks/profile_step.py) — so this module gathers with explicit row
DMAs instead.

TPU HBM buffers are (8, 128)-tiled (sublane packing ×2 for 16-bit
types), so a single logical row of an (N, F) matrix is NOT a DMA-able
slice.  The source is therefore stored PACKED as (N·a, F/a) where
``a = 32 / itemsize`` — logical row i occupies the a-sublane-aligned
block [i·a, (i+1)·a), byte-identical to the row-major (N, F) layout —
and each gathered row becomes one aligned (a, F/a) block DMA.  The
kernel unpacks back to (B, F) in VMEM (a sublane→lane relayout) and
casts to the requested output dtypes on the way out, so a single pass
can emit e.g. a bf16 encoder input AND an f32 likelihood target without
a separate cast over HBM.

Falls back to ``jnp.take`` (the caller's responsibility) when the shape
doesn't divide; see :func:`can_pack`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scvae_tpu.utils.struct import pytree_dataclass, static_field

# sublane alignment per itemsize: (8, 128) tiles, 32-bit granules
_ALIGN = {4: 8, 2: 16, 1: 32}

_ROW_TILES = (256, 128, 64, 32, 16, 8)  # rows per program, best first


def _rows_per_program(batch: int) -> int | None:
    for tb in _ROW_TILES:
        if batch % tb == 0:
            return tb
    return None


def can_pack(n_rows: int, n_cols: int, dtype) -> bool:
    """True iff an (n_rows, n_cols) array of ``dtype`` can use the packed
    layout: the row must split into ``a`` equal 128-lane-aligned pieces."""
    a = _ALIGN.get(np.dtype(dtype).itemsize)
    if a is None:
        return False
    return n_cols % a == 0 and (n_cols // a) % 128 == 0


@pytree_dataclass
class FieldAlias:
    """Marker for a batch field that aliases another field's source
    array (x and t are usually the same count matrix).  It carries NO
    pytree leaves — the aliased data enters jit once — so the per-step
    gather kernel (a custom call XLA cannot CSE) runs once per unique
    source instead of once per field."""

    target: str = static_field()


@pytree_dataclass
class PackedRows:
    """An (N, F) row matrix stored packed as (N·a, F/a) for aligned row
    DMAs.  ``data`` is the packed device array; ``n_rows``/``n_cols``
    record the logical shape (static: they ride the pytree aux data)."""

    data: jax.Array
    n_rows: int = static_field()
    n_cols: int = static_field()

    @property
    def shape(self):  # logical
        return (self.n_rows, self.n_cols)

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def align(self) -> int:
        return _ALIGN[np.dtype(self.data.dtype).itemsize]


def pack_rows(values: np.ndarray) -> PackedRows:
    """Host-side: reshape an (N, F) row-major array to the packed layout
    (a pure view — same bytes)."""
    n, f = values.shape
    a = _ALIGN[values.dtype.itemsize]
    if not can_pack(n, f, values.dtype):
        raise ValueError(
            f"({n}, {f}) {values.dtype} rows cannot be packed "
            f"(need F divisible by {a}·128)"
        )
    packed = values.reshape(n * a, f // a)
    return PackedRows(data=jnp.asarray(packed), n_rows=n, n_cols=f)


def _make_gather_kernel(a, f, tb, out_dtypes):
    def kernel(idx_ref, src_ref, *out_and_scratch):
        outs = out_and_scratch[: len(out_dtypes)]
        scratch, sems = out_and_scratch[len(out_dtypes):]
        i = pl.program_id(0)
        base = i * tb

        def start(r, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[base + r] * a, a), :],
                scratch.at[pl.ds(r * a, a), :],
                sems.at[r],
            ).start()
            return ()

        jax.lax.fori_loop(0, tb, start, (), unroll=1)

        def wait(r, _):
            pltpu.make_async_copy(
                src_ref.at[pl.ds(idx_ref[base + r] * a, a), :],
                scratch.at[pl.ds(r * a, a), :],
                sems.at[r],
            ).wait()
            return ()

        jax.lax.fori_loop(0, tb, wait, (), unroll=1)
        rows = scratch[:].reshape(tb, f)  # unpack: (tb·a, f/a) → (tb, f)
        for out_ref, dtype in zip(outs, out_dtypes):
            out_ref[:] = rows.astype(dtype)

    return kernel


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_call(data, idx, static):
    a, f, tb, out_dtypes, src_dtype = static
    b = idx.shape[0]
    fa = f // a
    return pl.pallas_call(
        _make_gather_kernel(a, f, tb, out_dtypes),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(b // tb,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=[
                pl.BlockSpec((tb, f), lambda i, idx: (i, 0),
                             memory_space=pltpu.VMEM)
                for _ in out_dtypes
            ],
            scratch_shapes=[
                pltpu.VMEM((tb * a, fa), src_dtype),
                pltpu.SemaphoreType.DMA((tb,)),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((b, f), dtype) for dtype in out_dtypes
        ],
    )(idx, data)


def gather_rows(
    packed: PackedRows, idx: jax.Array, out_dtypes=(jnp.float32,)
) -> list[jax.Array]:
    """Gather logical rows ``idx`` (B,) int32 → one (B, F) array per
    requested output dtype (a single HBM pass feeding multiple casts).

    Requires B divisible by 8; callers guard with
    :func:`supports_gather_batch` and fall back to ``jnp.take``."""
    tb = _rows_per_program(idx.shape[0])
    if tb is None:
        raise ValueError(f"batch {idx.shape[0]} not divisible by 8")
    static = (
        packed.align,
        packed.n_cols,
        tb,
        tuple(jnp.dtype(d) for d in out_dtypes),
        packed.data.dtype,
    )
    return _gather_call(packed.data, idx, static)


def supports_gather_batch(batch: int) -> bool:
    return _rows_per_program(batch) is not None


def logical_slice(packed: PackedRows, start: int, stop: int) -> jax.Array:
    """Contiguous logical rows [start, stop) as a plain (stop−start, F)
    array (used for remainder batches; small, so the relayout is cheap)."""
    a = packed.align
    rows = packed.data[start * a: stop * a]
    return rows.reshape(stop - start, packed.n_cols)
