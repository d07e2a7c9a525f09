"""Host input pipeline: sparse CSR shards → dense device batches.

The reference densifies each minibatch inline in the train loop
(``scvae/models/variational_autoencoder.py:997-998``) and feeds it through
``feed_dict``.  Here the pipeline is an explicit component designed for
TPU feeding:

* shuffled epoch permutations from a seeded ``numpy`` RNG on the host;
* CSR row-slice → dense ``float32`` conversion per batch (cheap row
  gather, no full-matrix densification);
* **prefetch**: the next batch is densified and ``jax.device_put`` while
  the current step runs, so host work overlaps device compute;
* under a data-parallel mesh, each batch is placed with a batch-axis
  ``NamedSharding``, giving every chip only its own rows (multi-host:
  each process densifies only its addressable shard).
"""

from __future__ import annotations

import collections
from typing import Any, Iterator

import numpy as np
import scipy.sparse

import jax


def _put_global(dense: np.ndarray, sharding) -> Any:
    """Place a batch on a (possibly multi-host) sharding.

    Single-process: plain ``device_put``.  Multi-process: every process
    passes only ITS rows (the caller already sliced them), assembled into
    one global array via ``jax.make_array_from_process_local_data`` —
    per-host CSR shard feeding, SURVEY.md §7 hard part 5."""
    if jax.process_count() == 1 or sharding is None:
        return jax.device_put(dense, sharding)
    return jax.make_array_from_process_local_data(sharding, dense)


def process_local_rows(indices: np.ndarray, sharding) -> np.ndarray:
    """The slice of a global row-index batch this process must densify.

    For a batch row-sharded over the data axis, shard d holds the d-th
    contiguous block; a process owns the blocks of its addressable
    devices, which GSPMD lays out contiguously for a trailing-process
    mesh, so the process block is ``indices[p·L : (p+1)·L]``."""
    if jax.process_count() == 1 or sharding is None:
        return indices
    p = jax.process_index()
    per_process = len(indices) // jax.process_count()
    return indices[p * per_process:(p + 1) * per_process]


def densify_rows(values, indices: np.ndarray) -> np.ndarray:
    """Slice rows and densify to float32 (multi-threaded C++ gather when
    the native library is available, scipy otherwise)."""
    if scipy.sparse.issparse(values) and values.format == "csr":
        from scvae_tpu import native

        out = native.csr_gather_dense(values, np.asarray(indices))
        if out is not None:
            return out
    rows = values[indices]
    if scipy.sparse.issparse(rows):
        rows = rows.toarray()
    rows = np.asarray(rows)
    if not np.issubdtype(rows.dtype, np.integer):
        # Floats narrow to f32 for the wire; integer fields (batch_indices,
        # narrow-dtype counts) keep their dtype — the device step promotes
        # counts and one-hots indices itself.
        rows = rows.astype(np.float32, copy=False)
    return np.ascontiguousarray(rows)


class CSRWire:
    """A batch count matrix shipped host→device in padded-COO form
    instead of dense: ``data``/``cols``/``rows`` are (capacity,) arrays
    (padding entries carry ``rows == n_rows`` and are dropped by the
    device scatter), ``n_rows``/``n_cols`` the dense shape.  At PBMC-like
    ~93% sparsity the wire shrinks ~5-7× vs dense int16 — the streaming
    path's bottleneck is the host link (reference pain point: 47 GB to
    analyse 10x-MBC, ``docs/guide.rst:61``).  Registered as a pytree so
    it flows into the jitted step, which densifies on device
    (``models.step.materialize_batch``).

    Mesh composition (round 5, VERDICT r04 item 6): with ``mesh``/
    ``data_axis`` set, the wire arrays are (n_shards, capacity), sharded
    over the data axis — shard d's slice holds the padded COO of ITS
    contiguous row block of the batch, with LOCAL row ids (padding =
    local rows) — and the device scatter runs per shard under
    ``shard_map``, producing the same row-sharded (B, F) batch the dense
    wire places.  Each host therefore ships ~5-7× fewer bytes over its
    own PCIe link too."""

    def __init__(self, data, cols, rows, n_rows: int, n_cols: int,
                 mesh=None, data_axis=None):
        self.data = data
        self.cols = cols
        self.rows = rows
        self.n_rows = int(n_rows)
        self.n_cols = int(n_cols)
        self.mesh = mesh
        self.data_axis = data_axis

    @property
    def shape(self):
        return (self.n_rows, self.n_cols)

    def tree_flatten(self):
        return (
            (self.data, self.cols, self.rows),
            (self.n_rows, self.n_cols, self.mesh, self.data_axis),
        )

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children, *aux)


jax.tree_util.register_pytree_node(
    CSRWire,
    lambda w: w.tree_flatten(),
    lambda aux, children: CSRWire.tree_unflatten(aux, children),
)


def _narrow_int(max_value: int):
    return np.int16 if max_value <= np.iinfo(np.int16).max else np.int32


class BatchPipeline:
    """Iterates device-ready batch dictionaries for one data subset.

    ``arrays`` maps field name → row-indexable host array (CSR or ndarray).
    Fields are sliced with the same shuffled indices so they stay aligned.

    ``wire_format="csr"`` ships sparse integral count fields (``x``/``t``)
    as :class:`CSRWire` instead of dense — ``"auto"`` turns it on for CSR
    inputs whose density makes the wire at least ~2× smaller.  Under a
    single-row-axis mesh (single process) the wire ships per-shard COO
    blocks and densifies per shard in ``shard_map``; multi-process
    streaming keeps the dense wire (per-process overflow fallback cannot
    be reconciled without a collective — see STATUS).
    """

    def __init__(
        self,
        arrays: dict[str, Any],
        batch_size: int,
        *,
        shuffle: bool = True,
        drop_remainder: bool = False,
        seed: int = 0,
        sharding: Any = None,
        prefetch: int = 2,
        count_dtype=None,
        wire_format: str = "auto",
    ):
        if not arrays:
            raise ValueError("arrays must be non-empty")
        self.arrays = arrays
        first = next(iter(arrays.values()))
        self.n = first.shape[0]
        for name, arr in arrays.items():
            if arr.shape[0] != self.n:
                raise ValueError(
                    f"Field {name!r} has {arr.shape[0]} rows, expected {self.n}"
                )
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_remainder = drop_remainder
        self.sharding = sharding
        # Batches whose row count doesn't divide the data axis can't be
        # row-sharded; they fall back to replicated placement (every chip
        # computes the whole remainder batch — correct, briefly wasteful).
        self._replicated_sharding = None
        self._data_shards = 1
        if sharding is not None and hasattr(sharding, "mesh"):
            from jax.sharding import NamedSharding, PartitionSpec

            self._replicated_sharding = NamedSharding(
                sharding.mesh, PartitionSpec()
            )
            spec = getattr(sharding, "spec", None)
            if spec and spec[0] is not None:
                axes = spec[0] if isinstance(spec[0], tuple) else (spec[0],)
                self._data_shards = int(
                    np.prod([sharding.mesh.shape[a] for a in axes])
                )
        self.prefetch = max(int(prefetch), 0)
        self._rng = np.random.RandomState(seed)
        # Wire compression: ship integral count fields at the narrowest
        # integer width (the device casts back to f32 per step —
        # models.step.cast_batch_to_f32), halving host→HBM bytes for
        # int16-eligible counts.
        self._wire_dtypes: dict[str, Any] = {}
        if count_dtype is not None:
            candidates = (
                count_dtype
                if isinstance(count_dtype, (tuple, list))
                else (count_dtype,)
            )
            checked_by_id: dict[int, Any] = {}
            for name in ("x", "t"):
                arr = arrays.get(name)
                if arr is None:
                    continue
                key = id(arr)
                if key not in checked_by_id:
                    checked_by_id[key] = narrowest_count_dtype(
                        arr, candidates
                    )
                if checked_by_id[key] is not None:
                    self._wire_dtypes[name] = checked_by_id[key]
        # CSR wire: per-field precomputed nnz stats + a static padded
        # capacity so the jitted step compiles once (overflowing batches
        # — none at the chosen 4σ headroom unless the data is adversarial
        # — fall back to the dense wire for that batch).
        if wire_format not in ("auto", "csr", "dense"):
            raise ValueError(
                "wire_format must be auto, csr, or dense"
            )
        from scvae_tpu.ops.gather import sharding_row_axis

        self._row_axis = sharding_row_axis(sharding)
        # Mesh composition: the wire shards over a single row axis — each
        # shard ships its own padded COO block (local row ids) and the
        # scatter densify runs per shard under shard_map.  Compound or
        # replicated specs keep the dense wire.
        wire_shards = 1
        if sharding is not None:
            # Multi-process keeps the dense wire: the capacity-overflow
            # fallback is data-dependent PER PROCESS, and one process
            # falling back while another ships the wire would need a
            # host-side collective to reconcile (see STATUS for the
            # measured dense-wire justification on pod hosts).
            wire_shards = (
                self._data_shards
                if self._row_axis is not None
                and batch_size % self._data_shards == 0
                and jax.process_count() == 1
                else 0
            )
        self._csr_wire: dict[str, dict] = {}
        if wire_format in ("auto", "csr") and wire_shards:
            wire_rows = batch_size // wire_shards  # rows per wire block
            for name in ("x", "t"):
                arr = arrays.get(name)
                if (
                    arr is None
                    or not scipy.sparse.issparse(arr)
                    or arr.format != "csr"
                    or name not in self._wire_dtypes
                ):
                    continue
                nnz_per_row = np.diff(arr.indptr)
                density = arr.nnz / max(arr.shape[0] * arr.shape[1], 1)
                # wire bytes/entry: data + col + row (narrow ints)
                entry_bytes = (
                    np.dtype(self._wire_dtypes[name]).itemsize
                    + np.dtype(_narrow_int(arr.shape[1])).itemsize
                    + np.dtype(_narrow_int(wire_rows)).itemsize
                )
                dense_bytes = np.dtype(self._wire_dtypes[name]).itemsize
                if (
                    wire_format == "auto"
                    and density * entry_bytes > 0.5 * dense_bytes
                ):
                    continue  # not sparse enough to pay off
                mean = float(nnz_per_row.mean()) * wire_rows
                std = float(nnz_per_row.std()) * np.sqrt(wire_rows)
                capacity = int(
                    -(-(mean + 4.0 * std + 1) // 1024) * 1024
                )
                self._csr_wire[name] = {
                    "capacity": capacity,
                    "col_dtype": _narrow_int(arr.shape[1]),
                    "row_dtype": _narrow_int(wire_rows),
                }

    def batches_per_epoch(self) -> int:
        if self.drop_remainder:
            return self.n // self.batch_size
        return -(-self.n // self.batch_size)

    def _epoch_indices(self) -> np.ndarray:
        if self.shuffle:
            return self._rng.permutation(self.n)
        return np.arange(self.n)

    def _make_batch(self, idx: np.ndarray) -> dict[str, Any]:
        # Duplicate fields referencing the same host array (x and t are
        # usually the same matrix) are densified and transferred once.
        sharding = self.sharding
        local_idx = idx
        if sharding is not None:
            if len(idx) % self._data_shards != 0:
                # Non-divisible remainder batches fall back to replicated
                # placement; replication means every process provides the
                # full batch, so no local slicing.
                sharding = self._replicated_sharding
            else:
                # Multi-host: each process densifies only the rows its
                # addressable devices hold (SURVEY.md §7 hard part 5).
                local_idx = process_local_rows(idx, sharding)
        placed_by_key: dict[tuple, Any] = {}
        batch: dict[str, Any] = {}
        for name, arr in self.arrays.items():
            wire_dtype = self._wire_dtypes.get(name)
            csr_spec = self._csr_wire.get(name)
            key = (
                id(arr),
                None if wire_dtype is None else np.dtype(wire_dtype).str,
                csr_spec is not None,
            )
            if key not in placed_by_key:
                wire = None
                if csr_spec is not None and sharding is self.sharding:
                    # (remainder batches run replicated-dense — the wire
                    # is built only for full, normally-sharded batches)
                    wire = self._make_csr_wire(
                        arr, local_idx, wire_dtype, csr_spec
                    )
                if wire is not None:
                    placed_by_key[key] = wire
                else:
                    dense = densify_rows(arr, local_idx)
                    if wire_dtype is not None:
                        dense = dense.astype(wire_dtype)
                    placed_by_key[key] = _put_global(dense, sharding)
            batch[name] = placed_by_key[key]
        return batch

    @staticmethod
    def _coo_block(arr, idx, wire_dtype, spec, capacity):
        """Padded-COO arrays for one wire block (rows ``idx``), with
        block-LOCAL row ids (padding = ``len(idx)``), or ``None`` when
        the block's nnz overflows the static capacity."""
        starts = arr.indptr[idx]
        counts = arr.indptr[idx + 1] - starts
        total = int(counts.sum())
        if total > capacity:
            return None
        # vectorised multi-range gather: element e of the wire belongs to
        # batch row row_of[e] and is that row's within[e]-th stored entry
        cum = np.cumsum(counts)
        pos = np.arange(total)
        row_of = np.searchsorted(cum, pos, side="right")
        row_base = np.concatenate([[0], cum[:-1]])
        src = starts[row_of] + (pos - row_base[row_of])
        pad = capacity - total
        data = np.concatenate(
            [arr.data[src].astype(wire_dtype),
             np.zeros(pad, wire_dtype)]
        )
        cols = np.concatenate(
            [arr.indices[src].astype(spec["col_dtype"]),
             np.zeros(pad, spec["col_dtype"])]
        )
        rows = np.concatenate(
            [row_of.astype(spec["row_dtype"]),
             np.full(pad, len(idx), spec["row_dtype"])]
        )
        return data, cols, rows

    def _make_csr_wire(self, arr, idx, wire_dtype, spec):
        """Wire arrays for the batch rows ``idx`` (device-put), or
        ``None`` when any block's nnz overflows the static capacity
        (dense fallback keeps the step correct at any sparsity).

        Unsharded: one flat (capacity,) block.  Mesh-sharded (single
        process): one block PER DATA SHARD, stacked (n_shards, capacity)
        and placed over the row axis — each shard scatters its own block
        under shard_map (``models.step.materialize_batch``).  Multi-
        process keeps the dense wire: the overflow fallback is data-
        dependent per process and cannot be coordinated without a
        collective (measured decision — see STATUS)."""
        capacity = spec["capacity"]
        if self.sharding is None:
            coo = self._coo_block(arr, idx, wire_dtype, spec, capacity)
            if coo is None:
                return None
            return CSRWire(
                data=jax.device_put(coo[0]),
                cols=jax.device_put(coo[1]),
                rows=jax.device_put(coo[2]),
                n_rows=len(idx),
                n_cols=arr.shape[1],
            )
        wire_rows = self.batch_size // self._data_shards
        if len(idx) != self._data_shards * wire_rows:
            # remainder batches (fewer blocks than mesh shards) can't
            # place one block per shard — dense fallback
            return None
        blocks = np.asarray(idx).reshape(-1, wire_rows)
        parts = [
            self._coo_block(arr, block, wire_dtype, spec, capacity)
            for block in blocks
        ]
        if any(p is None for p in parts):
            return None
        from jax.sharding import NamedSharding, PartitionSpec

        wire_sharding = NamedSharding(
            self.sharding.mesh, PartitionSpec(self._row_axis)
        )
        data, cols, rows = (
            _put_global(np.stack([p[i] for p in parts]), wire_sharding)
            for i in range(3)
        )
        return CSRWire(
            data=data, cols=cols, rows=rows,
            n_rows=len(idx), n_cols=arr.shape[1],
            mesh=self.sharding.mesh, data_axis=self._row_axis,
        )

    def epoch(self) -> Iterator[dict[str, Any]]:
        """One pass over the data with prefetching."""
        indices = self._epoch_indices()
        n_batches = self.batches_per_epoch()
        slices = [
            indices[i * self.batch_size: (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]
        queue: collections.deque = collections.deque()
        it = iter(slices)
        # warm the prefetch queue
        for _ in range(self.prefetch + 1):
            try:
                queue.append(self._make_batch(next(it)))
            except StopIteration:
                break
        while queue:
            out = queue.popleft()
            try:
                queue.append(self._make_batch(next(it)))
            except StopIteration:
                pass
            yield out


def narrowest_count_dtype(values, candidates=(np.int16, np.int32)):
    """Narrowest candidate integer dtype that can represent ``values``
    exactly, or ``None`` if the values are not integral counts.  Works on
    CSR matrices without densifying (only the stored entries matter —
    implicit zeros fit any dtype)."""
    data = values.data if scipy.sparse.issparse(values) else np.asarray(values)
    if data.size == 0:
        return candidates[0]
    if np.issubdtype(data.dtype, np.integer):
        lo, hi = data.min(), data.max()
    elif np.issubdtype(data.dtype, np.floating):
        # sample-check integrality cheaply before the full pass
        sample = data.flat[: 4096]
        if not np.all(sample == np.round(sample)):
            return None
        if not np.all(data == np.round(data)):
            return None
        lo, hi = data.min(), data.max()
    else:
        return None
    for dtype in candidates:
        info = np.iinfo(dtype)
        if lo >= info.min and hi <= info.max:
            return dtype
    return None


def device_resident_data(
    arrays: dict[str, Any],
    *,
    count_dtype=None,
    sharding: Any = None,
    pad_rows_to_multiple_of: int = 1,
    packed: bool | None = None,
) -> dict[str, Any]:
    """Densify a whole data subset and place it in device memory once.

    The fast path for datasets that fit in HBM: pairs with
    :func:`scvae_tpu.models.step.make_train_epoch`, which scans over
    row-index batches gathered on device — eliminating the per-step
    host→HBM transfer entirely.  ``count_dtype`` stores count matrices
    compactly (a single dtype, or a tuple of candidates tried narrowest
    first, e.g. ``(np.int16, np.int32)``); they are cast back to f32 per
    batch on device.  Duplicate fields referencing the same host array
    (x and t are usually the same matrix) are transferred once and
    aliased.  ``pad_rows_to_multiple_of`` zero-pads the row axis so the
    array can be row-sharded over a data-parallel mesh (callers only ever
    gather real row indices, so padding rows are inert).

    ``packed`` stores 2-D row matrices in the DMA-aligned packed layout
    of :mod:`scvae_tpu.ops.gather` (``PackedRows``), letting the training
    scan gather shuffled batches with explicit row DMAs instead of XLA's
    slow gather.  ``None`` → automatic: on when the Pallas fast paths are
    enabled (TPU backend, or forced for interpreter-mode testing), the
    shape divides, and the process is the only one — either unsharded or
    row-sharded over a single mesh axis, in which case the packed buffer
    is sharded too and the gather runs per-shard with local row DMAs
    (requires the shard-stratified permutations of
    ``models.step.epoch_permutation``).
    """
    import jax

    from scvae_tpu.ops.gather import (
        FieldAlias,
        can_pack,
        pack_rows,
        sharding_row_axis,
    )
    from scvae_tpu.ops.runtime import (
        pallas_enabled,
        reference_gather_enabled,
    )

    placed_by_id: dict[int, Any] = {}
    first_name_by_id: dict[int, str] = {}
    out: dict[str, Any] = {}
    for name, arr in arrays.items():
        key = id(arr)
        if key in placed_by_id:
            placed = placed_by_id[key]
            if hasattr(placed, "n_rows"):  # PackedRows
                # zero-leaf alias: the packed buffer enters jit once and
                # its gather kernel is shared (custom calls don't CSE)
                out[name] = FieldAlias(first_name_by_id[key])
            else:
                out[name] = placed
            continue
        first_name_by_id[key] = name
        storage_dtype = None
        if count_dtype is not None and name in ("x", "t"):
            candidates = (
                count_dtype
                if isinstance(count_dtype, (tuple, list))
                else (count_dtype,)
            )
            storage_dtype = narrowest_count_dtype(arr, candidates)
        dense = arr
        if scipy.sparse.issparse(dense):
            dense = dense.toarray()
        dense = np.asarray(dense)
        multiple = max(int(pad_rows_to_multiple_of), 1)
        n_padded = -(-dense.shape[0] // multiple) * multiple
        row_axis = sharding_row_axis(sharding)
        packable_shards = (
            1
            if sharding is None
            else (
                sharding.mesh.shape[row_axis]
                if row_axis is not None
                else 0  # compound/replicated specs: no packed layout
            )
        )
        use_packed = packed
        if use_packed is None and (
            (pallas_enabled() or reference_gather_enabled())
            and dense.ndim == 2
            and packable_shards >= 1
            and n_padded % max(packable_shards, 1) == 0
            # multi-host needs the row sharding to address per-process
            # blocks; single-process can pack unsharded too
            and (jax.process_count() == 1 or row_axis is not None)
        ):
            # The packed row-DMA gather is a bigger win than a narrow
            # storage dtype (VERDICT r03: 6× gather bandwidth + a 460 s
            # XLA-gather compile avoided), so prefer the NARROWEST dtype
            # whose alignment packs — widening over the count dtype when
            # that's what it takes (wider alignment ⇒ stricter F rule).
            f = dense.shape[1]
            dtype_prefs = []
            if storage_dtype is not None:
                dtype_prefs.append(np.dtype(storage_dtype))
                for cand in (np.int32, np.float32):
                    if np.dtype(cand).itemsize > np.dtype(storage_dtype).itemsize:
                        dtype_prefs.append(np.dtype(cand))
            else:
                dtype_prefs.append(
                    np.dtype(dense.dtype)
                    if dense.dtype.itemsize in (1, 2, 4)
                    else np.dtype(np.float32)
                )
            for cand in dtype_prefs:
                if can_pack(n_padded, f, cand):
                    storage_dtype = cand
                    use_packed = True
                    break
        if storage_dtype is not None and dense.dtype != storage_dtype:
            dense = dense.astype(storage_dtype)
        if n_padded != dense.shape[0]:
            pad = np.zeros(
                (n_padded - dense.shape[0],) + dense.shape[1:], dense.dtype
            )
            dense = np.concatenate([dense, pad], axis=0)
        if use_packed is None:
            use_packed = False
        if use_packed:
            placed = pack_rows(
                dense, sharding=sharding if row_axis is not None else None
            )
            placed_by_id[key] = placed
            out[name] = placed
            continue
        if sharding is not None:
            spec = getattr(sharding, "spec", None)
            row_sharded = bool(spec) and spec[0] is not None
            if jax.process_count() > 1 and row_sharded:
                # Multi-host: transfer only this process's row block and
                # assemble the global array from the per-process pieces.
                p, n_proc = jax.process_index(), jax.process_count()
                per_process = dense.shape[0] // n_proc
                placed = jax.make_array_from_process_local_data(
                    sharding, dense[p * per_process:(p + 1) * per_process]
                )
            else:
                placed = jax.device_put(dense, sharding)
        else:
            placed = jax.device_put(dense)
        placed_by_id[key] = placed
        out[name] = placed
    return out


def build_model_arrays(
    data_set,
    *,
    use_preprocessed: bool = True,
    use_binarised: bool = False,
    use_count_sum_as_parameter: bool = False,
    use_count_sum_as_feature: bool = False,
    include_batch_indices: bool = False,
    noisy_preprocess=None,
) -> dict[str, Any]:
    """Assemble the field dictionary a model batch needs from a
    :class:`~scvae_tpu.data.DataSet` — mirrors the feed-array selection in
    the reference train loop (``variational_autoencoder.py:813-866``):
    inputs ``x`` are the (noisily) preprocessed values, targets ``t`` are
    binarised values when training a Bernoulli model else the preprocessed
    values."""
    if noisy_preprocess is not None:
        values = noisy_preprocess(data_set.values.copy())
        x = values
        t = values
    else:
        x = (
            data_set.preprocessed_values
            if use_preprocessed and data_set.preprocessed_values is not None
            else data_set.values
        )
        t = (
            data_set.binarised_values
            if use_binarised and data_set.binarised_values is not None
            else x
        )
    arrays: dict[str, Any] = {"x": x, "t": t}
    if use_count_sum_as_parameter:
        arrays["count_sum"] = data_set.count_sum.astype(np.float32)
    if use_count_sum_as_feature:
        arrays["count_sum_feature"] = data_set.normalised_count_sum.astype(
            np.float32
        )
    if include_batch_indices and data_set.batch_indices is not None:
        arrays["batch_indices"] = data_set.batch_indices.astype(np.int32)
    return arrays
