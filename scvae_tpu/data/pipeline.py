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


class BatchPipeline:
    """Iterates device-ready batch dictionaries for one data subset.

    ``arrays`` maps field name → row-indexable host array (CSR or ndarray).
    Fields are sliced with the same shuffled indices so they stay aligned.
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
            key = (id(arr), None if wire_dtype is None else np.dtype(wire_dtype).str)
            if key not in placed_by_key:
                dense = densify_rows(arr, local_idx)
                if wire_dtype is not None:
                    dense = dense.astype(wire_dtype)
                placed_by_key[key] = _put_global(dense, sharding)
            batch[name] = placed_by_key[key]
        return batch

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
    slow gather.  ``None`` → automatic: on for the TPU backend when the
    shape divides and the array is unsharded single-process.
    """
    import jax

    from scvae_tpu.ops.gather import FieldAlias, can_pack, pack_rows

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
        if storage_dtype is not None and dense.dtype != storage_dtype:
            dense = dense.astype(storage_dtype)
        multiple = max(int(pad_rows_to_multiple_of), 1)
        remainder = dense.shape[0] % multiple
        if remainder:
            pad = np.zeros(
                (multiple - remainder,) + dense.shape[1:], dense.dtype
            )
            dense = np.concatenate([dense, pad], axis=0)
        use_packed = packed
        if use_packed is None:
            use_packed = (
                jax.default_backend() == "tpu"
                and sharding is None
                and jax.process_count() == 1
                and dense.ndim == 2
                and can_pack(dense.shape[0], dense.shape[1], dense.dtype)
            )
        if use_packed:
            placed = pack_rows(dense)
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
