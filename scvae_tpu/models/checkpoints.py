"""Checkpointing: pytree ↔ NPZ with explicit step metadata, three named
versions, and learning-curve persistence.

Counterpart of the reference's TF1 ``Saver`` + directory-copy machinery
(``scvae/models/variational_autoencoder.py:1443-1474``,
``scvae/models/utilities.py:684-752``), redesigned per SURVEY.md §5.4:
steps/epochs are explicit JSON metadata (not parsed from checkpoint
filenames) and learning curves live in a JSON file per run (not TF event
files).  Three versions per run: the main directory (end of training),
``best/`` (max validation lower bound) and ``early_stopping/``.
"""

from __future__ import annotations

import concurrent.futures
import json
import os
import shutil
import threading
from typing import Any

import jax
import numpy as np

CHECKPOINT_FILE = "checkpoint.npz"
METADATA_FILE = "checkpoint.json"
LEARNING_CURVES_FILE = "learning_curves.json"

# Single-worker executor: async writes stay ordered relative to each other
# and to version-copy operations submitted through the same queue.
_executor: concurrent.futures.ThreadPoolExecutor | None = None
_executor_lock = threading.Lock()
_pending: list[concurrent.futures.Future] = []


def _get_executor() -> concurrent.futures.ThreadPoolExecutor:
    global _executor
    with _executor_lock:
        if _executor is None:
            _executor = concurrent.futures.ThreadPoolExecutor(
                max_workers=1, thread_name_prefix="ckpt"
            )
    return _executor


def _submit(fn, *args) -> None:
    future = _get_executor().submit(fn, *args)
    _pending.append(future)
    # prune completed futures, surfacing any write error
    done = [f for f in _pending if f.done()]
    for f in done:
        _pending.remove(f)
        f.result()


def wait_for_pending_writes() -> None:
    """Block until all queued async checkpoint operations complete."""
    while _pending:
        _pending.pop(0).result()


def _is_write_process() -> bool:
    """Multi-host runs share one filesystem view of the run directory;
    only process 0 performs file writes (every process still participates
    in any device→host gathers, which may involve collectives)."""
    return jax.process_index() == 0


def _gather_leaf(leaf: Any) -> np.ndarray:
    """Device→host copy that also works for leaves sharded across
    processes (tensor-parallel reconstruction heads under multi-host):
    reshard to fully-replicated first, which inserts the all-gather."""
    if isinstance(leaf, jax.Array) and not leaf.is_fully_addressable:
        from jax.sharding import NamedSharding, PartitionSpec

        replicated = NamedSharding(leaf.sharding.mesh, PartitionSpec())
        leaf = jax.jit(lambda x: x, out_shardings=replicated)(leaf)
    return np.asarray(leaf)


def _flatten(tree: Any) -> dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = jax.tree_util.keystr(path)
        flat[key] = _gather_leaf(leaf)
    return flat


def _write_checkpoint(directory: str, flat: dict, metadata: dict) -> None:
    os.makedirs(directory, exist_ok=True)
    tmp = os.path.join(directory, CHECKPOINT_FILE + ".tmp")
    with open(tmp, "wb") as f:
        np.savez(f, **flat)
    os.replace(tmp, os.path.join(directory, CHECKPOINT_FILE))
    tmp = os.path.join(directory, METADATA_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(metadata, f, indent=2)
    os.replace(tmp, os.path.join(directory, METADATA_FILE))


def save_checkpoint(
    directory: str,
    tree: Any,
    *,
    epoch: int,
    step: int | None = None,
    extra_metadata: dict[str, Any] | None = None,
    async_write: bool = False,
) -> None:
    """Atomically persist a pytree + metadata into ``directory``.

    ``async_write`` snapshots the leaves to host memory and performs the
    file IO on a background worker (ordered with any other async
    checkpoint operations), so training never blocks on disk.
    """
    flat = _flatten(tree)  # device→host copies happen here, synchronously
    if not _is_write_process():
        return
    metadata: dict[str, Any] = {"epoch": int(epoch)}
    if step is not None:
        metadata["step"] = int(step)
    if extra_metadata:
        metadata.update(extra_metadata)
    if async_write:
        _submit(_write_checkpoint, directory, flat, metadata)
    else:
        _write_checkpoint(directory, flat, metadata)


def checkpoint_exists(directory: str) -> bool:
    return os.path.exists(os.path.join(directory, CHECKPOINT_FILE))


def load_metadata(directory: str) -> dict[str, Any]:
    with open(os.path.join(directory, METADATA_FILE)) as f:
        return json.load(f)


def restore_checkpoint(directory: str, tree_like: Any) -> tuple[Any, dict]:
    """Restore into the structure of ``tree_like`` (shapes must match)."""
    with np.load(os.path.join(directory, CHECKPOINT_FILE)) as data:
        flat = dict(data)
    paths, treedef = jax.tree_util.tree_flatten_with_path(tree_like)
    leaves = []
    for path, leaf in paths:
        key = jax.tree_util.keystr(path)
        if key not in flat:
            raise KeyError(f"Checkpoint missing leaf {key}")
        stored = flat[key]
        if np.shape(stored) != np.shape(leaf):
            raise ValueError(
                f"Shape mismatch for {key}: checkpoint "
                f"{np.shape(stored)} vs model {np.shape(leaf)}"
            )
        leaves.append(jax.numpy.asarray(stored, dtype=np.asarray(leaf).dtype))
    metadata = load_metadata(directory)
    return jax.tree_util.tree_unflatten(
        jax.tree_util.tree_structure(tree_like), leaves
    ), metadata


def _copy_version(source_directory: str, target_directory: str) -> None:
    os.makedirs(target_directory, exist_ok=True)
    for filename in (CHECKPOINT_FILE, METADATA_FILE):
        source = os.path.join(source_directory, filename)
        if os.path.exists(source):
            shutil.copyfile(source, os.path.join(target_directory, filename))


def copy_checkpoint_version(
    source_directory: str, target_directory: str, *, async_write: bool = False
) -> None:
    """Snapshot the main checkpoint into a version subdirectory (replaces
    the reference's ``copy_model_directory``)."""
    if not _is_write_process():
        return
    if async_write:
        _submit(_copy_version, source_directory, target_directory)
    else:
        _copy_version(source_directory, target_directory)


def _remove(directory: str) -> None:
    for filename in (CHECKPOINT_FILE, METADATA_FILE):
        path = os.path.join(directory, filename)
        if os.path.exists(path):
            os.remove(path)


def remove_checkpoint(directory: str, *, async_write: bool = False) -> None:
    if not _is_write_process():
        return
    if async_write:
        _submit(_remove, directory)
    else:
        _remove(directory)


# --------------------------------------------------------------------------
# Centroid evolution (GMVAE per-epoch prior centroids; the reference
# reassembles these from TF-event scalar tags, models/utilities.py:385)
# --------------------------------------------------------------------------

CENTROIDS_FILE = "centroids.json"


def append_centroids(directory: str, centroids: dict[str, Any]) -> None:
    """Append one epoch's centroid snapshot ({probabilities, means,
    covariance_matrices} arrays) to the run's centroid history."""
    centroids = {k: _gather_leaf(v) for k, v in centroids.items()}
    if not _is_write_process():
        return
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, CENTROIDS_FILE)
    history: list = []
    if os.path.exists(path):
        with open(path) as f:
            history = json.load(f)
    history.append(
        {k: np.asarray(v).tolist() for k, v in centroids.items()}
    )
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(history, f)
    os.replace(tmp, path)


def load_centroids(directory: str) -> dict[str, np.ndarray] | None:
    """Centroid history stacked over epochs: name → (E, …) arrays."""
    path = os.path.join(directory, CENTROIDS_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        history = json.load(f)
    if not history:
        return None
    return {
        key: np.asarray([epoch[key] for epoch in history])
        for key in history[0]
    }


def truncate_centroids(directory: str, number_of_epochs: int) -> None:
    path = os.path.join(directory, CENTROIDS_FILE)
    if not os.path.exists(path):
        return
    with open(path) as f:
        history = json.load(f)
    with open(path, "w") as f:
        json.dump(history[:number_of_epochs], f)


# --------------------------------------------------------------------------
# Per-epoch array series (e.g. per-latent-dimension KL divergences; the
# reference reassembles these from TF-event tags, models/utilities.py:523)
# --------------------------------------------------------------------------

ARRAY_SERIES_FILE = "array_series.json"


def append_array_series(directory: str, name: str, vector: Any) -> None:
    """Append one epoch's vector (e.g. the (D,) per-neuron KL) to the named
    series in the run directory."""
    vector = _gather_leaf(vector)
    if not _is_write_process():
        return
    os.makedirs(directory, exist_ok=True)
    path = os.path.join(directory, ARRAY_SERIES_FILE)
    series: dict = {}
    if os.path.exists(path):
        with open(path) as f:
            series = json.load(f)
    series.setdefault(name, []).append(np.asarray(vector).tolist())
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(series, f)
    os.replace(tmp, path)


def load_array_series(directory: str, name: str) -> np.ndarray | None:
    """The named series stacked over epochs: (E, …) array, or None."""
    path = os.path.join(directory, ARRAY_SERIES_FILE)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        series = json.load(f)
    if name not in series or not series[name]:
        return None
    return np.asarray(series[name])


def truncate_array_series(directory: str, number_of_epochs: int) -> None:
    path = os.path.join(directory, ARRAY_SERIES_FILE)
    if not os.path.exists(path):
        return
    with open(path) as f:
        series = json.load(f)
    for name in series:
        series[name] = series[name][:number_of_epochs]
    with open(path, "w") as f:
        json.dump(series, f)


# --------------------------------------------------------------------------
# Learning curves (JSON, replacing event-file re-parsing; SURVEY.md §1)
# --------------------------------------------------------------------------


def load_learning_curves(directory: str) -> dict[str, dict[str, list[float]]]:
    path = os.path.join(directory, LEARNING_CURVES_FILE)
    if not os.path.exists(path):
        return {}
    with open(path) as f:
        return json.load(f)


def append_learning_curves(
    directory: str,
    epoch_metrics: dict[str, dict[str, float]],
) -> None:
    """``epoch_metrics``: {"training": {"lower_bound": …}, "validation": …}."""
    if not _is_write_process():
        return
    os.makedirs(directory, exist_ok=True)
    curves = load_learning_curves(directory)
    for kind, metrics in epoch_metrics.items():
        kind_curves = curves.setdefault(kind, {})
        for name, value in metrics.items():
            kind_curves.setdefault(name, []).append(float(value))
    tmp = os.path.join(directory, LEARNING_CURVES_FILE + ".tmp")
    with open(tmp, "w") as f:
        json.dump(curves, f)
    os.replace(tmp, os.path.join(directory, LEARNING_CURVES_FILE))


def truncate_learning_curves(directory: str, number_of_epochs: int) -> None:
    """Keep only the first N epochs (used when resuming from epoch N)."""
    curves = load_learning_curves(directory)
    for kind_curves in curves.values():
        for name in kind_curves:
            kind_curves[name] = kind_curves[name][:number_of_epochs]
    path = os.path.join(directory, LEARNING_CURVES_FILE)
    with open(path, "w") as f:
        json.dump(curves, f)
