"""Jitted training / evaluation steps and the train state.

The reference runs one ``session.run([optimiser, lower_bound])`` per
minibatch (``scvae/models/variational_autoencoder.py:1026-1029``); here the
whole forward-backward-update is a single ``jit``-compiled pure function
``train_step(train_state, batch, rng, warm_up_weight) → (train_state,
metrics)``.  Optimiser matches the reference: Adam with element-wise
gradient value-clipping to [−1, 1] (``:2736-2770``).
"""

from __future__ import annotations

import functools
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax

from scvae_tpu.utils.struct import pytree_dataclass

LossFn = Callable[..., tuple[jax.Array, tuple[dict[str, jax.Array], Any]]]


@pytree_dataclass
class TrainState:
    params: Any
    model_state: Any  # batch-norm running statistics
    opt_state: Any
    step: jax.Array


def make_optimizer(learning_rate: float) -> optax.GradientTransformation:
    """clip_by_value(g, −1, 1) → Adam, like the reference optimiser."""
    return optax.chain(optax.clip(1.0), optax.adam(learning_rate))


def create_train_state(
    params: Any,
    model_state: Any,
    optimizer: optax.GradientTransformation,
) -> TrainState:
    return TrainState(
        params=params,
        model_state=model_state,
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def gather_batch(data, idx, dtype_overrides=None):
    """Gather one batch of rows from device-resident data.

    Fields stored as :class:`~scvae_tpu.ops.gather.PackedRows` use the
    Pallas row-DMA gather (XLA's gather lowering runs ~6× below HBM
    bandwidth on this pattern); everything else falls back to
    ``jnp.take``.  :class:`~scvae_tpu.ops.gather.FieldAlias` entries (x
    and t are usually the same matrix) share one gather — the kernel is
    a custom call XLA cannot CSE, so the dedup is structural.

    ``dtype_overrides`` maps field name → output dtype for PackedRows
    fields (default f32).  The gather kernel emits every requested dtype
    in ONE HBM pass, so e.g. the encoder input ``x`` can come out bf16
    for a mixed-precision trunk while the likelihood target ``t`` stays
    exact f32 — removing a full (B, F) cast round trip per step.
    """
    from scvae_tpu.ops.gather import (
        FieldAlias,
        PackedRows,
        gather_rows,
        supports_sharded_gather_batch,
    )

    overrides = dtype_overrides or {}
    # fields sharing a source (x ≡ t) resolve through the alias target,
    # so collect each target's full set of requested output dtypes first
    wanted: dict[str, list] = {}
    for k, v in data.items():
        target = v.target if isinstance(v, FieldAlias) else k
        dtype = jnp.dtype(overrides.get(k, jnp.float32))
        wanted.setdefault(target, [])
        if dtype not in wanted[target]:
            wanted[target].append(dtype)

    gathered: dict[str, dict] = {}
    batch = {}
    for k, v in data.items():
        if isinstance(v, FieldAlias):
            continue  # resolved below, after the target is gathered
        if isinstance(v, PackedRows):
            dtypes = tuple(wanted[k])
            if supports_sharded_gather_batch(v, idx.shape[0]):
                outs = gather_rows(v, idx, dtypes)
            else:
                rows = jnp.take(
                    v.data.reshape(v.n_rows, v.align, -1), idx, axis=0
                ).reshape(idx.shape[0], v.n_cols)
                outs = [rows.astype(d) for d in dtypes]
            gathered[k] = dict(zip(dtypes, outs))
            batch[k] = gathered[k][jnp.dtype(overrides.get(k, jnp.float32))]
        else:
            batch[k] = jnp.take(v, idx, axis=0)
    for k, v in data.items():
        # aliased fields share the gathered array — the gather kernel is
        # a custom call XLA cannot CSE, so it must run once per source
        if isinstance(v, FieldAlias):
            if v.target in gathered:
                batch[k] = gathered[v.target][
                    jnp.dtype(overrides.get(k, jnp.float32))
                ]
            else:
                batch[k] = batch[v.target]
    return batch


def _scatter_wire_shards(wire):
    """Densify a mesh-sharded CSR wire: each data shard scatters its own
    (1, capacity) COO block into its (B/n_shards, F) row block under
    ``shard_map`` — the result is the same row-sharded (B, F) global
    batch the dense wire places, with ~5-7× fewer host→device bytes."""
    from jax.sharding import PartitionSpec as P

    n_shards = wire.mesh.shape[wire.data_axis]
    local_rows = wire.n_rows // n_shards
    n_cols = wire.n_cols

    def local(data, cols, rows):
        dense = jnp.zeros((local_rows, n_cols), jnp.float32)
        return dense.at[
            rows[0].astype(jnp.int32), cols[0].astype(jnp.int32)
        ].add(data[0].astype(jnp.float32), mode="drop")

    return jax.shard_map(
        local,
        mesh=wire.mesh,
        in_specs=(P(wire.data_axis),) * 3,
        out_specs=P(wire.data_axis),
        check_vma=False,
    )(wire.data, wire.cols, wire.rows)


def materialize_batch(batch):
    """Densify any :class:`~scvae_tpu.data.pipeline.CSRWire` fields on
    device: a scatter-add of the padded-COO wire into a zero (B, F)
    matrix (padding entries carry row == B and are dropped).  The host
    ships ~5-7× fewer bytes at single-cell sparsity; XLA fuses the cast
    and the downstream f32 promotion.  Mesh-sharded wires scatter per
    shard under ``shard_map`` (see :func:`_scatter_wire_shards`)."""
    from scvae_tpu.data.pipeline import CSRWire

    out = {}
    for k, v in batch.items():
        if isinstance(v, CSRWire):
            if v.mesh is not None:
                out[k] = _scatter_wire_shards(v)
            else:
                dense = jnp.zeros((v.n_rows, v.n_cols), jnp.float32)
                out[k] = dense.at[
                    v.rows.astype(jnp.int32), v.cols.astype(jnp.int32)
                ].add(v.data.astype(jnp.float32), mode="drop")
        else:
            out[k] = v
    return out


def cast_batch_to_f32(batch):
    """Promote integer batch fields (counts shipped narrow to save wire /
    HBM bytes) to f32 for compute; ``batch_indices`` stays integral."""
    return {
        k: (
            v.astype(jnp.float32)
            if k != "batch_indices" and jnp.issubdtype(v.dtype, jnp.integer)
            else v
        )
        for k, v in batch.items()
    }


def make_train_step(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    *,
    jit: bool = True,
    donate: bool = True,
):
    """Build ``train_step(ts, batch, rng, warm_up_weight)``.

    ``loss_fn(params, model_state, batch, rng, warm_up_weight)`` must return
    ``(loss, (metrics, new_model_state))``.
    """

    def train_step(ts: TrainState, batch, rng, warm_up_weight):
        batch = cast_batch_to_f32(materialize_batch(batch))
        (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(ts.params, ts.model_state, batch, rng, warm_up_weight)
        updates, new_opt_state = optimizer.update(grads, ts.opt_state, ts.params)
        new_params = optax.apply_updates(ts.params, updates)
        new_ts = TrainState(
            params=new_params,
            model_state=new_model_state,
            opt_state=new_opt_state,
            step=ts.step + 1,
        )
        metrics = dict(metrics, loss=loss)
        return new_ts, metrics

    if jit:
        return jax.jit(train_step, donate_argnums=(0,) if donate else ())
    return train_step


def make_eval_step(eval_fn: Callable[..., dict[str, jax.Array]], *, jit: bool = True):
    def eval_step(params, model_state, batch, rng):
        return eval_fn(
            params, model_state,
            cast_batch_to_f32(materialize_batch(batch)), rng,
        )

    if jit:
        return jax.jit(eval_step)
    return eval_step


def make_train_epoch(
    loss_fn: LossFn,
    optimizer: optax.GradientTransformation,
    *,
    jit: bool = True,
    batch_constraint: Any = None,
    donate: bool = True,
    batch_dtypes: dict | None = None,
):
    """Whole-epoch training as one ``lax.scan`` over device-resident data.

    The reference dispatches one ``session.run`` per minibatch with a
    host-side ``feed_dict`` densification (``variational_autoencoder.py:
    987-1029``).  On TPU the per-step host→HBM transfer and dispatch
    dominate a sub-millisecond step, so when the dataset fits in HBM we
    keep it device-resident and scan over shuffled row-index batches:
    the only per-epoch host traffic is the (n_batches, B) permutation.

    ``train_epoch(ts, data, perm, rng, warm_up_weight) → (ts, metrics)``
    where ``data`` maps field → (N, …) device array (integer dtypes are
    cast to f32 per batch, so counts can live in HBM as int16/int32) and
    ``perm`` is an (n_batches, B) int32 index array.
    """

    def train_epoch(ts: TrainState, data, perm, rng, warm_up_weight):
        def body(carry, idx):
            ts, rng = carry
            rng, sub = jax.random.split(rng)
            batch = cast_batch_to_f32(
                gather_batch(data, idx, dtype_overrides=batch_dtypes)
            )
            if batch_constraint is not None:
                # Re-shard the gathered batch rows over the data axis so
                # the step computes data-parallel (the gather itself may
                # cross shards; GSPMD inserts the collective).
                batch = jax.lax.with_sharding_constraint(
                    batch, batch_constraint
                )
            (loss, (metrics, new_model_state)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(ts.params, ts.model_state, batch, sub, warm_up_weight)
            updates, new_opt_state = optimizer.update(
                grads, ts.opt_state, ts.params
            )
            new_params = optax.apply_updates(ts.params, updates)
            new_ts = TrainState(
                params=new_params,
                model_state=new_model_state,
                opt_state=new_opt_state,
                step=ts.step + 1,
            )
            return (new_ts, rng), {
                "lower_bound": metrics["lower_bound"],
                "loss": loss,
            }

        (ts, _), stacked = jax.lax.scan(body, (ts, rng), perm)
        epoch_metrics = {
            "lower_bound": jnp.mean(stacked["lower_bound"]),
            "loss": jnp.mean(stacked["loss"]),
            "last_lower_bound": stacked["lower_bound"][-1],
        }
        return ts, epoch_metrics

    if jit:
        return jax.jit(train_epoch, donate_argnums=(0,) if donate else ())
    return train_epoch


# Metrics collected by full-pass evaluators: the three ELBO scalars plus
# the per-latent-dimension KL vector that feeds the KL-evolution heat map
# (reference logs it per epoch as TF summaries; models/utilities.py:523).
EVAL_METRIC_KEYS = (
    "lower_bound",
    "reconstruction_error",
    "kl_divergence",
    "kl_divergence_neurons",
)


def make_eval_epoch(
    eval_fn: Callable[..., dict[str, jax.Array]],
    scalar_keys: tuple[str, ...] = EVAL_METRIC_KEYS,
    *,
    jit: bool = True,
    batch_constraint: Any = None,
):
    """Full-pass evaluation over device-resident data as one scan.

    ``eval_epoch(params, model_state, data, idx, rng) → {key: mean}`` where
    ``idx`` is (n_batches, B) row indices; batch means are weighted
    equally because batches are equal-sized (the host wrapper handles any
    remainder with one extra eval call).
    """

    def eval_epoch(params, model_state, data, idx, rng):
        def body(rng, batch_idx):
            rng, sub = jax.random.split(rng)
            batch = cast_batch_to_f32(gather_batch(data, batch_idx))
            if batch_constraint is not None:
                batch = jax.lax.with_sharding_constraint(
                    batch, batch_constraint
                )
            metrics = eval_fn(params, model_state, batch, sub)
            return rng, {k: metrics[k] for k in scalar_keys}

        _, stacked = jax.lax.scan(body, rng, idx)
        # mean over the batch axis only: scalars stay scalars, per-dimension
        # vectors (kl_divergence_neurons) stay vectors
        return {k: jnp.mean(v, axis=0) for k, v in stacked.items()}

    if jit:
        return jax.jit(eval_epoch)
    return eval_epoch


def sequential_batches(n: int, batch_size: int) -> "np.ndarray":
    """(n_batches, B) sequential full batches; remainder rows excluded."""
    import numpy as np

    n_batches = n // batch_size
    return np.arange(n_batches * batch_size, dtype=np.int32).reshape(
        n_batches, batch_size
    )


def _shard_real_counts(n_padded: int, n_real: int, shards: int):
    shard_rows = n_padded // shards
    return shard_rows, [
        max(0, min(shard_rows, n_real - d * shard_rows))
        for d in range(shards)
    ]


def stratified_sequential_batches(
    n_padded: int, n_real: int, batch_size: int, shards: int
):
    """Shard-stratified sequential batches for the mesh-sharded packed
    layout: batch column block d draws only from data shard d's row range
    (rows [d·Np/s, (d+1)·Np/s) of the zero-padded device array), so each
    device gathers purely local rows.

    Returns ``(idx, leftovers)``: ``idx`` is (n_batches, B); ``leftovers``
    is a list of (start, stop) real-row ranges the full batches did not
    cover (per-shard tails — evaluation handles them in one remainder
    call, like the single-device path's tail slice)."""
    import numpy as np

    block = batch_size // shards
    shard_rows, counts = _shard_real_counts(n_padded, n_real, shards)
    n_batches = min(c // block for c in counts)
    blocks = [
        d * shard_rows
        + np.arange(n_batches * block, dtype=np.int32).reshape(
            n_batches, block
        )
        for d in range(shards)
    ]
    idx = np.concatenate(blocks, axis=1)
    leftovers = [
        (d * shard_rows + n_batches * block, d * shard_rows + counts[d])
        for d in range(shards)
        if counts[d] > n_batches * block
    ]
    return idx, leftovers


def epoch_permutation(
    n: int,
    batch_size: int,
    seed_rng: "np.random.RandomState",
    *,
    data_shards: int = 1,
    n_real: int | None = None,
) -> "np.ndarray":
    """Host-side shuffled (n_batches, B) index array, dropping the
    remainder (static shapes for the scan).

    ``data_shards > 1`` produces a SHARD-STRATIFIED shuffle for the
    mesh-sharded packed layout (``ops.gather.PackedRows`` with a mesh):
    ``n`` is then the zero-padded device row count, ``n_real`` the real
    row count, and batch column block d permutes only shard d's real
    rows — every device's row-DMA gather stays local.  Within-shard order
    is uniformly random; cells were assigned to shards by dataset order,
    so for i.i.d. cells the minibatch distribution matches a global
    shuffle (the composition of each batch across shards is fixed, the
    membership within shards is not)."""
    import numpy as np

    if data_shards <= 1:
        perm = seed_rng.permutation(n)
        n_batches = n // batch_size
        return np.asarray(
            perm[: n_batches * batch_size].reshape(n_batches, batch_size),
            np.int32,
        )
    n_real = n if n_real is None else n_real
    block = batch_size // data_shards
    shard_rows, counts = _shard_real_counts(n, n_real, data_shards)
    n_batches = min(c // block for c in counts)
    blocks = [
        (
            d * shard_rows
            + seed_rng.permutation(counts[d])[: n_batches * block]
        ).reshape(n_batches, block)
        for d in range(data_shards)
    ]
    return np.concatenate(blocks, axis=1).astype(np.int32)


def tree_finite(tree: Any) -> jax.Array:
    """True iff every leaf is finite — the NaN-abort check the reference
    does on the host (``variational_autoencoder.py:1041-1044``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    oks = [jnp.all(jnp.isfinite(leaf)) for leaf in leaves]
    return functools.reduce(jnp.logical_and, oks, jnp.asarray(True))
