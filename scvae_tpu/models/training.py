"""Training harness: the epoch loop around pluggable per-epoch runners.

Counterpart of the reference's 1000-line ``train`` methods
(``scvae/models/variational_autoencoder.py:640-1599``): epoch loop with
linear KL warm-up, NaN aborts, per-epoch train/validation evaluation,
early stopping (rounds=10) with an ``early_stopping/`` snapshot of the
epoch before degradation, per-epoch checkpointing with a ``best/`` copy on
validation improvement, learning-curve persistence, and checkpoint resume
with explicit epoch metadata.

The actual minibatch work is behind two callables so the same loop drives
both data paths:

* streaming — host CSR slices densified+transferred per step
  (:class:`scvae_tpu.data.pipeline.BatchPipeline`);
* device-resident — whole dataset in HBM, one ``lax.scan`` per epoch
  (:func:`scvae_tpu.models.step.make_train_epoch`), the TPU fast path.

Multi-host (SURVEY.md §7 hard part 5): the validation bound driving the
early-stopping decision is computed inside ``jit`` over globally-sharded
arrays, so GSPMD inserts the cross-process reductions and every process
observes the identical replicated value — the single-controller
equivalent of "psum the metric before the host-0 decision"; no explicit
collective is needed on the host.  File writes (checkpoints, curves)
are gated to process 0 inside :mod:`scvae_tpu.models.checkpoints`.
``tests/test_multihost.py`` drives this end-to-end with a 2-process
gloo loopback and asserts curve equality with single-process execution.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Iterable

import jax
import numpy as np

from scvae_tpu.models import checkpoints
from scvae_tpu.models.objectives import EarlyStopping, warm_up_weight
from scvae_tpu.models.step import TrainState, tree_finite
from scvae_tpu.utils.strings import format_duration

EARLY_STOPPING_ROUNDS = 10  # reference variational_autoencoder.py:278

# (train_state, epoch, warm_up_weight, rng) → (train_state, metrics)
EpochRunner = Callable[[TrainState, int, float, jax.Array], tuple[TrainState, dict]]
# (train_state, rng) → metrics
Evaluator = Callable[[TrainState, jax.Array], dict[str, float]]


@dataclasses.dataclass
class TrainingResult:
    train_state: TrainState
    number_of_epochs_trained: int
    stopped_early: bool
    best_epoch: int | None
    history: dict[str, dict[str, list[float]]]


def evaluate_on_pipeline(
    eval_step: Callable[..., dict[str, Any]],
    train_state: TrainState,
    pipeline,
    rng: jax.Array,
    *,
    scalar_keys: Iterable[str] | None = None,
) -> dict[str, Any]:
    """Batched full-pass evaluation, size-weighted like the reference's
    accumulation loops (``variational_autoencoder.py:2016-2055``).
    Vector-valued metrics (per-neuron KL) are averaged elementwise."""
    from scvae_tpu.models.step import EVAL_METRIC_KEYS

    if scalar_keys is None:
        scalar_keys = EVAL_METRIC_KEYS
    totals: dict[str, Any] = {k: 0.0 for k in scalar_keys}
    n_total = 0
    for batch in pipeline.epoch():
        rng, sub = jax.random.split(rng)
        metrics = eval_step(train_state.params, train_state.model_state, batch, sub)
        b = int(np.shape(batch["t"])[0])
        for k in totals:
            if k in metrics:
                totals[k] = totals[k] + np.asarray(metrics[k], np.float64) * b
        n_total += b
    if n_total == 0:
        return {k: float("nan") for k in scalar_keys}
    out = {}
    for k, v in totals.items():
        v = v / n_total
        out[k] = float(v) if np.ndim(v) == 0 else np.asarray(v)
    return out


def streaming_epoch_runner(
    train_step: Callable, make_training_pipeline: Callable[[int], Any]
) -> EpochRunner:
    """Per-step host feeding (the reference's feed_dict pattern)."""

    def run_epoch(train_state, epoch, wuw, rng):
        pipeline = make_training_pipeline(epoch)
        bounds = []
        for batch in pipeline.epoch():
            rng, sub = jax.random.split(rng)
            train_state, metrics = train_step(train_state, batch, sub, wuw)
            bounds.append(float(metrics["lower_bound"]))
        return train_state, {"lower_bound": float(np.mean(bounds))}

    return run_epoch


def device_epoch_runner(
    train_epoch: Callable,
    data: dict[str, Any],
    n_examples: int,
    batch_size: int,
    seed: int,
    *,
    lazy: bool = False,
    stratify_shards: int = 1,
    n_padded: int | None = None,
) -> EpochRunner:
    """Whole-epoch lax.scan over device-resident data.

    ``lazy=True`` returns the metric as a device value without the host
    fetch — required for ``fetch_mode="deferred"`` where the fetch happens
    one epoch later, under the next epoch's compute.

    ``stratify_shards > 1`` (mesh-sharded packed data, ``n_padded`` =
    zero-padded device row count): shard-stratified shuffles so the
    per-device row-DMA gathers stay local.  Deterministic given (seed,
    epoch, shard count) — resume at the SAME device count exactly
    continues the batch stream; a different device count changes the
    stratification (training stays correct, batch composition differs)."""
    from scvae_tpu.models.step import epoch_permutation

    def run_epoch(train_state, epoch, wuw, rng):
        perm_rng = np.random.RandomState(seed + epoch)
        if stratify_shards > 1:
            perm = epoch_permutation(
                n_padded, batch_size, perm_rng,
                data_shards=stratify_shards, n_real=n_examples,
            )
        else:
            perm = epoch_permutation(n_examples, batch_size, perm_rng)
        train_state, metrics = train_epoch(train_state, data, perm, rng, wuw)
        if lazy:
            return train_state, {"lower_bound": metrics["lower_bound"]}
        return train_state, {"lower_bound": float(metrics["lower_bound"])}

    return run_epoch



def _fast_forward_rng(
    rng, start_epoch, evaluate_training, evaluate_validation
):
    """Replay the per-epoch rng splits for already-trained epochs so a
    resumed run continues the EXACT stream an uninterrupted run would use
    (preemption-safe resume: curves continue identically; SURVEY §5.3-5.4)."""
    for _ in range(start_epoch):
        rng, _ = jax.random.split(rng)
        if evaluate_training is not None:
            rng, _ = jax.random.split(rng)
        if evaluate_validation is not None:
            rng, _ = jax.random.split(rng)
    return rng


def run_training_loop(
    *,
    train_state: TrainState,
    run_epoch: EpochRunner,
    evaluate_training: Evaluator | None,
    evaluate_validation: Evaluator | None,
    number_of_epochs: int,
    number_of_warm_up_epochs: int = 0,
    rng: jax.Array,
    log_directory: str | None = None,
    early_stopping_rounds: int = EARLY_STOPPING_ROUNDS,
    start_epoch: int = 0,
    verbose: bool = True,
    epoch_callback: Callable[[int, TrainState, dict], None] | None = None,
    async_checkpoints: bool = True,
    fetch_mode: str = "sync",
) -> TrainingResult:
    """Run epochs ``start_epoch → number_of_epochs`` (see module docstring).

    ``fetch_mode="deferred"`` pipelines the host side one epoch behind the
    device: epoch e+1 is dispatched (the runner only touches device
    handles) BEFORE epoch e's metrics are fetched and processed, so the
    per-fetch host↔device round trip — ~26 ms on a tunnelled chip, larger
    than a whole epoch at bench shapes — overlaps the next epoch's compute
    instead of stalling it.  Metric processing, checkpoint writes, NaN
    aborts, and early-stopping decisions each happen one epoch later than
    in "sync" mode (the curves themselves are identical); requires a
    ``run_epoch`` whose returned metrics are lazy device values, i.e. the
    device-resident runner."""
    if fetch_mode not in ("sync", "deferred"):
        raise ValueError(f"Unknown fetch_mode {fetch_mode!r}")
    if fetch_mode == "deferred":
        return _run_training_loop_deferred(
            train_state=train_state,
            run_epoch=run_epoch,
            evaluate_training=evaluate_training,
            evaluate_validation=evaluate_validation,
            number_of_epochs=number_of_epochs,
            number_of_warm_up_epochs=number_of_warm_up_epochs,
            rng=rng,
            log_directory=log_directory,
            early_stopping_rounds=early_stopping_rounds,
            start_epoch=start_epoch,
            verbose=verbose,
            epoch_callback=epoch_callback,
            async_checkpoints=async_checkpoints,
        )
    early = EarlyStopping(rounds=early_stopping_rounds)
    history: dict[str, dict[str, list[float]]] = {}

    if log_directory:
        # Rebuild early-stopping state from persisted validation curves on
        # resume (explicit JSON instead of event files; SURVEY.md §5.4).
        curves = checkpoints.load_learning_curves(log_directory)
        validation_curve = curves.get("validation", {}).get("lower_bound", [])
        for epoch, value in enumerate(validation_curve[:start_epoch]):
            early.update(value, epoch)
        history = {k: dict(v) for k, v in curves.items()} if curves else {}

    rng = _fast_forward_rng(
        rng, start_epoch, evaluate_training, evaluate_validation
    )

    stopped_early = False
    epoch = start_epoch
    for epoch in range(start_epoch, number_of_epochs):
        epoch_start = time.time()
        wuw = warm_up_weight(epoch, number_of_warm_up_epochs)

        rng, epoch_rng = jax.random.split(rng)
        train_state, train_metrics = run_epoch(
            train_state, epoch, wuw, epoch_rng
        )

        if not np.isfinite(train_metrics["lower_bound"]):
            raise ArithmeticError(
                f"The lower bound became NaN/inf at epoch {epoch + 1}."
            )

        epoch_metrics: dict[str, dict[str, float]] = {}
        if evaluate_training is not None:
            rng, sub = jax.random.split(rng)
            epoch_metrics["training"] = evaluate_training(train_state, sub)
        else:
            epoch_metrics["training"] = train_metrics
        if evaluate_validation is not None:
            rng, sub = jax.random.split(rng)
            epoch_metrics["validation"] = evaluate_validation(train_state, sub)

        # The callback runs before persistence so it may add metrics (the
        # GMVAE appends per-epoch cluster accuracies this way).
        if epoch_callback is not None:
            epoch_callback(epoch, train_state, epoch_metrics)

        # Vector-valued metrics (per-neuron KL) go to the array-series
        # store; only scalars enter the float learning curves.
        scalar_metrics: dict[str, dict[str, float]] = {}
        for kind, metrics in epoch_metrics.items():
            kind_history = history.setdefault(kind, {})
            kind_scalars: dict[str, float] = {}
            for name, value in metrics.items():
                if np.ndim(value) > 0:
                    if log_directory:
                        checkpoints.append_array_series(
                            log_directory, f"{name}-{kind}", value
                        )
                    continue
                kind_history.setdefault(name, []).append(float(value))
                kind_scalars[name] = float(value)
            scalar_metrics[kind] = kind_scalars

        if log_directory:
            checkpoints.append_learning_curves(log_directory, scalar_metrics)
            checkpoints.save_checkpoint(
                log_directory,
                train_state,
                epoch=epoch + 1,
                step=int(train_state.step),
                async_write=async_checkpoints,
            )

        if verbose:
            duration = format_duration(time.time() - epoch_start)
            pieces = [f"Epoch {epoch + 1}/{number_of_epochs} ({duration})"]
            pieces.append(
                "ELBO(train): {:.6g}".format(
                    epoch_metrics["training"]["lower_bound"]
                )
            )
            if "validation" in epoch_metrics:
                pieces.append(
                    "ELBO(valid): {:.6g}".format(
                        epoch_metrics["validation"]["lower_bound"]
                    )
                )
            print("  ".join(pieces))

        # Early stopping + best-model snapshots follow the validation bound.
        if "validation" in epoch_metrics:
            status = early.update(
                epoch_metrics["validation"]["lower_bound"], epoch
            )
            if log_directory:
                if status["start_degrading"]:
                    # snapshot the last non-degraded parameters
                    checkpoints.copy_checkpoint_version(
                        log_directory,
                        os.path.join(log_directory, "early_stopping"),
                        async_write=async_checkpoints,
                    )
                if status["improved"]:
                    checkpoints.copy_checkpoint_version(
                        log_directory,
                        os.path.join(log_directory, "best"),
                        async_write=async_checkpoints,
                    )
                    # an improvement invalidates any early-stopping snapshot
                    checkpoints.remove_checkpoint(
                        os.path.join(log_directory, "early_stopping"),
                        async_write=async_checkpoints,
                    )
            if status["stop"]:
                stopped_early = True
                if verbose:
                    print(
                        f"Stopping early: no validation improvement for "
                        f"{early_stopping_rounds} epochs."
                    )
                epoch += 1
                break
        elif log_directory:
            # No validation set: best == latest.
            checkpoints.copy_checkpoint_version(
                log_directory,
                os.path.join(log_directory, "best"),
                async_write=async_checkpoints,
            )
    else:
        epoch = number_of_epochs

    checkpoints.wait_for_pending_writes()

    if not tree_finite(train_state.params):
        raise ArithmeticError("Model parameters became non-finite.")

    return TrainingResult(
        train_state=train_state,
        number_of_epochs_trained=epoch,
        stopped_early=stopped_early,
        best_epoch=early.best_epoch,
        history=history,
    )


def _run_training_loop_deferred(
    *,
    train_state: TrainState,
    run_epoch: EpochRunner,
    evaluate_training: Evaluator | None,
    evaluate_validation: Evaluator | None,
    number_of_epochs: int,
    number_of_warm_up_epochs: int,
    rng: jax.Array,
    log_directory: str | None,
    early_stopping_rounds: int,
    start_epoch: int,
    verbose: bool,
    epoch_callback: Callable[[int, TrainState, dict], None] | None,
    async_checkpoints: bool,
) -> TrainingResult:
    """One-epoch-deep software pipeline over the device (see
    ``run_training_loop`` fetch_mode="deferred").  Epoch e+1 is dispatched
    before epoch e's metrics are touched on the host, so the fetch RTT
    rides under device compute; all host-side processing (curves,
    checkpoints, early stopping) trails the device by exactly one epoch
    and is identical to the sync loop otherwise."""
    early = EarlyStopping(rounds=early_stopping_rounds)
    history: dict[str, dict[str, list[float]]] = {}

    if log_directory:
        curves = checkpoints.load_learning_curves(log_directory)
        validation_curve = curves.get("validation", {}).get("lower_bound", [])
        for epoch, value in enumerate(validation_curve[:start_epoch]):
            early.update(value, epoch)
        history = {k: dict(v) for k, v in curves.items()} if curves else {}

    stopped_early = False
    epochs_processed = start_epoch

    def process(epoch, state, train_metrics, eval_rngs) -> bool:
        """Fetch + record one epoch's results; True → stop training."""
        nonlocal stopped_early, epochs_processed
        epoch_start = time.time()
        if not np.isfinite(float(train_metrics["lower_bound"])):
            raise ArithmeticError(
                f"The lower bound became NaN/inf at epoch {epoch + 1}."
            )
        epoch_metrics: dict[str, dict[str, float]] = {}
        sub_t, sub_v = eval_rngs
        if evaluate_training is not None:
            epoch_metrics["training"] = evaluate_training(state, sub_t)
        else:
            epoch_metrics["training"] = {
                k: float(v) if np.ndim(v) == 0 else np.asarray(v)
                for k, v in train_metrics.items()
            }
        if evaluate_validation is not None:
            epoch_metrics["validation"] = evaluate_validation(state, sub_v)

        if epoch_callback is not None:
            epoch_callback(epoch, state, epoch_metrics)

        scalar_metrics: dict[str, dict[str, float]] = {}
        for kind, metrics in epoch_metrics.items():
            kind_history = history.setdefault(kind, {})
            kind_scalars: dict[str, float] = {}
            for name, value in metrics.items():
                if np.ndim(value) > 0:
                    if log_directory:
                        checkpoints.append_array_series(
                            log_directory, f"{name}-{kind}", value
                        )
                    continue
                kind_history.setdefault(name, []).append(float(value))
                kind_scalars[name] = float(value)
            scalar_metrics[kind] = kind_scalars

        if log_directory:
            checkpoints.append_learning_curves(log_directory, scalar_metrics)
            checkpoints.save_checkpoint(
                log_directory, state, epoch=epoch + 1,
                step=int(state.step), async_write=async_checkpoints,
            )

        if verbose:
            duration = format_duration(time.time() - epoch_start)
            pieces = [f"Epoch {epoch + 1}/{number_of_epochs} ({duration})"]
            pieces.append("ELBO(train): {:.6g}".format(
                epoch_metrics["training"]["lower_bound"]))
            if "validation" in epoch_metrics:
                pieces.append("ELBO(valid): {:.6g}".format(
                    epoch_metrics["validation"]["lower_bound"]))
            print("  ".join(pieces))

        epochs_processed = epoch + 1
        if "validation" in epoch_metrics:
            status = early.update(
                epoch_metrics["validation"]["lower_bound"], epoch
            )
            if log_directory:
                if status["start_degrading"]:
                    checkpoints.copy_checkpoint_version(
                        log_directory,
                        os.path.join(log_directory, "early_stopping"),
                        async_write=async_checkpoints,
                    )
                if status["improved"]:
                    checkpoints.copy_checkpoint_version(
                        log_directory,
                        os.path.join(log_directory, "best"),
                        async_write=async_checkpoints,
                    )
                    checkpoints.remove_checkpoint(
                        os.path.join(log_directory, "early_stopping"),
                        async_write=async_checkpoints,
                    )
            if status["stop"]:
                stopped_early = True
                if verbose:
                    print(
                        f"Stopping early: no validation improvement for "
                        f"{early_stopping_rounds} epochs."
                    )
                return True
        elif log_directory:
            checkpoints.copy_checkpoint_version(
                log_directory,
                os.path.join(log_directory, "best"),
                async_write=async_checkpoints,
            )
        return False

    rng = _fast_forward_rng(
        rng, start_epoch, evaluate_training, evaluate_validation
    )

    pending = None  # (epoch, state, device_metrics, eval_rngs)
    final_state = train_state
    for epoch in range(start_epoch, number_of_epochs):
        wuw = warm_up_weight(epoch, number_of_warm_up_epochs)
        # consume the rng stream exactly like the sync loop so curves match
        rng, epoch_rng = jax.random.split(rng)
        sub_t = sub_v = None
        if evaluate_training is not None:
            rng, sub_t = jax.random.split(rng)
        if evaluate_validation is not None:
            rng, sub_v = jax.random.split(rng)
        train_state, train_metrics = run_epoch(
            train_state, epoch, wuw, epoch_rng
        )
        final_state = train_state
        if pending is not None and process(*pending):
            break
        pending = (epoch, train_state, train_metrics, (sub_t, sub_v))
    else:
        if pending is not None:
            process(*pending)
        pending = None
    if pending is not None:
        # early stop fired with one epoch already dispatched; record it
        # too (its work is done either way) unless training just stopped.
        pass

    checkpoints.wait_for_pending_writes()
    if not tree_finite(final_state.params):
        raise ArithmeticError("Model parameters became non-finite.")

    return TrainingResult(
        train_state=final_state,
        number_of_epochs_trained=epochs_processed,
        stopped_early=stopped_early,
        best_epoch=early.best_epoch,
        history=history,
    )


def resume_start_epoch(log_directory: str) -> int:
    """Epoch to resume from: explicit metadata, not filename parsing
    (reference parses ckpt filenames at ``variational_autoencoder.py:714-719``)."""
    checkpoints.wait_for_pending_writes()
    if checkpoints.checkpoint_exists(log_directory):
        return int(checkpoints.load_metadata(log_directory)["epoch"])
    return 0
