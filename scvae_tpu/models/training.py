"""Training harness: the epoch loop around the jitted train step.

Counterpart of the reference's 1000-line ``train`` methods
(``scvae/models/variational_autoencoder.py:640-1599``): epoch loop with
linear KL warm-up, shuffled minibatches from the host pipeline, NaN aborts,
per-epoch train/validation evaluation, early stopping (rounds=10) with an
``early_stopping/`` snapshot of the epoch before degradation, per-epoch
checkpointing with a ``best/`` copy on validation improvement, learning-
curve persistence, and checkpoint resume with explicit epoch metadata.
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
    scalar_keys: Iterable[str] = (
        "lower_bound",
        "reconstruction_error",
        "kl_divergence",
    ),
) -> dict[str, float]:
    """Batched full-pass evaluation, size-weighted like the reference's
    accumulation loops (``variational_autoencoder.py:2016-2055``)."""
    totals = {k: 0.0 for k in scalar_keys}
    n_total = 0
    for batch in pipeline.epoch():
        rng, sub = jax.random.split(rng)
        metrics = eval_step(train_state.params, train_state.model_state, batch, sub)
        b = int(np.shape(batch["t"])[0])
        for k in totals:
            totals[k] += float(metrics[k]) * b
        n_total += b
    if n_total == 0:
        return {k: float("nan") for k in scalar_keys}
    return {k: v / n_total for k, v in totals.items()}


def run_training_loop(
    *,
    train_state: TrainState,
    train_step: Callable,
    eval_step: Callable,
    make_training_pipeline: Callable[[int], Any],
    make_validation_pipeline: Callable[[], Any] | None,
    number_of_epochs: int,
    number_of_warm_up_epochs: int = 0,
    rng: jax.Array,
    log_directory: str | None = None,
    early_stopping_rounds: int = EARLY_STOPPING_ROUNDS,
    start_epoch: int = 0,
    full_train_evaluation: bool = True,
    verbose: bool = True,
    epoch_callback: Callable[[int, TrainState, dict], None] | None = None,
) -> TrainingResult:
    """Run epochs ``start_epoch → number_of_epochs``.

    ``make_training_pipeline(epoch)`` returns a fresh batch pipeline per
    epoch (this is where per-epoch noisy re-preprocessing happens, as in
    ``variational_autoencoder.py:960-975``).
    """
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

    stopped_early = False
    epoch = start_epoch
    for epoch in range(start_epoch, number_of_epochs):
        epoch_start = time.time()
        wuw = warm_up_weight(epoch, number_of_warm_up_epochs)

        pipeline = make_training_pipeline(epoch)
        batch_metrics: list[dict[str, float]] = []
        for batch in pipeline.epoch():
            rng, sub = jax.random.split(rng)
            train_state, metrics = train_step(train_state, batch, sub, wuw)
            batch_metrics.append(
                {
                    "lower_bound": float(metrics["lower_bound"]),
                    "loss": float(metrics["loss"]),
                }
            )

        mean_train_bound = float(
            np.mean([m["lower_bound"] for m in batch_metrics])
        )
        if not np.isfinite(mean_train_bound):
            raise ArithmeticError(
                f"The lower bound for the last batch became NaN/inf at "
                f"epoch {epoch + 1}."
            )

        epoch_metrics: dict[str, dict[str, float]] = {}

        if full_train_evaluation:
            rng, sub = jax.random.split(rng)
            epoch_metrics["training"] = evaluate_on_pipeline(
                eval_step, train_state, make_training_pipeline(epoch), sub
            )
        else:
            epoch_metrics["training"] = {"lower_bound": mean_train_bound}

        if make_validation_pipeline is not None:
            rng, sub = jax.random.split(rng)
            epoch_metrics["validation"] = evaluate_on_pipeline(
                eval_step, train_state, make_validation_pipeline(), sub
            )

        for kind, metrics in epoch_metrics.items():
            kind_history = history.setdefault(kind, {})
            for name, value in metrics.items():
                kind_history.setdefault(name, []).append(value)

        if log_directory:
            checkpoints.append_learning_curves(log_directory, epoch_metrics)
            checkpoints.save_checkpoint(
                log_directory,
                train_state,
                epoch=epoch + 1,
                step=int(train_state.step),
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

        if epoch_callback is not None:
            epoch_callback(epoch, train_state, epoch_metrics)

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
                    )
                if status["improved"]:
                    checkpoints.copy_checkpoint_version(
                        log_directory, os.path.join(log_directory, "best")
                    )
                    # an improvement invalidates any early-stopping snapshot
                    checkpoints.remove_checkpoint(
                        os.path.join(log_directory, "early_stopping")
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
                log_directory, os.path.join(log_directory, "best")
            )
    else:
        epoch = number_of_epochs

    if not tree_finite(train_state.params):
        raise ArithmeticError("Model parameters became non-finite.")

    return TrainingResult(
        train_state=train_state,
        number_of_epochs_trained=epoch,
        stopped_early=stopped_early,
        best_epoch=early.best_epoch,
        history=history,
    )


def resume_start_epoch(log_directory: str) -> int:
    """Epoch to resume from: explicit metadata, not filename parsing
    (reference parses ckpt filenames at ``variational_autoencoder.py:714-719``)."""
    if checkpoints.checkpoint_exists(log_directory):
        return int(checkpoints.load_metadata(log_directory)["epoch"])
    return 0
