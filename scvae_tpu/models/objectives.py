"""Shared objective helpers: stable log-mean-exp, warm-up schedule,
early-stopping state machine.

Counterparts: ``scvae/models/utilities.py:129-137`` (``log_reduce_exp``),
``scvae/models/variational_autoencoder.py:979-983`` (linear KL warm-up),
``scvae/models/utilities.py:591-612`` (early-stopping status).
"""

from __future__ import annotations

import dataclasses
import math

import jax
import jax.numpy as jnp


def log_reduce_exp(x: jax.Array, axis: int = 0) -> jax.Array:
    """log(mean(exp(x), axis)) computed stably — the IW bound over the
    importance-sample axis."""
    x_max = jax.lax.stop_gradient(jnp.max(x, axis=axis, keepdims=True))
    out = jnp.log(jnp.mean(jnp.exp(x - x_max), axis=axis, keepdims=True)) + x_max
    return jnp.squeeze(out, axis=axis)


def warm_up_weight(epoch: int, number_of_warm_up_epochs: int) -> float:
    """Linear KL warm-up: ``min(epoch / W, 1)`` (0-indexed epoch)."""
    if number_of_warm_up_epochs:
        return float(min(epoch / number_of_warm_up_epochs, 1.0))
    return 1.0


@dataclasses.dataclass
class EarlyStopping:
    """Validation-ELBO early stopping with K degradation rounds.

    Matches the reference's status semantics
    (``scvae/models/utilities.py:591-612`` + training-loop use at
    ``variational_autoencoder.py:1384-1441``): training stops after
    ``rounds`` consecutive epochs without improvement over the best
    validation lower bound seen so far; the checkpoint snapshotted is the
    epoch *before* degradation began.
    """

    rounds: int = 10
    best: float = -math.inf
    epochs_without_improvement: int = 0
    stopped: bool = False
    best_epoch: int | None = None

    def update(self, metric: float, epoch: int) -> dict[str, bool]:
        """Returns {'improved': …, 'stop': …, 'start_degrading': …}."""
        improved = metric > self.best
        start_degrading = False
        if improved:
            self.best = metric
            self.best_epoch = epoch
            self.epochs_without_improvement = 0
        else:
            start_degrading = self.epochs_without_improvement == 0
            self.epochs_without_improvement += 1
        stop = self.epochs_without_improvement >= self.rounds
        if stop:
            self.stopped = True
        return {
            "improved": improved,
            "stop": stop,
            "start_degrading": start_degrading,
        }
