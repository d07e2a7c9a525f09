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
    if jit:
        return jax.jit(eval_fn)
    return eval_fn


def tree_finite(tree: Any) -> jax.Array:
    """True iff every leaf is finite — the NaN-abort check the reference
    does on the host (``variational_autoencoder.py:1041-1044``)."""
    leaves = jax.tree_util.tree_leaves(tree)
    oks = [jnp.all(jnp.isfinite(leaf)) for leaf in leaves]
    return functools.reduce(jnp.logical_and, oks, jnp.asarray(True))
