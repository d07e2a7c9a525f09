"""Pure-functional dense networks (encoder/decoder MLPs).

TPU-native counterpart of the reference's ``dense_layer``/``dense_layers``
(``scvae/models/utilities.py:38-126``): dropout → linear → batch-norm →
activation, with batch-norm configured like TF1 ``contrib.layers.batch_norm``
(center=True, scale=False, decay=0.999, eps=1e-3).  Instead of TF variable
scopes, parameters and batch-norm running statistics are explicit pytrees,
so the same apply function works under ``jit``/``pjit``/``vmap`` (the GMVAE
reuses one parameter set across clusters by vmapping over the cluster axis
rather than ``reuse=True`` subgraphs).

Batch statistics are computed with ``jnp.mean`` over the batch axes; under
a data-parallel mesh XLA turns these into global-mean collectives
automatically, so multi-chip batch norm matches single-chip semantics.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp

Params = dict[str, Any]
State = dict[str, Any]

BN_DECAY = 0.999
BN_EPS = 1e-3


def glorot_uniform(rng: jax.Array, shape: tuple[int, int]) -> jax.Array:
    """Xavier/Glorot uniform — TF1 ``fully_connected`` default initialiser."""
    fan_in, fan_out = shape
    limit = jnp.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(
        rng, shape, jnp.float32, minval=-limit, maxval=limit
    )


def init_dense(rng: jax.Array, in_dim: int, out_dim: int) -> Params:
    return {
        "kernel": glorot_uniform(rng, (in_dim, out_dim)),
        "bias": jnp.zeros((out_dim,), jnp.float32),
    }


def apply_dense(
    params: Params, x: jax.Array, *, compute_dtype=None
) -> jax.Array:
    """Dense layer.  With ``compute_dtype`` (e.g. ``jnp.bfloat16``) the
    matmul inputs are cast down while accumulation stays float32
    (``preferred_element_type``) — the TPU MXU's native mixed-precision
    mode; parameters, bias add, and everything downstream remain f32."""
    kernel = params["kernel"]
    if compute_dtype is not None and kernel.dtype != compute_dtype:
        y = jnp.matmul(
            x.astype(compute_dtype),
            kernel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        y = jnp.matmul(x, kernel)
    return y + params["bias"]


def init_categorised_head(
    rng: jax.Array, in_dim: int, feature_size: int, k_max: int
) -> Params:
    """(K+1)-class logit heads for the piecewise-categorical likelihood.

    Drawn as ONE glorot dense layer of ``feature_size · (K+1)`` outputs to
    match the reference's single wide head (fan-out and therefore init
    scale, ``scvae/models/variational_autoencoder.py:2507-2527``), then
    stored class-major as kernel (K+1, in_dim, F) / bias (K+1, F) so each
    class block is a contiguous matrix the fused Pallas kernel tiles
    directly."""
    wide = glorot_uniform(rng, (in_dim, feature_size * (k_max + 1)))
    kernel = wide.reshape(in_dim, feature_size, k_max + 1).transpose(2, 0, 1)
    return {
        "kernel": kernel,
        "bias": jnp.zeros((k_max + 1, feature_size), jnp.float32),
    }


def apply_categorised_logits(
    params: Params, h: jax.Array, *, compute_dtype=None
) -> jax.Array:
    """Class logits (..., F, K+1) from decoder output ``h`` (..., H)."""
    kernel = params["kernel"]  # (K+1, H, F)
    bias = params["bias"]  # (K+1, F)
    if compute_dtype is not None and kernel.dtype != compute_dtype:
        logits = jnp.einsum(
            "...h,khf->...fk",
            h.astype(compute_dtype),
            kernel.astype(compute_dtype),
            preferred_element_type=jnp.float32,
        )
    else:
        logits = jnp.einsum("...h,khf->...fk", h, kernel)
    return logits + bias.T


def init_batch_norm(dim: int) -> tuple[Params, State]:
    params = {"beta": jnp.zeros((dim,), jnp.float32)}  # center=True, scale=False
    state = {
        "mean": jnp.zeros((dim,), jnp.float32),
        "var": jnp.ones((dim,), jnp.float32),
    }
    return params, state


def apply_batch_norm(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    training: bool,
) -> tuple[jax.Array, State]:
    """Normalise over all leading axes; returns (output, new_state)."""
    if training:
        axes = tuple(range(x.ndim - 1))
        mean = jnp.mean(x, axis=axes)
        var = jnp.var(x, axis=axes)
        new_state = {
            "mean": BN_DECAY * state["mean"] + (1.0 - BN_DECAY) * mean,
            "var": BN_DECAY * state["var"] + (1.0 - BN_DECAY) * var,
        }
    else:
        mean, var = state["mean"], state["var"]
        new_state = state
    y = (x - mean) * jax.lax.rsqrt(var + BN_EPS) + params["beta"]
    return y, new_state


def dropout(rng: jax.Array, x: jax.Array, keep_prob: float) -> jax.Array:
    """Inverted dropout with the reference's keep-probability convention."""
    if keep_prob >= 1.0 or keep_prob <= 0.0:
        return x
    mask = jax.random.bernoulli(rng, keep_prob, x.shape)
    return jnp.where(mask, x / keep_prob, 0.0)


def init_mlp(
    rng: jax.Array,
    in_dim: int,
    hidden_sizes: Sequence[int],
    *,
    batch_norm: bool,
) -> tuple[Params, State]:
    layers = []
    bn_params, bn_state = [], []
    dim = in_dim
    for size in hidden_sizes:
        rng, sub = jax.random.split(rng)
        layers.append(init_dense(sub, dim, size))
        if batch_norm:
            p, s = init_batch_norm(size)
            bn_params.append(p)
            bn_state.append(s)
        dim = size
    params: Params = {"layers": layers}
    state: State = {}
    if batch_norm:
        params["batch_norm"] = bn_params
        state["batch_norm"] = bn_state
    return params, state


def apply_mlp(
    params: Params,
    state: State,
    x: jax.Array,
    *,
    training: bool,
    rng: jax.Array | None = None,
    activation: Callable[[jax.Array], jax.Array] = jax.nn.relu,
    input_dropout_keep_prob: float = 1.0,
    hidden_dropout_keep_prob: float = 1.0,
    compute_dtype=None,
) -> tuple[jax.Array, State]:
    """Dropout → dense → batch-norm → activation per layer, like the
    reference's ``dense_layers`` stacking (``scvae/models/utilities.py:81-126``)."""
    use_bn = "batch_norm" in params
    new_bn_states = []
    h = x
    for i, layer in enumerate(params["layers"]):
        keep = input_dropout_keep_prob if i == 0 else hidden_dropout_keep_prob
        if training and rng is not None and keep < 1.0:
            rng, sub = jax.random.split(rng)
            h = dropout(sub, h, keep)
        h = apply_dense(layer, h, compute_dtype=compute_dtype)
        if use_bn:
            h, bn_s = apply_batch_norm(
                params["batch_norm"][i],
                state["batch_norm"][i],
                h,
                training=training,
            )
            new_bn_states.append(bn_s)
        h = activation(h)
    new_state: State = {}
    if use_bn:
        new_state["batch_norm"] = new_bn_states
    return h, new_state


def apply_mlp_from_first_preactivation(
    params: Params,
    state: State,
    pre0: jax.Array,
    *,
    training: bool,
    rng: jax.Array | None = None,
    activation: Callable[[jax.Array], jax.Array] = jax.nn.relu,
    hidden_dropout_keep_prob: float = 1.0,
    compute_dtype=None,
) -> tuple[jax.Array, State]:
    """Finish an MLP given the FIRST layer's pre-activation ``pre0``.

    Used for inputs of the form concat(x, c) where ``x`` is shared across a
    vmapped axis and only ``c`` varies (the GMVAE's per-cluster one-hot
    codes):  concat(x, c) @ W  ==  x @ W[:F] + c @ W[F:],  so the caller
    computes the expensive x-part once and passes
    ``pre0 = x @ W[:F] + b + W[F + k]`` per cluster — exactly equal to the
    plain path, with the dominant (B, F)·(F, H) matmul done once instead of
    K times.  Not applicable when input dropout is active (the mask on x
    must be drawn per cluster); callers fall back to :func:`apply_mlp`.
    """
    use_bn = "batch_norm" in params
    new_bn_states = []
    h = pre0
    for i, layer in enumerate(params["layers"]):
        if i > 0:
            if (
                training
                and rng is not None
                and hidden_dropout_keep_prob < 1.0
            ):
                rng, sub = jax.random.split(rng)
                h = dropout(sub, h, hidden_dropout_keep_prob)
            h = apply_dense(layer, h, compute_dtype=compute_dtype)
        if use_bn:
            h, bn_s = apply_batch_norm(
                params["batch_norm"][i],
                state["batch_norm"][i],
                h,
                training=training,
            )
            new_bn_states.append(bn_s)
        h = activation(h)
    new_state: State = {}
    if use_bn:
        new_state["batch_norm"] = new_bn_states
    return h, new_state
