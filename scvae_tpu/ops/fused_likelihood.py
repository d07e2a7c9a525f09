"""Fused decoder-head + count-likelihood Pallas TPU kernels.

The training hot loop ends with per-parameter dense heads on the decoder
output followed by an elementwise log-likelihood and a feature-axis
reduction (reference ``scvae/models/variational_autoencoder.py:2466-2594``).
Left to XLA this materialises ``n_params`` × (M, F) activation arrays in
HBM for the forward pass and again for the backward.  These kernels fuse

    matmul heads → support clip/activation → log_prob(t) → row-sum

into one VMEM-resident pass (flash-attention-style: the backward
recomputes head activations per tile instead of storing them), cutting
HBM traffic from O(n_params·M·F) to O(M·(H+F)).

Supported likelihoods: Poisson (``log_lambda`` head) and negative binomial
(``p``-logit + ``log_r`` heads, TFP convention).  Semantics match the
registry: activations clipped to support ∓ float32 tiny with zero gradient
outside the clip range (``clip_by_value`` behaviour, reference
``:2480-2485``); NB ``log Γ`` terms via :mod:`scvae_tpu.ops.special`
(Mosaic has no lgamma/digamma primitive).

Interface: ``fused_log_likelihood(name, h, heads, t)`` → (M,) row-summed
log-likelihoods, differentiable w.r.t. ``h`` and every head kernel/bias.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from scvae_tpu.ops.special import digamma, lgamma

_TINY = float(np.finfo(np.float32).tiny)
_LOG_TINY = float(np.log(np.finfo(np.float32).tiny))  # ≈ −87.34

# Tile sizes: rows per program; the full feature axis stays resident.
_TM = 256

FUSED_LIKELIHOODS = ("poisson", "negative binomial")


def supports_fused_likelihood(name: str, k_max: int = 0) -> bool:
    return k_max == 0 and name in FUSED_LIKELIHOODS


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Elementwise likelihood pieces (shared between kernels and reference)
# --------------------------------------------------------------------------


def _poisson_ll(a_l, t):
    """log Poisson(t | exp(clip(a_l, ±10))) without the lgamma(1+t) term
    (constant w.r.t. parameters; added back by the caller)."""
    log_lam = jnp.clip(a_l, -10.0 + _TINY, 10.0 - _TINY)
    return t * log_lam - jnp.exp(log_lam)


def _poisson_grad(a_l, t):
    inside = jnp.logical_and(a_l > -10.0 + _TINY, a_l < 10.0 - _TINY)
    log_lam = jnp.clip(a_l, -10.0 + _TINY, 10.0 - _TINY)
    return jnp.where(inside, t - jnp.exp(log_lam), 0.0)


def _nb_ll(a_p, a_r, t):
    """log NB(t | p=clip(σ(a_p)), r=exp(clip(a_r, ±10))) without the
    −lgamma(1+t) constant."""
    p = jnp.clip(jax.nn.sigmoid(a_p), _TINY, 1.0 - _TINY)
    log_r = jnp.clip(a_r, -10.0 + _TINY, 10.0 - _TINY)
    r = jnp.exp(log_r)
    return (
        lgamma(t + r)
        - lgamma(r)
        + r * jnp.log1p(-p)
        + t * jnp.log(p)
    )


def _nb_grads(a_p, a_r, t):
    p = jnp.clip(jax.nn.sigmoid(a_p), _TINY, 1.0 - _TINY)
    log_r = jnp.clip(a_r, -10.0 + _TINY, 10.0 - _TINY)
    r = jnp.exp(log_r)
    # d ll / d a_p — through p = σ(a_p): (t/p − r/(1−p)) · p(1−p)
    #             = t(1−p) − r p   (exact when unclipped)
    p_inside = jnp.logical_and(
        jax.nn.sigmoid(a_p) > _TINY, jax.nn.sigmoid(a_p) < 1.0 - _TINY
    )
    g_p = jnp.where(p_inside, t * (1.0 - p) - r * p, 0.0)
    # d ll / d a_r — through r = exp(a_r):
    # r · (ψ(t+r) − ψ(r) + log1p(−p))
    r_inside = jnp.logical_and(a_r > -10.0 + _TINY, a_r < 10.0 - _TINY)
    g_r = jnp.where(
        r_inside,
        r * (digamma(t + r) - digamma(r) + jnp.log1p(-p)),
        0.0,
    )
    return g_p, g_r


# --------------------------------------------------------------------------
# jnp reference implementations (tested against the distribution library)
# --------------------------------------------------------------------------


def reference_log_likelihood(name, h, heads, t):
    """Unfused jnp computation of the same quantity (used for parity tests
    and as the fallback on non-TPU backends)."""
    if name == "poisson":
        a_l = h @ heads["log_lambda"]["kernel"] + heads["log_lambda"]["bias"]
        ll = _poisson_ll(a_l, t) - lgamma(1.0 + t)
    elif name == "negative binomial":
        a_p = h @ heads["p"]["kernel"] + heads["p"]["bias"]
        a_r = h @ heads["log_r"]["kernel"] + heads["log_r"]["bias"]
        ll = _nb_ll(a_p, a_r, t) - lgamma(1.0 + t)
    else:
        raise ValueError(f"No fused likelihood for {name!r}")
    return jnp.sum(ll, axis=-1)


# --------------------------------------------------------------------------
# Pallas kernels — negative binomial
# --------------------------------------------------------------------------


def _nb_forward_kernel(h_ref, wp_ref, bp_ref, wr_ref, br_ref, t_ref, o_ref):
    h = h_ref[:]
    a_p = (
        jnp.dot(h, wp_ref[:], preferred_element_type=jnp.float32)
        + bp_ref[:]
    )
    a_r = (
        jnp.dot(h, wr_ref[:], preferred_element_type=jnp.float32)
        + br_ref[:]
    )
    t = t_ref[:]
    ll = _nb_ll(a_p, a_r, t) - lgamma(1.0 + t)
    o_ref[:] = jnp.sum(ll, axis=1, keepdims=True)


def _nb_backward_kernel(
    g_ref, h_ref, wp_ref, bp_ref, wr_ref, br_ref, t_ref,
    dh_ref, dwp_ref, dbp_ref, dwr_ref, dbr_ref,
):
    i = pl.program_id(0)
    h = h_ref[:]
    a_p = (
        jnp.dot(h, wp_ref[:], preferred_element_type=jnp.float32)
        + bp_ref[:]
    )
    a_r = (
        jnp.dot(h, wr_ref[:], preferred_element_type=jnp.float32)
        + br_ref[:]
    )
    g_p, g_r = _nb_grads(a_p, a_r, t_ref[:])
    g = g_ref[:]  # (TM, 1) row cotangents
    g_p = g_p * g
    g_r = g_r * g

    dh_ref[:] = jnp.dot(
        g_p, wp_ref[:].T, preferred_element_type=jnp.float32
    ) + jnp.dot(g_r, wr_ref[:].T, preferred_element_type=jnp.float32)

    dwp = jnp.dot(h.T, g_p, preferred_element_type=jnp.float32)
    dwr = jnp.dot(h.T, g_r, preferred_element_type=jnp.float32)
    dbp = jnp.sum(g_p, axis=0, keepdims=True)
    dbr = jnp.sum(g_r, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dwp_ref[:] = dwp
        dwr_ref[:] = dwr
        dbp_ref[:] = dbp
        dbr_ref[:] = dbr

    @pl.when(i > 0)
    def _accumulate():
        dwp_ref[:] += dwp
        dwr_ref[:] += dwr
        dbp_ref[:] += dbp
        dbr_ref[:] += dbr


def _pad_rows(x, m_padded):
    pad = m_padded - x.shape[0]
    if pad:
        return jnp.pad(x, ((0, pad), (0, 0)))
    return x


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def _fused_nb(h, wp, bp, wr, br, t):
    out, _ = _fused_nb_fwd(h, wp, bp, wr, br, t)
    return out


def _nb_call_forward(h, wp, bp, wr, br, t):
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_rows(t, m_padded)
    grid = (m_padded // _TM,)
    out = pl.pallas_call(
        _nb_forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_padded, 1), jnp.float32),
    )(h_p, wp, bp.reshape(1, f), wr, br.reshape(1, f), t_p)
    return out[:m, 0]


def _fused_nb_fwd(h, wp, bp, wr, br, t):
    out = _nb_call_forward(h, wp, bp, wr, br, t)
    return out, (h, wp, bp, wr, br, t)


def _fused_nb_bwd(residuals, g):
    h, wp, bp, wr, br, t = residuals
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_rows(t, m_padded)
    g_p = _pad_rows(g.reshape(m, 1), m_padded)
    grid = (m_padded // _TM,)
    dh, dwp, dbp, dwr, dbr = pl.pallas_call(
        _nb_backward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_padded, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
            jax.ShapeDtypeStruct((hidden, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
    )(g_p, h_p, wp, bp.reshape(1, f), wr, br.reshape(1, f), t_p)
    return (
        dh[:m],
        dwp,
        dbp.reshape(f),
        dwr,
        dbr.reshape(f),
        jnp.zeros_like(t),
    )


_fused_nb.defvjp(_fused_nb_fwd, _fused_nb_bwd)


# --------------------------------------------------------------------------
# Pallas kernels — Poisson
# --------------------------------------------------------------------------


def _poisson_forward_kernel(h_ref, wl_ref, bl_ref, t_ref, o_ref):
    a_l = (
        jnp.dot(h_ref[:], wl_ref[:], preferred_element_type=jnp.float32)
        + bl_ref[:]
    )
    t = t_ref[:]
    ll = _poisson_ll(a_l, t) - lgamma(1.0 + t)
    o_ref[:] = jnp.sum(ll, axis=1, keepdims=True)


def _poisson_backward_kernel(
    g_ref, h_ref, wl_ref, bl_ref, t_ref, dh_ref, dwl_ref, dbl_ref
):
    i = pl.program_id(0)
    h = h_ref[:]
    a_l = (
        jnp.dot(h, wl_ref[:], preferred_element_type=jnp.float32)
        + bl_ref[:]
    )
    g_l = _poisson_grad(a_l, t_ref[:]) * g_ref[:]
    dh_ref[:] = jnp.dot(g_l, wl_ref[:].T, preferred_element_type=jnp.float32)
    dwl = jnp.dot(h.T, g_l, preferred_element_type=jnp.float32)
    dbl = jnp.sum(g_l, axis=0, keepdims=True)

    @pl.when(i == 0)
    def _init():
        dwl_ref[:] = dwl
        dbl_ref[:] = dbl

    @pl.when(i > 0)
    def _accumulate():
        dwl_ref[:] += dwl
        dbl_ref[:] += dbl


@jax.custom_vjp
def _fused_poisson(h, wl, bl, t):
    out, _ = _fused_poisson_fwd(h, wl, bl, t)
    return out


def _fused_poisson_fwd(h, wl, bl, t):
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_rows(t, m_padded)
    grid = (m_padded // _TM,)
    out = pl.pallas_call(
        _poisson_forward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_padded, 1), jnp.float32),
    )(h_p, wl, bl.reshape(1, f), t_p)
    return out[:m, 0], (h, wl, bl, t)


def _fused_poisson_bwd(residuals, g):
    h, wl, bl, t = residuals
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_rows(t, m_padded)
    g_p = _pad_rows(g.reshape(m, 1), m_padded)
    grid = (m_padded // _TM,)
    dh, dwl, dbl = pl.pallas_call(
        _poisson_backward_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, f), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, hidden), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, f), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_padded, hidden), jnp.float32),
            jax.ShapeDtypeStruct((hidden, f), jnp.float32),
            jax.ShapeDtypeStruct((1, f), jnp.float32),
        ],
    )(g_p, h_p, wl, bl.reshape(1, f), t_p)
    return dh[:m], dwl, dbl.reshape(f), jnp.zeros_like(t)


_fused_poisson.defvjp(_fused_poisson_fwd, _fused_poisson_bwd)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


def fused_log_likelihood(
    name: str,
    h: jax.Array,
    heads: dict[str, dict[str, jax.Array]],
    t: jax.Array,
) -> jax.Array:
    """Row-summed log p(t | heads(h)) with the fused Pallas path.

    ``h``: (..., H) decoder output; ``t``: (..., F) targets broadcastable
    against the leading axes of ``h``; heads: {param: {kernel, bias}}.
    Returns (...,) log-likelihood sums.
    """
    lead_shape = h.shape[:-1]
    hidden = h.shape[-1]
    f = t.shape[-1]
    h2 = h.reshape(-1, hidden)
    t2 = jnp.broadcast_to(t, lead_shape + (f,)).reshape(-1, f)
    if name == "poisson":
        head = heads["log_lambda"]
        out = _fused_poisson(h2, head["kernel"], head["bias"], t2)
    elif name == "negative binomial":
        out = _fused_nb(
            h2,
            heads["p"]["kernel"],
            heads["p"]["bias"],
            heads["log_r"]["kernel"],
            heads["log_r"]["bias"],
            t2,
        )
    else:
        raise ValueError(f"No fused likelihood for {name!r}")
    return out.reshape(lead_shape)
