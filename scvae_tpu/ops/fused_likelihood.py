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

Tiling: 2-D grids over (rows, features).  The forward accumulates the
row-sum over feature tiles; the backward makes rows the minor grid axis
so each dW tile stays VMEM-resident across the whole row loop while dh
tiles accumulate across feature tiles.  Tile sizes keep the per-program
VMEM footprint well under the ~16 MB budget.

Supported likelihoods: Poisson (``log_lambda`` head), negative binomial
(``p``-logit + ``log_r`` heads, TFP convention), zero-inflated Poisson /
negative binomial (extra ``pi`` mixture head; mixture semantics from
``distributions/zero_inflated.py``), and constrained Poisson (softmax
``lambda`` head × per-cell count sum — the gene-axis softmax couples
feature tiles, so its kernel carries an online logsumexp across the
feature-tile loop).  Semantics match the registry: activations clipped to
support ∓ float32 tiny with zero gradient outside the clip range
(``clip_by_value`` behaviour, reference ``:2480-2485``); NB ``log Γ``
terms via :mod:`scvae_tpu.ops.special` (Mosaic has no lgamma/digamma
primitive).  Deviation: the fused constrained Poisson evaluates
``t·(a − lse + log n)`` directly instead of clipping the softmax output to
float32-tiny, so it stays finite where the registry path's softmax would
underflow.

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
# Nearest representable float32 strictly inside the support bounds (the
# reference's ``bound ∓ tiny`` rounds back to the bound — see
# ParameterSpec.constrain).
_P_HI = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
_L_LO = float(np.nextafter(np.float32(-10.0), np.float32(np.inf)))
_L_HI = float(np.nextafter(np.float32(10.0), np.float32(-np.inf)))

# Row / feature tile sizes.
_TM = 256
_TF = 512

FUSED_LIKELIHOODS = (
    "poisson",
    "negative binomial",
    "zero-inflated poisson",
    "zero-inflated negative binomial",
    "constrained poisson",
)

# Bases that compose with the piecewise-categorical wrapper (reference
# ``distributions/categorised.py:251-260``): the (K+1)-class logit heads
# become K+1 extra fused heads, so the (B, F, K+1) logits tensor never
# reaches HBM.  Constrained Poisson is excluded (the reference's
# cross-parameter validation forbids the combination,
# ``models/utilities.py:850-897``).
CATEGORISED_BASES = (
    "poisson",
    "negative binomial",
    "zero-inflated poisson",
    "zero-inflated negative binomial",
)
# VMEM cap: K+1 categorical heads + base heads all hold a weight tile and
# an activation tile per program; beyond this many total heads the tile
# sizes needed would stall the MXU, so fall back to the XLA path.
_MAX_FUSED_HEADS = 32


def supports_fused_likelihood(name: str, k_max: int = 0) -> bool:
    if k_max == 0:
        return name in FUSED_LIKELIHOODS
    return (
        name in CATEGORISED_BASES
        and k_max + 1 + len(_BASE_HEADS[name]) <= _MAX_FUSED_HEADS
    )


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# --------------------------------------------------------------------------
# Elementwise likelihood pieces (shared between kernels and reference)
# --------------------------------------------------------------------------


def _poisson_ll(a_l, t):
    """log Poisson(t | exp(clip(a_l, ±10))) without the −lgamma(1+t) term
    (added by the caller; kept out of the gradient path)."""
    log_lam = jnp.clip(a_l, _L_LO, _L_HI)
    return t * log_lam - jnp.exp(log_lam)


def _poisson_grad(a_l, t):
    inside = jnp.logical_and(a_l > _L_LO, a_l < _L_HI)
    log_lam = jnp.clip(a_l, _L_LO, _L_HI)
    return jnp.where(inside, t - jnp.exp(log_lam), 0.0)


def _nb_ll(a_p, a_r, t):
    """log NB(t | p=clip(σ(a_p)), r=exp(clip(a_r, ±10))) without the
    −lgamma(1+t) constant."""
    p = jnp.clip(jax.nn.sigmoid(a_p), _TINY, _P_HI)
    log_r = jnp.clip(a_r, _L_LO, _L_HI)
    r = jnp.exp(log_r)
    return lgamma(t + r) - lgamma(r) + r * jnp.log1p(-p) + t * jnp.log(p)


def _nb_grads(a_p, a_r, t):
    p = jnp.clip(jax.nn.sigmoid(a_p), _TINY, _P_HI)
    log_r = jnp.clip(a_r, _L_LO, _L_HI)
    r = jnp.exp(log_r)
    # d ll / d a_p through p = σ(a_p): (t/p − r/(1−p))·p(1−p) = t(1−p) − r·p
    p_raw = jax.nn.sigmoid(a_p)
    p_inside = jnp.logical_and(p_raw > _TINY, p_raw < _P_HI)
    g_p = jnp.where(p_inside, t * (1.0 - p) - r * p, 0.0)
    # d ll / d a_r through r = exp(a_r): r·(ψ(t+r) − ψ(r) + log1p(−p))
    r_inside = jnp.logical_and(a_r > _L_LO, a_r < _L_HI)
    g_r = jnp.where(
        r_inside, r * (digamma(t + r) - digamma(r) + jnp.log1p(-p)), 0.0
    )
    return g_p, g_r


def _zip_ll(a_pi, a_l, t):
    """log ZIP(t | π=clip(σ(a_pi)), λ=exp(clip(a_l, ±10))) without the
    −lgamma(1+t) constant (zero at t=0, so adding it unconditionally is
    exact; mixture semantics from distributions/zero_inflated.py)."""
    pi = jnp.clip(jax.nn.sigmoid(a_pi), _TINY, _P_HI)
    log_lam = jnp.clip(a_l, _L_LO, _L_HI)
    lam = jnp.exp(log_lam)
    log_pi = jnp.log(pi)
    log1m_pi = jnp.log1p(-pi)
    y_pos = log1m_pi + t * log_lam - lam
    y_zero = jnp.logaddexp(log_pi, log1m_pi - lam)
    return jnp.where(t > 0, y_pos, y_zero)


def _zip_grads(a_pi, a_l, t):
    pi_raw = jax.nn.sigmoid(a_pi)
    pi = jnp.clip(pi_raw, _TINY, _P_HI)
    log_lam = jnp.clip(a_l, _L_LO, _L_HI)
    lam = jnp.exp(log_lam)
    # t = 0 branch: S = π + (1−π)e^{−λ}; log S via logaddexp.
    log_s = jnp.logaddexp(jnp.log(pi), jnp.log1p(-pi) - lam)
    inv_s = jnp.exp(-log_s)
    elam_over_s = jnp.exp(-lam - log_s)
    g_pi_zero = pi * (1.0 - pi) * (inv_s - elam_over_s)
    g_l_zero = -lam * (1.0 - pi) * elam_over_s
    # t > 0 branch (dσ/da = π(1−π)): −π; t − λ.
    g_pi_pos = -pi
    g_l_pos = t - lam
    pos = t > 0
    pi_inside = jnp.logical_and(pi_raw > _TINY, pi_raw < _P_HI)
    l_inside = jnp.logical_and(a_l > _L_LO, a_l < _L_HI)
    g_pi = jnp.where(pi_inside, jnp.where(pos, g_pi_pos, g_pi_zero), 0.0)
    g_l = jnp.where(l_inside, jnp.where(pos, g_l_pos, g_l_zero), 0.0)
    return g_pi, g_l


def _zinb_ll(a_pi, a_p, a_r, t):
    """log ZINB(t) without the −lgamma(1+t) constant; base NB in the TFP
    convention (successes before r failures)."""
    pi = jnp.clip(jax.nn.sigmoid(a_pi), _TINY, _P_HI)
    p = jnp.clip(jax.nn.sigmoid(a_p), _TINY, _P_HI)
    log_r = jnp.clip(a_r, _L_LO, _L_HI)
    r = jnp.exp(log_r)
    log_pi = jnp.log(pi)
    log1m_pi = jnp.log1p(-pi)
    nb_pos = lgamma(t + r) - lgamma(r) + r * jnp.log1p(-p) + t * jnp.log(p)
    y_pos = log1m_pi + nb_pos
    # NB(0) = (1−p)^r → log = r·log1p(−p)
    y_zero = jnp.logaddexp(log_pi, log1m_pi + r * jnp.log1p(-p))
    return jnp.where(t > 0, y_pos, y_zero)


def _zinb_grads(a_pi, a_p, a_r, t):
    pi_raw = jax.nn.sigmoid(a_pi)
    p_raw = jax.nn.sigmoid(a_p)
    pi = jnp.clip(pi_raw, _TINY, _P_HI)
    p = jnp.clip(p_raw, _TINY, _P_HI)
    log_r = jnp.clip(a_r, _L_LO, _L_HI)
    r = jnp.exp(log_r)
    log1m_p = jnp.log1p(-p)
    # t = 0 branch: S = π + (1−π)(1−p)^r; q0 = (1−p)^r.
    log_q0 = r * log1m_p
    log_s = jnp.logaddexp(jnp.log(pi), jnp.log1p(-pi) + log_q0)
    inv_s = jnp.exp(-log_s)
    q0_over_s = jnp.exp(log_q0 - log_s)
    one_m_pi = 1.0 - pi
    g_pi_zero = pi * one_m_pi * (inv_s - q0_over_s)
    g_p_zero = -one_m_pi * r * p * q0_over_s
    g_r_zero = one_m_pi * r * log1m_p * q0_over_s
    # t > 0 branch.
    g_pi_pos = -pi
    g_p_pos = t * (1.0 - p) - r * p
    g_r_pos = r * (digamma(t + r) - digamma(r) + log1m_p)
    pos = t > 0
    pi_inside = jnp.logical_and(pi_raw > _TINY, pi_raw < _P_HI)
    p_inside = jnp.logical_and(p_raw > _TINY, p_raw < _P_HI)
    r_inside = jnp.logical_and(a_r > _L_LO, a_r < _L_HI)
    g_pi = jnp.where(pi_inside, jnp.where(pos, g_pi_pos, g_pi_zero), 0.0)
    g_p = jnp.where(p_inside, jnp.where(pos, g_p_pos, g_p_zero), 0.0)
    g_r = jnp.where(r_inside, jnp.where(pos, g_r_pos, g_r_zero), 0.0)
    return g_pi, g_p, g_r


# --------------------------------------------------------------------------
# Piecewise-categorical ("categorised") composition
#
# The K+1 class-logit heads join the base-distribution heads in the fused
# head list; the elementwise piece is (reference categorised.py:251-260):
#
#   ll = logit[min(t, K)] − lse(logits)
#        + [t ≥ K] · (base_ll(t − K) − lgamma(1 + t − K))
#
# with d ll / d logit_c = 1[c = min(t, K)] − softmax(logits)_c and the base
# head gradients masked to the t ≥ K region.  The kernel's unconditional
# −lgamma(1+t) subtraction is disabled for this family (the constant sits
# inside the shifted branch instead), handled by the factory flag below.
# --------------------------------------------------------------------------

_BASE_HEADS = {
    "poisson": ("log_lambda",),
    "negative binomial": ("p", "log_r"),
    "zero-inflated poisson": ("pi", "log_lambda"),
    "zero-inflated negative binomial": ("pi", "p", "log_r"),
}

_BASE_LL = {}
_BASE_GRADS = {}


def _cat_select_and_lse(cat_acts, t):
    """(logit at class min(t, K), logsumexp over classes) elementwise."""
    k = len(cat_acts) - 1
    m = cat_acts[0]
    for a in cat_acts[1:]:
        m = jnp.maximum(m, a)
    s = jnp.exp(cat_acts[0] - m)
    for a in cat_acts[1:]:
        s += jnp.exp(a - m)
    lse = m + jnp.log(s)
    # progressive select: after step c the value is cat_acts[min(t, c)]
    a_sel = cat_acts[0]
    for c in range(1, k + 1):
        a_sel = jnp.where(t >= c, cat_acts[c], a_sel)
    return a_sel, lse


def _categorised_ll(base_name: str, n_base: int, k: int):
    base_ll_fn = _BASE_LL[base_name]

    def ll(activations, t):
        base_acts = activations[:n_base]
        cat_acts = activations[n_base:]
        a_sel, lse = _cat_select_and_lse(cat_acts, t)
        shifted = jnp.maximum(t - k, 0.0)
        base = base_ll_fn(base_acts, shifted) - lgamma(1.0 + shifted)
        return a_sel - lse + jnp.where(t >= k, base, 0.0)

    return ll


def _categorised_grads(base_name: str, n_base: int, k: int):
    base_grads_fn = _BASE_GRADS[base_name]

    def grads(activations, t):
        base_acts = activations[:n_base]
        cat_acts = activations[n_base:]
        m = cat_acts[0]
        for a in cat_acts[1:]:
            m = jnp.maximum(m, a)
        exps = [jnp.exp(a - m) for a in cat_acts]
        s = exps[0]
        for e in exps[1:]:
            s += e
        inv_s = 1.0 / s
        shifted = jnp.maximum(t - k, 0.0)
        pos = t >= k
        base_gs = tuple(
            jnp.where(pos, g, 0.0)
            for g in base_grads_fn(base_acts, shifted)
        )
        cat_gs = []
        for c in range(k + 1):
            if c < k:
                # t is integer-valued, so [min(t, K) = c] ⇔ c ≤ t < c+1
                ind = jnp.logical_and(t >= c, t < c + 1)
            else:
                ind = pos
            cat_gs.append(
                jnp.where(ind, 1.0, 0.0) - exps[c] * inv_s
            )
        return base_gs + tuple(cat_gs)

    return grads


# --------------------------------------------------------------------------
# jnp reference implementations (tested against the distribution library)
# --------------------------------------------------------------------------


def _constrained_poisson_ll_rows(a, t, n):
    """Row-summed constrained-Poisson log-likelihood from raw head
    activations ``a`` (M, F), targets ``t`` (M, F), count sums ``n`` (M, 1).

    rate = softmax_F(a)·n, so with ``lse = logsumexp_F(a)``:

        Σ_f ll = Σ_f t·a − (Σ_f t)(lse − log n) − n − Σ_f lgamma(1+t)

    (the Σ_f rate term collapses to n).  Equivalent to the registry's
    softmax→Poisson composition but never underflows the softmax, so no
    support clipping is needed.
    """
    lse = jax.scipy.special.logsumexp(a, axis=-1, keepdims=True)
    sx = jnp.sum(t, axis=-1, keepdims=True)
    rows = (
        jnp.sum(t * a - lgamma(1.0 + t), axis=-1, keepdims=True)
        - sx * (lse - jnp.log(n))
        - n
    )
    return rows[..., 0]


def reference_log_likelihood(name, h, heads, t, count_sum=None,
                             compute_dtype=None):
    """Unfused jnp computation of the same quantity (used for parity tests
    and as the fallback on non-TPU backends).  ``compute_dtype`` is
    accepted for call-site symmetry with the fused path and ignored — the
    fallback stays exact f32."""
    del compute_dtype
    if name == "poisson":
        a_l = h @ heads["log_lambda"]["kernel"] + heads["log_lambda"]["bias"]
        ll = _poisson_ll(a_l, t) - lgamma(1.0 + t)
    elif name == "negative binomial":
        a_p = h @ heads["p"]["kernel"] + heads["p"]["bias"]
        a_r = h @ heads["log_r"]["kernel"] + heads["log_r"]["bias"]
        ll = _nb_ll(a_p, a_r, t) - lgamma(1.0 + t)
    elif name == "zero-inflated poisson":
        a_pi = h @ heads["pi"]["kernel"] + heads["pi"]["bias"]
        a_l = h @ heads["log_lambda"]["kernel"] + heads["log_lambda"]["bias"]
        ll = _zip_ll(a_pi, a_l, t) - lgamma(1.0 + t)
    elif name == "zero-inflated negative binomial":
        a_pi = h @ heads["pi"]["kernel"] + heads["pi"]["bias"]
        a_p = h @ heads["p"]["kernel"] + heads["p"]["bias"]
        a_r = h @ heads["log_r"]["kernel"] + heads["log_r"]["bias"]
        ll = _zinb_ll(a_pi, a_p, a_r, t) - lgamma(1.0 + t)
    elif name == "constrained poisson":
        if count_sum is None:
            raise ValueError("constrained poisson requires count_sum")
        a = h @ heads["lambda"]["kernel"] + heads["lambda"]["bias"]
        return _constrained_poisson_ll_rows(a, t, count_sum)
    else:
        raise ValueError(f"No fused likelihood for {name!r}")
    return jnp.sum(ll, axis=-1)


# --------------------------------------------------------------------------
# Generic fused machinery
#
# A likelihood is described by its head names, an `ll(activations, t)`
# elementwise log-prob, and a `grads(activations, t)` tuple of
# d ll / d activation.  The forward/backward kernels below are generated
# from that description, so adding a fused likelihood means adding two
# small functions.
# --------------------------------------------------------------------------


def _make_forward_kernel(n_heads, ll_fn, subtract_lgamma_const=True,
                         compute_dtype=None):
    # grid = (F tiles, M tiles), rows minor: each weight tile stays
    # resident across the whole row loop (weights re-read once per
    # feature tile instead of once per row tile — 4 MB vs 32 MB per step
    # at the flagship shape); the row-sum output accumulates across the
    # outer feature loop via read-modify-write block revisits, the same
    # pattern the backward uses for dh.
    def kernel(*refs):
        h_ref = refs[0]
        w_refs = refs[1:1 + 2 * n_heads:2]
        b_refs = refs[2:2 + 2 * n_heads:2]
        t_ref = refs[1 + 2 * n_heads]
        o_ref = refs[2 + 2 * n_heads]
        j = pl.program_id(0)
        h = h_ref[:]
        if compute_dtype is not None:
            # mixed-precision head matmuls: bf16 inputs, f32 accumulation
            # on the MXU (the f32 path is ~4x slower on v5e); the
            # elementwise log-prob stays f32
            h = h.astype(compute_dtype)
        activations = tuple(
            jnp.dot(
                h,
                w_ref[:].astype(h.dtype),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
            for w_ref, b_ref in zip(w_refs, b_refs)
        )
        t = t_ref[:]
        ll = ll_fn(activations, t)
        if subtract_lgamma_const:
            ll = ll - lgamma(1.0 + t)
        partial = jnp.sum(ll, axis=1, keepdims=True)

        @pl.when(j == 0)
        def _init():
            o_ref[:] = partial

        @pl.when(j > 0)
        def _accumulate():
            o_ref[:] += partial

    return kernel


def _make_backward_kernel(n_heads, grads_fn, compute_dtype=None,
                          nj=1, dh_scratch=False):
    """``nj`` = number of feature tiles (static); with ``dh_scratch`` the
    per-row-tile dh partial sums accumulate in a VMEM scratch across the
    outer feature loop instead of read-modify-writing the HBM out block
    on every revisit (the dh block index changes every inner step, so
    Pallas would otherwise round-trip it (nj−1) extra times — ~12 MB/step
    at the flagship shape)."""

    def kernel(*refs):
        g_ref = refs[0]
        h_ref = refs[1]
        w_refs = refs[2:2 + 2 * n_heads:2]
        b_refs = refs[3:3 + 2 * n_heads:2]
        t_ref = refs[2 + 2 * n_heads]
        out = refs[3 + 2 * n_heads:]
        if dh_scratch:
            dh_s_ref = out[-1]
            out = out[:-1]
        dh_ref = out[0]
        dw_refs = out[1:1 + 2 * n_heads:2]
        db_refs = out[2:2 + 2 * n_heads:2]
        # grid = (F tiles, M tiles); rows are the minor axis so each dW/db
        # tile stays resident across the whole row loop.
        j = pl.program_id(0)
        i = pl.program_id(1)
        h = h_ref[:]
        hc = h if compute_dtype is None else h.astype(compute_dtype)
        activations = tuple(
            jnp.dot(
                hc,
                w_ref[:].astype(hc.dtype),
                preferred_element_type=jnp.float32,
            )
            + b_ref[:]
            for w_ref, b_ref in zip(w_refs, b_refs)
        )
        gs = grads_fn(activations, t_ref[:])
        g = g_ref[:]  # (TM, 1) row cotangents
        gs = tuple(g_a * g for g_a in gs)
        # mixed precision: cast both operands of the gradient matmuls like
        # XLA does for the bf16 trunk backward
        gsc = gs if compute_dtype is None else tuple(
            g_a.astype(compute_dtype) for g_a in gs
        )

        dh = jnp.dot(
            gsc[0],
            w_refs[0][:].astype(gsc[0].dtype).T,
            preferred_element_type=jnp.float32,
        )
        for g_a, w_ref in zip(gsc[1:], w_refs[1:]):
            dh += jnp.dot(
                g_a,
                w_ref[:].astype(g_a.dtype).T,
                preferred_element_type=jnp.float32,
            )

        if dh_scratch and nj > 1:
            tm = dh_ref.shape[0]
            slot = pl.ds(i * tm, tm)

            @pl.when(j == 0)
            def _init_dh():
                dh_s_ref[slot, :] = dh

            @pl.when(jnp.logical_and(j > 0, j < nj - 1))
            def _acc_dh():
                dh_s_ref[slot, :] += dh

            @pl.when(j == nj - 1)
            def _flush_dh():
                dh_ref[:] = dh_s_ref[slot, :] + dh
        else:
            @pl.when(j == 0)
            def _init_dh():
                dh_ref[:] = dh

            @pl.when(j > 0)
            def _acc_dh():
                dh_ref[:] += dh

        for g_a, g_ac, dw_ref, db_ref in zip(gs, gsc, dw_refs, db_refs):
            dw = jnp.dot(hc.T, g_ac, preferred_element_type=jnp.float32)
            db = jnp.sum(g_a, axis=0, keepdims=True)

            @pl.when(i == 0)
            def _init_dw(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                dw_ref[:] = dw
                db_ref[:] = db

            @pl.when(i > 0)
            def _acc_dw(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                dw_ref[:] += dw
                db_ref[:] += db

    return kernel


def _pad_rows(x, m_padded):
    pad = m_padded - x.shape[0]
    if pad:
        return jnp.pad(x, ((0, pad), (0, 0)))
    return x


def _pad_cols(x, f_padded):
    pad = f_padded - x.shape[-1]
    if pad:
        return jnp.pad(x, ((0, 0), (0, pad)))
    return x


def _tile_sizes(n_heads: int, hidden: int) -> tuple[int, int]:
    """(row, feature) tile sizes keeping per-program VMEM in budget.

    Resident per program: n_heads weight tiles (hidden, TF) double-
    buffered, n_heads activation tiles (TM, TF), h/t tiles.  The defaults
    suit ≤4 heads; categorised likelihoods bring K+1 extra heads, so
    shrink TF (and then TM) until the estimate fits ~10 MB.  The
    ``SCVAE_FUSED_TM``/``SCVAE_FUSED_TF`` env vars override the starting
    sizes (tile-retune experiments)."""
    import os

    tm = int(os.environ.get("SCVAE_FUSED_TM", _TM))
    tf = int(os.environ.get("SCVAE_FUSED_TF", _TF))
    while tf > 128:
        est = (
            n_heads * hidden * tf * 4 * 2      # weight tiles (dbuf)
            + n_heads * tm * tf * 4            # activation tiles
            + tm * hidden * 4 + tm * tf * 4 * 2  # h + t tiles
        )
        if est <= 10 * 2**20:
            break
        tf //= 2
    return tm, tf


def _fused_forward(ll_fn, h, weights, biases, t,
                   subtract_lgamma_const=True, compute_dtype=None,
                   t_groups=1):
    n_heads = len(weights)
    m, hidden = h.shape
    f = t.shape[-1]
    tm, tf = _tile_sizes(n_heads, hidden)
    m_padded = _round_up(max(m, 8), tm)
    f_padded = _round_up(f, tf)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_cols(t, f_padded)
    if t_groups > 1 and t.shape[0] % tm != 0:
        # modulo map needs whole row tiles per group; broadcast instead
        t_p = jnp.broadcast_to(
            t_p[None], (t_groups,) + t_p.shape
        ).reshape(t_groups * t.shape[0], f_padded)
        t_groups = 1
    if t_groups == 1:
        t_p = _pad_rows(t_p, m_padded)
        t_index = lambda j, i: (i, j)  # noqa: E731
    else:
        # h rows are t_groups contiguous blocks sharing the same (B, F)
        # targets (the GMVAE's K·S cluster-sample axis): the index map
        # cycles over t's row tiles instead of broadcasting t to (G·B, F)
        b_tiles = t.shape[0] // tm
        t_index = lambda j, i, bt=b_tiles: (  # noqa: E731
            jax.lax.rem(i, bt), j
        )
    ws = [_pad_cols(w, f_padded) for w in weights]
    bs = [_pad_cols(b.reshape(1, f), f_padded) for b in biases]

    in_specs = [
        pl.BlockSpec((tm, hidden), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    ]
    operands = [h_p]
    for w, b in zip(ws, bs):
        in_specs.append(
            pl.BlockSpec((hidden, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(w)
        in_specs.append(
            pl.BlockSpec((1, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(b)
    in_specs.append(
        pl.BlockSpec((tm, tf), t_index, memory_space=pltpu.VMEM)
    )
    operands.append(t_p)

    out = pl.pallas_call(
        _make_forward_kernel(n_heads, ll_fn, subtract_lgamma_const,
                             compute_dtype),
        grid=(f_padded // tf, m_padded // tm),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tm, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((m_padded, 1), jnp.float32),
    )(*operands)
    correction = 0.0
    if f_padded != f:
        # padded features contribute −lgamma(1) = 0 from the constant and
        # ll_fn(0-activations, t=0); subtract that constant contribution.
        zero_act = tuple(
            jnp.zeros((1, f_padded - f), jnp.float32) for _ in range(n_heads)
        )
        # activations in the padded region are 0·W + b_pad = 0 (b padded 0)
        pad_ll = ll_fn(zero_act, jnp.zeros((1, f_padded - f), jnp.float32))
        correction = jnp.sum(pad_ll)
    return out[:m, 0] - correction


def _fused_backward(grads_fn, h, weights, biases, t, g,
                    compute_dtype=None, t_groups=1):
    n_heads = len(weights)
    m, hidden = h.shape
    f = t.shape[-1]
    tm, tf = _tile_sizes(n_heads, hidden)
    m_padded = _round_up(max(m, 8), tm)
    f_padded = _round_up(f, tf)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_cols(t, f_padded)
    if t_groups > 1 and t.shape[0] % tm != 0:
        t_p = jnp.broadcast_to(
            t_p[None], (t_groups,) + t_p.shape
        ).reshape(t_groups * t.shape[0], f_padded)
        t_groups = 1
    if t_groups == 1:
        t_p = _pad_rows(t_p, m_padded)
        t_index = lambda j, i: (i, j)  # noqa: E731
    else:
        b_tiles = t.shape[0] // tm
        t_index = lambda j, i, bt=b_tiles: (  # noqa: E731
            jax.lax.rem(i, bt), j
        )
    g_p = _pad_rows(g.reshape(m, 1), m_padded)
    ws = [_pad_cols(w, f_padded) for w in weights]
    bs = [_pad_cols(b.reshape(1, f), f_padded) for b in biases]

    in_specs = [
        pl.BlockSpec((tm, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tm, hidden), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
    ]
    operands = [g_p, h_p]
    for w, b in zip(ws, bs):
        in_specs.append(
            pl.BlockSpec((hidden, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(w)
        in_specs.append(
            pl.BlockSpec((1, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        operands.append(b)
    in_specs.append(
        pl.BlockSpec((tm, tf), t_index, memory_space=pltpu.VMEM)
    )
    operands.append(t_p)

    out_specs = [
        pl.BlockSpec((tm, hidden), lambda j, i: (i, 0), memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((m_padded, hidden), jnp.float32)]
    for _ in range(n_heads):
        out_specs.append(
            pl.BlockSpec((hidden, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((hidden, f_padded), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tf), lambda j, i: (0, j), memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, f_padded), jnp.float32))

    nj = f_padded // tf
    # VMEM scratch for the dh accumulation when it fits (the GMVAE's
    # K·S·B rows can exceed the budget — those keep the revisit pattern)
    use_dh_scratch = nj > 1 and m_padded * hidden * 4 <= 4 * 2**20
    outputs = pl.pallas_call(
        _make_backward_kernel(n_heads, grads_fn, compute_dtype,
                              nj=nj, dh_scratch=use_dh_scratch),
        grid=(nj, m_padded // tm),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=(
            [pltpu.VMEM((m_padded, hidden), jnp.float32)]
            if use_dh_scratch
            else []
        ),
    )(*operands)
    dh = outputs[0][:m]
    dws = [outputs[1 + 2 * k][:, :f] for k in range(n_heads)]
    dbs = [outputs[2 + 2 * k][0, :f] for k in range(n_heads)]
    return dh, dws, dbs


# --------------------------------------------------------------------------
# Likelihood-specific wrappers with custom VJPs
# --------------------------------------------------------------------------


def _nb_ll_packed(activations, t):
    a_p, a_r = activations
    return _nb_ll(a_p, a_r, t)


def _nb_grads_packed(activations, t):
    a_p, a_r = activations
    return _nb_grads(a_p, a_r, t)


def _poisson_ll_packed(activations, t):
    (a_l,) = activations
    return _poisson_ll(a_l, t)


def _poisson_grads_packed(activations, t):
    (a_l,) = activations
    return (_poisson_grad(a_l, t),)


def _zip_ll_packed(activations, t):
    a_pi, a_l = activations
    return _zip_ll(a_pi, a_l, t)


def _zip_grads_packed(activations, t):
    a_pi, a_l = activations
    return _zip_grads(a_pi, a_l, t)


def _zinb_ll_packed(activations, t):
    a_pi, a_p, a_r = activations
    return _zinb_ll(a_pi, a_p, a_r, t)


def _zinb_grads_packed(activations, t):
    a_pi, a_p, a_r = activations
    return _zinb_grads(a_pi, a_p, a_r, t)


# --------------------------------------------------------------------------
# Grouped kernels: h carries a leading group axis (G, M, H) — the GMVAE's
# K·S cluster-sample groups — while the targets t (M, F) are SHARED across
# groups; the group loop runs INSIDE the kernel body over a resident
# (G, TM, H) h-block so t and the weight tiles are read once per (row,
# feature) tile regardless of G.
#
# MEASURED SLOWER than the flat kernels on TPU v5e (GMVAE K=10, B=512:
# 1.32 vs 1.07 ms/step — the (G, TM, H)-resident blocks force small row
# tiles, and Mosaic compile of the unrolled G-loop took 1885 s vs 18 s).
# The production GMVAE path therefore uses the FLAT kernels with a
# shared-t index map (``fused_log_likelihood`` with 2-D t) — kept here as
# the measured alternative and exercised by interpreter-mode tests.
# Reference counterpart: the per-cluster reconstruction accumulation
# loops (``gaussian_mixture_variational_autoencoder.py:3270-3329``).
# --------------------------------------------------------------------------


def _grouped_tile_sizes(n_heads: int, hidden: int, g: int) -> tuple[int, int]:
    """Tiles for the grouped kernels: the h block is (G, TM, hidden) and
    the backward also holds a (G, TM, hidden) dh block, so shrink TM
    first, then TF.  The budget is deliberately conservative — Mosaic's
    real footprint adds double buffering on every pipelined operand plus
    the per-group activation/gradient temporaries (measured ~1.9× this
    estimate at G=10; a 5 MB estimate keeps the true usage inside the
    16 MB scoped-vmem limit)."""
    tm, tf = _TM, _TF
    while True:
        est = (
            2 * g * tm * hidden * 4          # h + dh blocks
            + n_heads * hidden * tf * 4 * 2  # weight tiles (dbuf)
            + (n_heads + 2) * tm * tf * 4    # activations + t + spill
        )
        if est <= 5 * 2**20:
            return tm, tf
        if tm > 64:
            tm //= 2
        elif tf > 128:
            tf //= 2
        else:
            return tm, tf


def _make_grouped_forward_kernel(n_heads, g, ll_fn, subtract_lgamma_const,
                                 compute_dtype):
    def kernel(*refs):
        h_ref = refs[0]  # (G, TM, H)
        w_refs = refs[1:1 + 2 * n_heads:2]
        b_refs = refs[2:2 + 2 * n_heads:2]
        t_ref = refs[1 + 2 * n_heads]  # (TM, TF)
        o_ref = refs[2 + 2 * n_heads]  # (G, TM, 1)
        j = pl.program_id(1)
        t = t_ref[:]
        const = lgamma(1.0 + t) if subtract_lgamma_const else None
        ws = [w_ref[:] for w_ref in w_refs]
        if compute_dtype is not None:
            ws = [w.astype(compute_dtype) for w in ws]
        for k in range(g):
            h = h_ref[k]
            if compute_dtype is not None:
                h = h.astype(compute_dtype)
            activations = tuple(
                jnp.dot(h, w, preferred_element_type=jnp.float32) + b_ref[:]
                for w, b_ref in zip(ws, b_refs)
            )
            ll = ll_fn(activations, t)
            if const is not None:
                ll = ll - const
            partial = jnp.sum(ll, axis=1, keepdims=True)

            @pl.when(j == 0)
            def _init(partial=partial, k=k):
                o_ref[k] = partial

            @pl.when(j > 0)
            def _accumulate(partial=partial, k=k):
                o_ref[k] += partial

    return kernel


def _make_grouped_backward_kernel(n_heads, g, grads_fn, compute_dtype):
    def kernel(*refs):
        g_ref = refs[0]  # (G, TM, 1) row cotangents
        h_ref = refs[1]  # (G, TM, H)
        w_refs = refs[2:2 + 2 * n_heads:2]
        b_refs = refs[3:3 + 2 * n_heads:2]
        t_ref = refs[2 + 2 * n_heads]  # (TM, TF)
        out = refs[3 + 2 * n_heads:]
        dh_ref = out[0]  # (G, TM, H)
        dw_refs = out[1:1 + 2 * n_heads:2]
        db_refs = out[2:2 + 2 * n_heads:2]
        # grid = (F tiles, M tiles): dW/db accumulate over rows (and the
        # in-body group loop); dh accumulates over feature tiles.
        j = pl.program_id(0)
        i = pl.program_id(1)
        t = t_ref[:]
        ws = [w_ref[:] for w_ref in w_refs]
        ws_c = (
            ws if compute_dtype is None
            else [w.astype(compute_dtype) for w in ws]
        )
        for k in range(g):
            h = h_ref[k]
            hc = h if compute_dtype is None else h.astype(compute_dtype)
            activations = tuple(
                jnp.dot(hc, w, preferred_element_type=jnp.float32) + b_ref[:]
                for w, b_ref in zip(ws_c, b_refs)
            )
            gs = grads_fn(activations, t)
            gk = g_ref[k]  # (TM, 1)
            gs = tuple(g_a * gk for g_a in gs)
            gsc = gs if compute_dtype is None else tuple(
                g_a.astype(compute_dtype) for g_a in gs
            )

            dh = jnp.dot(gsc[0], ws_c[0].T,
                         preferred_element_type=jnp.float32)
            for g_a, w in zip(gsc[1:], ws_c[1:]):
                dh += jnp.dot(g_a, w.T, preferred_element_type=jnp.float32)

            @pl.when(j == 0)
            def _init_dh(dh=dh, k=k):
                dh_ref[k] = dh

            @pl.when(j > 0)
            def _acc_dh(dh=dh, k=k):
                dh_ref[k] += dh

            for g_a, g_ac, dw_ref, db_ref in zip(gs, gsc, dw_refs, db_refs):
                dw = jnp.dot(hc.T, g_ac, preferred_element_type=jnp.float32)
                db = jnp.sum(g_a, axis=0, keepdims=True)

                if k == 0:
                    # the k loop is unrolled (static), so only group 0 of
                    # the first row tile initialises the dW/db tiles
                    @pl.when(i == 0)
                    def _init_dw(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                        dw_ref[:] = dw
                        db_ref[:] = db

                    @pl.when(i > 0)
                    def _acc_dw(dw_ref=dw_ref, db_ref=db_ref, dw=dw, db=db):
                        dw_ref[:] += dw
                        db_ref[:] += db
                else:
                    dw_ref[:] += dw
                    db_ref[:] += db

    return kernel


def _grouped_forward(ll_fn, h, weights, biases, t,
                     subtract_lgamma_const=True, compute_dtype=None):
    n_heads = len(weights)
    g, m, hidden = h.shape
    f = t.shape[-1]
    tm, tf = _grouped_tile_sizes(n_heads, hidden, g)
    m_padded = _round_up(max(m, 8), tm)
    f_padded = _round_up(f, tf)
    h_p = jnp.pad(h, ((0, 0), (0, m_padded - m), (0, 0))) if m_padded != m else h
    t_p = _pad_cols(_pad_rows(t, m_padded), f_padded)
    ws = [_pad_cols(w, f_padded) for w in weights]
    bs = [_pad_cols(b.reshape(1, f), f_padded) for b in biases]

    in_specs = [
        pl.BlockSpec((g, tm, hidden), lambda i, j: (0, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    operands = [h_p]
    for w, b in zip(ws, bs):
        in_specs.append(
            pl.BlockSpec((hidden, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(w)
        in_specs.append(
            pl.BlockSpec((1, tf), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(b)
    in_specs.append(
        pl.BlockSpec((tm, tf), lambda i, j: (i, j), memory_space=pltpu.VMEM)
    )
    operands.append(t_p)

    out = pl.pallas_call(
        _make_grouped_forward_kernel(
            n_heads, g, ll_fn, subtract_lgamma_const, compute_dtype
        ),
        grid=(m_padded // tm, f_padded // tf),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (g, tm, 1), lambda i, j: (0, i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((g, m_padded, 1), jnp.float32),
    )(*operands)
    correction = 0.0
    if f_padded != f:
        zero_act = tuple(
            jnp.zeros((1, f_padded - f), jnp.float32) for _ in range(n_heads)
        )
        pad_ll = ll_fn(zero_act, jnp.zeros((1, f_padded - f), jnp.float32))
        correction = jnp.sum(pad_ll)
    return out[:, :m, 0] - correction


def _grouped_backward(grads_fn, h, weights, biases, t, gbar,
                      compute_dtype=None):
    n_heads = len(weights)
    g, m, hidden = h.shape
    f = t.shape[-1]
    tm, tf = _grouped_tile_sizes(n_heads, hidden, g)
    m_padded = _round_up(max(m, 8), tm)
    f_padded = _round_up(f, tf)
    h_p = jnp.pad(h, ((0, 0), (0, m_padded - m), (0, 0))) if m_padded != m else h
    t_p = _pad_cols(_pad_rows(t, m_padded), f_padded)
    g_p = gbar.reshape(g, m, 1)
    if m_padded != m:
        g_p = jnp.pad(g_p, ((0, 0), (0, m_padded - m), (0, 0)))
    ws = [_pad_cols(w, f_padded) for w in weights]
    bs = [_pad_cols(b.reshape(1, f), f_padded) for b in biases]

    in_specs = [
        pl.BlockSpec((g, tm, 1), lambda j, i: (0, i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((g, tm, hidden), lambda j, i: (0, i, 0),
                     memory_space=pltpu.VMEM),
    ]
    operands = [g_p, h_p]
    for w, b in zip(ws, bs):
        in_specs.append(
            pl.BlockSpec((hidden, tf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(w)
        in_specs.append(
            pl.BlockSpec((1, tf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
        )
        operands.append(b)
    in_specs.append(
        pl.BlockSpec((tm, tf), lambda j, i: (i, j), memory_space=pltpu.VMEM)
    )
    operands.append(t_p)

    out_specs = [
        pl.BlockSpec((g, tm, hidden), lambda j, i: (0, i, 0),
                     memory_space=pltpu.VMEM)
    ]
    out_shape = [jax.ShapeDtypeStruct((g, m_padded, hidden), jnp.float32)]
    for _ in range(n_heads):
        out_specs.append(
            pl.BlockSpec((hidden, tf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((hidden, f_padded), jnp.float32))
        out_specs.append(
            pl.BlockSpec((1, tf), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM)
        )
        out_shape.append(jax.ShapeDtypeStruct((1, f_padded), jnp.float32))

    outputs = pl.pallas_call(
        _make_grouped_backward_kernel(n_heads, g, grads_fn, compute_dtype),
        grid=(f_padded // tf, m_padded // tm),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
    )(*operands)
    dh = outputs[0][:, :m]
    dws = [outputs[1 + 2 * k][:, :f] for k in range(n_heads)]
    dbs = [outputs[2 + 2 * k][0, :f] for k in range(n_heads)]
    return dh, dws, dbs


def _make_fused_grouped_from(ll_fn, grads_fn, subtract_lgamma_const,
                             compute_dtype):
    """Grouped-kernel custom_vjp: h (G, M, H), t (M, F) → ll (G, M)."""

    @jax.custom_vjp
    def fused(h, weights, biases, t):
        return _grouped_forward(
            ll_fn, h, weights, biases, t,
            subtract_lgamma_const=subtract_lgamma_const,
            compute_dtype=compute_dtype,
        )

    def fwd(h, weights, biases, t):
        return fused(h, weights, biases, t), (h, weights, biases, t)

    def bwd(residuals, gbar):
        h, weights, biases, t = residuals
        dh, dws, dbs = _grouped_backward(
            grads_fn, h, weights, biases, t, gbar,
            compute_dtype=compute_dtype,
        )
        return dh, tuple(dws), tuple(dbs), jnp.zeros_like(t)

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def _make_fused_grouped(name: str, compute_dtype=None):
    return _make_fused_grouped_from(
        _BASE_LL[name], _BASE_GRADS[name],
        subtract_lgamma_const=True, compute_dtype=compute_dtype,
    )


# Above roughly 16 resident groups the h/dh blocks crowd out the weight
# tiles; larger G falls back to the flat broadcast path.
_MAX_FUSED_GROUPS = 16


def supports_grouped_likelihood(name: str, g: int, k_max: int = 0) -> bool:
    return k_max == 0 and name in _BASE_HEADS and 1 < g <= _MAX_FUSED_GROUPS


def fused_grouped_log_likelihood(
    name: str,
    h: jax.Array,
    heads: dict[str, dict[str, jax.Array]],
    t: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Row-summed log p(t | heads(h_g)) per group: ``h`` (..., G, M, H)
    against targets ``t`` (M, F) shared by every group — the GMVAE's
    cluster axis stays a kernel loop instead of a broadcast."""
    lead = h.shape[:-2]
    m, hidden = h.shape[-2:]
    g = int(np.prod(lead)) if lead else 1
    h3 = h.reshape(g, m, hidden)
    out = _make_fused_grouped(name, compute_dtype)(
        h3, *_head_tuples(name, heads), t
    )
    return out.reshape(lead + (m,))


def _head_tuples(name, heads):
    ws = tuple(heads[p]["kernel"] for p in _BASE_HEADS[name])
    bs = tuple(heads[p]["bias"] for p in _BASE_HEADS[name])
    return ws, bs


def _make_fused_from(ll_fn, grads_fn, subtract_lgamma_const, compute_dtype):
    """custom_vjp wrapper around the generic forward/backward kernels.
    Head weights/biases travel as tuples (pytrees), so one wrapper serves
    any head count; the backward recomputes activations per tile instead
    of storing them (flash-attention-style).  When ``h`` has more rows
    than ``t`` (the GMVAE's K·S groups over shared targets), the t index
    map cycles instead of broadcasting."""

    @jax.custom_vjp
    def fused(h, weights, biases, t):
        return _fused_forward(
            ll_fn, h, weights, biases, t,
            subtract_lgamma_const=subtract_lgamma_const,
            compute_dtype=compute_dtype,
            t_groups=h.shape[0] // t.shape[0],
        )

    def fwd(h, weights, biases, t):
        return fused(h, weights, biases, t), (h, weights, biases, t)

    def bwd(residuals, g):
        h, weights, biases, t = residuals
        dh, dws, dbs = _fused_backward(
            grads_fn, h, weights, biases, t, g,
            compute_dtype=compute_dtype,
            t_groups=h.shape[0] // t.shape[0],
        )
        return dh, tuple(dws), tuple(dbs), jnp.zeros_like(t)

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def _make_fused_basic(name: str, compute_dtype=None,
                      subtract_lgamma_const=True):
    return _make_fused_from(
        _BASE_LL[name], _BASE_GRADS[name],
        subtract_lgamma_const=subtract_lgamma_const,
        compute_dtype=compute_dtype,
    )


_BASE_LL.update({
    "poisson": _poisson_ll_packed,
    "negative binomial": _nb_ll_packed,
    "zero-inflated poisson": _zip_ll_packed,
    "zero-inflated negative binomial": _zinb_ll_packed,
})
_BASE_GRADS.update({
    "poisson": _poisson_grads_packed,
    "negative binomial": _nb_grads_packed,
    "zero-inflated poisson": _zip_grads_packed,
    "zero-inflated negative binomial": _zinb_grads_packed,
})


# --------------------------------------------------------------------------
# Categorised wrapper: base heads + K+1 class-logit heads in one kernel.
# Head weights/biases travel as tuples (pytrees are fine for custom_vjp),
# so one factory serves every (base, K) combination.
# --------------------------------------------------------------------------


@functools.lru_cache(maxsize=None)
def _make_fused_categorised(base_name: str, k: int, compute_dtype=None):
    n_base = len(_BASE_HEADS[base_name])
    return _make_fused_from(
        _categorised_ll(base_name, n_base, k),
        _categorised_grads(base_name, n_base, k),
        subtract_lgamma_const=False,
        compute_dtype=compute_dtype,
    )


def _categorised_head_list(name, heads, cat_kernel, cat_bias):
    """Flatten base heads + per-class categorical heads into (ws, bs).

    ``cat_kernel`` is (K+1, H, F) and ``cat_bias`` (K+1, F) — class-major
    so each class's weight block is a contiguous (H, F) matrix the kernel
    can tile directly (vae.init stores the parameter in this layout)."""
    ws = [heads[p]["kernel"] for p in _BASE_HEADS[name]]
    bs = [heads[p]["bias"] for p in _BASE_HEADS[name]]
    k_plus_1 = cat_kernel.shape[0]
    for c in range(k_plus_1):
        ws.append(cat_kernel[c])
        bs.append(cat_bias[c])
    return tuple(ws), tuple(bs)


def reference_categorised_log_likelihood(
    name, h, heads, cat_kernel, cat_bias, t, compute_dtype=None
):
    """Unfused jnp computation of the categorised row-summed likelihood
    (parity baseline and the non-TPU fallback; ``compute_dtype`` ignored
    — exact f32)."""
    del compute_dtype
    n_base = len(_BASE_HEADS[name])
    k = cat_kernel.shape[0] - 1
    ll_fn = _categorised_ll(name, n_base, k)
    ws, bs = _categorised_head_list(name, heads, cat_kernel, cat_bias)
    activations = tuple(h @ w + b for w, b in zip(ws, bs))
    return jnp.sum(ll_fn(activations, t), axis=-1)


def fused_categorised_log_likelihood(
    name, h, heads, cat_kernel, cat_bias, t, compute_dtype=None
):
    """Fused Pallas path for the categorised likelihood (K+1 class heads
    + base heads, log-softmax and the piecewise select in VMEM — the
    (B, F, K+1) logits tensor never reaches HBM; reference
    ``variational_autoencoder.py:2507-2532``)."""
    lead_shape = h.shape[:-1]
    hidden = h.shape[-1]
    f = t.shape[-1]
    k = cat_kernel.shape[0] - 1
    h2 = h.reshape(-1, hidden)
    # 2-D t under extra lead axes rides the shared-t index map
    t2 = (
        t
        if t.ndim == 2 and h2.shape[0] % t.shape[0] == 0
        else jnp.broadcast_to(t, lead_shape + (f,)).reshape(-1, f)
    )
    ws, bs = _categorised_head_list(name, heads, cat_kernel, cat_bias)
    out = _make_fused_categorised(name, k, compute_dtype)(h2, ws, bs, t2)
    return out.reshape(lead_shape)


# --------------------------------------------------------------------------
# Constrained Poisson: the softmax over genes couples feature tiles, so the
# forward kernel carries an online logsumexp across the feature-tile loop
# (flash-attention-style running (max, sumexp) in VMEM scratch) and emits
# the row lse for the backward, which needs only softmax(a) per tile.
# --------------------------------------------------------------------------

_NEG_BIG = -1e30  # bias padding: exp underflows, 0·pad stays finite


def _cp_forward_kernel(h_ref, w_ref, b_ref, t_ref, n_ref, ll_ref, lse_ref,
                       acc_ref, sx_ref, m_ref, s_ref):
    j = pl.program_id(1)
    nj = pl.num_programs(1)
    a = (
        jnp.dot(h_ref[:], w_ref[:], preferred_element_type=jnp.float32)
        + b_ref[:]
    )
    t = t_ref[:]
    tile_max = jnp.max(a, axis=1, keepdims=True)
    tile_sum = jnp.sum(jnp.exp(a - tile_max), axis=1, keepdims=True)
    partial = jnp.sum(t * a - lgamma(1.0 + t), axis=1, keepdims=True)
    tile_sx = jnp.sum(t, axis=1, keepdims=True)

    @pl.when(j == 0)
    def _init():
        m_ref[:] = tile_max
        s_ref[:] = tile_sum
        acc_ref[:] = partial
        sx_ref[:] = tile_sx

    @pl.when(j > 0)
    def _accumulate():
        m_old = m_ref[:]
        m_new = jnp.maximum(m_old, tile_max)
        s_ref[:] = s_ref[:] * jnp.exp(m_old - m_new) + tile_sum * jnp.exp(
            tile_max - m_new
        )
        m_ref[:] = m_new
        acc_ref[:] += partial
        sx_ref[:] += tile_sx

    @pl.when(j == nj - 1)
    def _finalise():
        lse = m_ref[:] + jnp.log(s_ref[:])
        n = n_ref[:]
        lse_ref[:] = lse
        ll_ref[:] = acc_ref[:] - sx_ref[:] * (lse - jnp.log(n)) - n


def _cp_backward_kernel(g_ref, h_ref, w_ref, t_ref, lse_ref, sx_ref,
                        dh_ref, dw_ref):
    # grid = (F tiles, M tiles); rows minor (same layout as the generic
    # backward: the dW tile stays resident across the row loop).  The bias
    # rides as a constant-1 column appended to h (last row of w), so
    # a = h_aug @ w_aug already includes it and dw_aug's last row is db.
    # d ll / d a = t − (Σ_f t)·softmax(a) with softmax(a) = exp(a − lse).
    j = pl.program_id(0)
    i = pl.program_id(1)
    h = h_ref[:]
    a = jnp.dot(h, w_ref[:], preferred_element_type=jnp.float32)
    da = g_ref[:] * (t_ref[:] - sx_ref[:] * jnp.exp(a - lse_ref[:]))

    dh = jnp.dot(da, w_ref[:].T, preferred_element_type=jnp.float32)

    @pl.when(j == 0)
    def _init_dh():
        dh_ref[:] = dh

    @pl.when(j > 0)
    def _acc_dh():
        dh_ref[:] += dh

    dw = jnp.dot(h.T, da, preferred_element_type=jnp.float32)

    @pl.when(i == 0)
    def _init_dw():
        dw_ref[:] = dw

    @pl.when(i > 0)
    def _acc_dw():
        dw_ref[:] += dw


def _cp_fused_forward(h, w, b, t, n):
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    f_padded = _round_up(f, _TF)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_cols(_pad_rows(t, m_padded), f_padded)
    w_p = _pad_cols(w, f_padded)
    b2 = b.reshape(1, f)
    if f_padded != f:
        # Padded feature columns must not reach the softmax: a huge negative
        # bias underflows their exp while 0·a stays finite in t·a.
        b_p = jnp.concatenate(
            [b2, jnp.full((1, f_padded - f), _NEG_BIG, b2.dtype)], axis=1
        )
    else:
        b_p = b2
    n_p = jnp.pad(n.reshape(m, 1), ((0, m_padded - m), (0, 0)),
                  constant_values=1.0)

    ll, lse = pl.pallas_call(
        _cp_forward_kernel,
        grid=(m_padded // _TM, f_padded // _TF),
        in_specs=[
            pl.BlockSpec((_TM, hidden), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden, _TF), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TF), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, _TF), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_padded, 1), jnp.float32),
            jax.ShapeDtypeStruct((m_padded, 1), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((_TM, 1), jnp.float32),
            pltpu.VMEM((_TM, 1), jnp.float32),
            pltpu.VMEM((_TM, 1), jnp.float32),
            pltpu.VMEM((_TM, 1), jnp.float32),
        ],
    )(h_p, w_p, b_p, t_p, n_p)
    return ll[:m, 0], lse[:m, 0]


def _cp_fused_backward(h, w, b, t, lse, g):
    m, hidden = h.shape
    f = t.shape[-1]
    m_padded = _round_up(max(m, 8), _TM)
    f_padded = _round_up(f, _TF)
    h_p = _pad_rows(h, m_padded)
    t_p = _pad_cols(_pad_rows(t, m_padded), f_padded)
    w_p = _pad_cols(w, f_padded)
    sx = jnp.sum(t, axis=-1, keepdims=True)
    sx_p = _pad_rows(sx, m_padded)
    g_p = _pad_rows(g.reshape(m, 1), m_padded)
    # Fold the bias into the lse operand: softmax(a+b) = exp(a − (lse − b))
    # would need a per-(row, col) shift, so instead keep b with w by
    # appending a constant-1 input column to h.
    h_aug = jnp.concatenate(
        [h_p, jnp.ones((m_padded, 1), h_p.dtype)], axis=1
    )
    b_row = b.reshape(1, f)
    if f_padded != f:
        b_row = jnp.concatenate(
            [b_row, jnp.full((1, f_padded - f), _NEG_BIG, b_row.dtype)],
            axis=1,
        )
    w_aug = jnp.concatenate([w_p, b_row], axis=0)
    lse_p = _pad_rows(lse.reshape(m, 1), m_padded)

    dh_aug, dw_aug = pl.pallas_call(
        _cp_backward_kernel,
        grid=(f_padded // _TF, m_padded // _TM),
        in_specs=[
            pl.BlockSpec((_TM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, hidden + 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden + 1, _TF), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, _TF), lambda j, i: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((_TM, 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((_TM, hidden + 1), lambda j, i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((hidden + 1, _TF), lambda j, i: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m_padded, hidden + 1), jnp.float32),
            jax.ShapeDtypeStruct((hidden + 1, f_padded), jnp.float32),
        ],
    )(g_p, h_aug, w_aug, t_p, lse_p, sx_p)
    dh = dh_aug[:m, :hidden]
    dw = dw_aug[:hidden, :f]
    db = dw_aug[hidden, :f]
    return dh, dw, db


@jax.custom_vjp
def _fused_constrained_poisson(h, w, b, t, n):
    ll, _lse = _cp_fused_forward(h, w, b, t, n)
    return ll


def _fused_cp_fwd(h, w, b, t, n):
    ll, lse = _cp_fused_forward(h, w, b, t, n)
    return ll, (h, w, b, t, n, lse)


def _fused_cp_bwd(residuals, g):
    h, w, b, t, n, lse = residuals
    dh, dw, db = _cp_fused_backward(h, w, b, t, lse, g)
    # n is data (per-cell count sum), but its true cotangent is cheap:
    # d ll / d n = (Σ_f t)/n − 1.
    sx = jnp.sum(t, axis=-1, keepdims=True)
    n2 = n.reshape(-1, 1)
    dn = g.reshape(-1, 1) * (sx / n2 - 1.0)
    return dh, dw, db, jnp.zeros_like(t), dn.reshape(n.shape)


_fused_constrained_poisson.defvjp(_fused_cp_fwd, _fused_cp_bwd)


# --------------------------------------------------------------------------
# Public entry
# --------------------------------------------------------------------------


def fused_log_likelihood(
    name: str,
    h: jax.Array,
    heads: dict[str, dict[str, jax.Array]],
    t: jax.Array,
    count_sum: jax.Array | None = None,
    compute_dtype=None,
    include_lgamma_const: bool = True,
) -> jax.Array:
    """Row-summed log p(t | heads(h)) with the fused Pallas path.

    ``h``: (..., H) decoder output; ``t``: (..., F) targets broadcastable
    against the leading axes of ``h`` — a 2-D ``t`` under extra ``h``
    lead axes (the GMVAE's K·S groups, IW samples) is NOT materialised:
    the kernel's t index map cycles over the shared rows instead.
    heads: {param: {kernel, bias}}; ``count_sum``: (..., 1) per-cell
    totals, required for "constrained poisson"; ``compute_dtype``:
    optional narrow matmul input dtype (bf16 inputs, f32 accumulation)
    for the head matmuls.  ``include_lgamma_const=False`` omits the
    −lgamma(1+t) constant (no gradient) so a caller evaluating the same
    targets under many groups can add it back once instead of paying the
    in-kernel lgamma per group.  Returns (...,) log-likelihood sums.
    """
    lead_shape = h.shape[:-1]
    hidden = h.shape[-1]
    f = t.shape[-1]
    h2 = h.reshape(-1, hidden)
    shared_t = t.ndim == 2 and h2.shape[0] % t.shape[0] == 0
    t2 = (
        t if shared_t
        else jnp.broadcast_to(t, lead_shape + (f,)).reshape(-1, f)
    )
    if name == "constrained poisson":
        if count_sum is None:
            raise ValueError("constrained poisson requires count_sum")
        if shared_t and t2.shape[0] != h2.shape[0]:
            t2 = jnp.broadcast_to(t, lead_shape + (f,)).reshape(-1, f)
        n2 = jnp.broadcast_to(count_sum, lead_shape + (1,)).reshape(-1, 1)
        out = _fused_constrained_poisson(
            h2, heads["lambda"]["kernel"], heads["lambda"]["bias"], t2, n2
        )
    elif name in _BASE_HEADS:
        ws = tuple(heads[p]["kernel"] for p in _BASE_HEADS[name])
        bs = tuple(heads[p]["bias"] for p in _BASE_HEADS[name])
        out = _make_fused_basic(
            name, compute_dtype,
            subtract_lgamma_const=include_lgamma_const,
        )(h2, ws, bs, t2)
    else:
        raise ValueError(f"No fused likelihood for {name!r}")
    return out.reshape(lead_shape)
