"""Mesh-composable fused likelihood kernels.

The fused decoder-head + likelihood kernels (``ops.fused_likelihood``)
are Pallas custom calls, which GSPMD cannot partition — under a device
mesh the plain entry points would be replicated (or fail to lower).
This module wraps the raw forward/backward kernels in ``jax.shard_map``
so the fast path composes with data AND tensor parallelism:

* rows (cells × samples) shard over the ``data`` axis — each device runs
  the kernel on its own batch block, zero collectives in the forward;
* the per-gene reconstruction heads shard over the ``model`` axis — each
  device computes the row-sum of log-likelihood over ITS gene block and a
  ``psum`` over ``model`` completes the feature reduction (log p(x|z) is
  additive over genes for every fused likelihood except constrained
  Poisson, whose gene-softmax couples features — it shards over ``data``
  only, heads replicated);
* the custom VJP lives OUTSIDE the shard_map: the backward shard_map
  psums head-weight gradients over ``data`` (each data shard contributes
  its rows) and hidden-state gradients over ``model`` (each model shard
  contributes its gene block) explicitly, so no reliance on shard_map's
  transpose machinery through Pallas calls.

Reference counterpart: none — the reference is single-device
(``scvae/models/variational_autoencoder.py:887``); this is the
scale-out path of SURVEY.md §7 Phase 4.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from scvae_tpu.ops.fused_likelihood import (
    _BASE_GRADS,
    _BASE_HEADS,
    _BASE_LL,
    _categorised_grads,
    _categorised_head_list,
    _categorised_ll,
    _cp_fused_backward,
    _cp_fused_forward,
    _fused_backward,
    _fused_forward,
)


def _resolve_ll(ll_key):
    if isinstance(ll_key, tuple):  # ("categorised", base_name, k)
        _, base_name, k = ll_key
        n_base = len(_BASE_HEADS[base_name])
        return (
            _categorised_ll(base_name, n_base, k),
            _categorised_grads(base_name, n_base, k),
        )
    return _BASE_LL[ll_key], _BASE_GRADS[ll_key]


def _can_split_model(mesh, model_axis, f: int) -> bool:
    """Gene-axis (model) split applies only when the feature count
    divides the axis — otherwise the heads stay replicated inside the
    shard_map (each model shard computes the full F redundantly, exactly
    what GSPMD replication would do)."""
    return (
        model_axis is not None
        and model_axis in mesh.axis_names
        and mesh.shape[model_axis] > 1
        and f % mesh.shape[model_axis] == 0
    )


@functools.lru_cache(maxsize=None)
def _make_sharded_fused(
    mesh,
    data_axis: str,
    model_axis: str | None,
    ll_key,
    compute_dtype,
    subtract_lgamma_const: bool,
    split_model: bool,
):
    """Build ``fused(h3, ws, bs, t) → (G, B)`` under ``mesh``.

    ``h3`` is (G, B, H) — lead axes flattened to G with the batch axis
    explicit so its sharding survives (merging a sharded axis in a
    reshape would force an all-gather); ``t`` is (B, F) shared across the
    G groups via the kernels' cycling t index map."""
    ll_fn, grads_fn = _resolve_ll(ll_key)
    n_data = mesh.shape[data_axis]
    h_spec = P(None, data_axis, None)
    w_spec = P(None, model_axis) if split_model else P(None, None)
    b_spec = P(model_axis) if split_model else P(None)
    t_spec = P(data_axis, model_axis) if split_model else P(data_axis)
    rows_spec = P(None, data_axis)

    def fwd_local(h3, ws, bs, t):
        g, b_local, hidden = h3.shape
        rows = _fused_forward(
            ll_fn, h3.reshape(g * b_local, hidden), ws, bs, t,
            subtract_lgamma_const=subtract_lgamma_const,
            compute_dtype=compute_dtype, t_groups=g,
        ).reshape(g, b_local)
        if split_model:
            rows = jax.lax.psum(rows, model_axis)
        return rows

    sm_fwd = jax.shard_map(
        fwd_local, mesh=mesh,
        in_specs=(h_spec, w_spec, b_spec, t_spec),
        out_specs=rows_spec, check_vma=False,
    )

    def bwd_local(h3, ws, bs, t, gbar):
        g, b_local, hidden = h3.shape
        dh, dws, dbs = _fused_backward(
            grads_fn, h3.reshape(g * b_local, hidden), ws, bs, t,
            gbar.reshape(g * b_local),
            compute_dtype=compute_dtype, t_groups=g,
        )
        if split_model:
            # each model shard saw only its gene block of the heads
            dh = jax.lax.psum(dh, model_axis)
        if n_data > 1:
            # each data shard saw only its rows
            dws = jax.lax.psum(tuple(dws), data_axis)
            dbs = jax.lax.psum(tuple(dbs), data_axis)
        return dh.reshape(g, b_local, hidden), tuple(dws), tuple(dbs)

    sm_bwd = jax.shard_map(
        bwd_local, mesh=mesh,
        in_specs=(h_spec, w_spec, b_spec, t_spec, rows_spec),
        out_specs=(h_spec, w_spec, b_spec), check_vma=False,
    )

    @jax.custom_vjp
    def fused(h3, ws, bs, t):
        return sm_fwd(h3, ws, bs, t)

    def fwd(h3, ws, bs, t):
        return fused(h3, ws, bs, t), (h3, ws, bs, t)

    def bwd(residuals, gbar):
        h3, ws, bs, t = residuals
        dh, dws, dbs = sm_bwd(h3, ws, bs, t, gbar)
        return dh, dws, dbs, jnp.zeros_like(t)

    fused.defvjp(fwd, bwd)
    return fused


@functools.lru_cache(maxsize=None)
def _make_sharded_constrained_poisson(mesh, data_axis: str):
    """Constrained Poisson under a mesh: rows shard over ``data``; the
    gene softmax couples features, so the lambda head stays replicated
    (a ``model``-sharded copy is all-gathered by jit at the boundary)."""
    n_data = mesh.shape[data_axis]
    h_spec = P(None, data_axis, None)
    row_spec = P(None, data_axis)
    t_spec = P(data_axis)

    def fwd_local(h3, w, b, t, n):
        g, b_local, hidden = h3.shape
        f = t.shape[-1]
        t2 = jnp.broadcast_to(t, (g,) + t.shape).reshape(g * b_local, f)
        n2 = jnp.broadcast_to(n, (g,) + n.shape).reshape(g * b_local, 1)
        ll, lse = _cp_fused_forward(
            h3.reshape(g * b_local, hidden), w, b, t2, n2
        )
        return ll.reshape(g, b_local), lse.reshape(g, b_local)

    sm_fwd = jax.shard_map(
        fwd_local, mesh=mesh,
        in_specs=(h_spec, P(None, None), P(None), t_spec, t_spec),
        out_specs=(row_spec, row_spec), check_vma=False,
    )

    def bwd_local(h3, w, b, t, lse, gbar):
        g, b_local, hidden = h3.shape
        f = t.shape[-1]
        t2 = jnp.broadcast_to(t, (g,) + t.shape).reshape(g * b_local, f)
        dh, dw, db = _cp_fused_backward(
            h3.reshape(g * b_local, hidden), w, b, t2,
            lse.reshape(g * b_local), gbar.reshape(g * b_local),
        )
        if n_data > 1:
            dw = jax.lax.psum(dw, data_axis)
            db = jax.lax.psum(db, data_axis)
        return dh.reshape(g, b_local, hidden), dw, db

    sm_bwd = jax.shard_map(
        bwd_local, mesh=mesh,
        in_specs=(h_spec, P(None, None), P(None), t_spec, row_spec,
                  row_spec),
        out_specs=(h_spec, P(None, None), P(None)), check_vma=False,
    )

    @jax.custom_vjp
    def fused(h3, w, b, t, n):
        ll, _lse = sm_fwd(h3, w, b, t, n)
        return ll

    def fwd(h3, w, b, t, n):
        ll, lse = sm_fwd(h3, w, b, t, n)
        return ll, (h3, w, b, t, n, lse)

    def bwd(residuals, gbar):
        h3, w, b, t, n, lse = residuals
        dh, dw, db = sm_bwd(h3, w, b, t, lse, gbar)
        # d ll / d n = (Σ_f t)/n − 1, summed over the G groups sharing n
        sx = jnp.sum(t, axis=-1)  # (B,)
        dn_rows = gbar * (sx[None, :] / n.reshape(1, -1) - 1.0)  # (G, B)
        dn = jnp.sum(dn_rows, axis=0).reshape(n.shape)
        return dh, dw, db, jnp.zeros_like(t), dn

    fused.defvjp(fwd, bwd)
    return fused


def _lead_to_groups(h: jax.Array, b: int) -> tuple[jax.Array, tuple]:
    lead_shape = h.shape[:-1]
    if h.shape[-2] != b:
        raise ValueError(
            f"h batch axis {h.shape[-2]} does not match t rows {b}"
        )
    return h.reshape((-1, b, h.shape[-1])), lead_shape


def sharded_fused_log_likelihood(
    name: str,
    h: jax.Array,
    heads,
    t: jax.Array,
    *,
    mesh,
    count_sum: jax.Array | None = None,
    compute_dtype=None,
    include_lgamma_const: bool = True,
    data_axis: str = "data",
    model_axis: str | None = "model",
) -> jax.Array:
    """Mesh-composable twin of ``ops.fused_log_likelihood``.

    ``h``: (..., B, H) decoder output with the batch axis second-to-last
    (its ``data`` sharding is preserved); ``t``: (B, F) targets shared by
    all lead groups.  ``B`` must divide the ``data`` axis size."""
    b, f = t.shape
    n_data = mesh.shape[data_axis]
    if b % n_data:
        raise ValueError(
            f"batch {b} not divisible by data axis size {n_data}"
        )
    h3, lead_shape = _lead_to_groups(h, b)
    if name == "constrained poisson":
        if count_sum is None:
            raise ValueError("constrained poisson requires count_sum")
        n2 = jnp.reshape(count_sum, (b,))
        out = _make_sharded_constrained_poisson(mesh, data_axis)(
            h3, heads["lambda"]["kernel"], heads["lambda"]["bias"], t, n2
        )
    elif name in _BASE_HEADS:
        ws = tuple(heads[p]["kernel"] for p in _BASE_HEADS[name])
        bs = tuple(heads[p]["bias"] for p in _BASE_HEADS[name])
        out = _make_sharded_fused(
            mesh, data_axis, model_axis, name, compute_dtype,
            include_lgamma_const,
            _can_split_model(mesh, model_axis, f),
        )(h3, ws, bs, t)
    else:
        raise ValueError(f"No fused likelihood for {name!r}")
    return out.reshape(lead_shape)


def sharded_fused_categorised_log_likelihood(
    name: str,
    h: jax.Array,
    heads,
    cat_kernel: jax.Array,
    cat_bias: jax.Array,
    t: jax.Array,
    *,
    mesh,
    compute_dtype=None,
    data_axis: str = "data",
    model_axis: str | None = "model",
) -> jax.Array:
    """Mesh-composable twin of ``ops.fused_categorised_log_likelihood``
    (the per-feature class log-softmax is feature-local, so the gene-axis
    ``model`` split applies to the class heads too)."""
    b, f = t.shape
    n_data = mesh.shape[data_axis]
    if b % n_data:
        raise ValueError(
            f"batch {b} not divisible by data axis size {n_data}"
        )
    h3, lead_shape = _lead_to_groups(h, b)
    k = cat_kernel.shape[0] - 1
    ws, bs = _categorised_head_list(name, heads, cat_kernel, cat_bias)
    out = _make_sharded_fused(
        mesh, data_axis, model_axis, ("categorised", name, k),
        compute_dtype, False,
        _can_split_model(mesh, model_axis, f),
    )(h3, ws, bs, t)
    return out.reshape(lead_shape)
