"""Million-cell scale exercise: VAE-NB training on 1M cells × 2048 genes.

Demonstrates both data placements at the 1M-cell mouse-brain scale
(SURVEY.md §7 phase 5) on one chip:

* ``device`` — int16-resident data (4 GiB HBM) + whole-epoch
  ``lax.scan``: the path a 1M-cell dataset takes under the narrowest-
  count-dtype budget (``VariationalAutoencoder.DEVICE_DATA_BUDGET_BYTES``).
  The count matrix is synthesised **on device** so the exercise measures
  the training engine, not this environment's tunnelled host link (the
  axon tunnel moves ~20 MB/s; a real TPU host's DMA moves GB/s and stages
  4 GiB in seconds).
* ``streaming`` — host CSR → C++ densify → per-step transfer (the
  larger-than-HBM fallback), run on a capped cell count because each
  16 MB batch costs ~0.8 s on the tunnel.  The reported number is
  host-link-bound here by design.

Usage: ``python benchmarks/million_cell.py [n_cells] [n_epochs] [streaming_cells]``
Prints one JSON line per placement with cells/sec.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import scipy.sparse

# Running as ``python benchmarks/million_cell.py`` puts benchmarks/ (not
# the repo root) on sys.path; add the root so scvae_tpu imports.
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def synth_counts_csr(n_cells: int, n_genes: int, density: float = 0.07):
    """PBMC-sparsity synthetic counts as canonical CSR in O(nnz) without a
    sort: structured unique column indices per row (a stride pattern
    coprime with n_genes), values Poisson(3)+1 — int16-eligible."""
    rng = np.random.RandomState(0)
    nnz = max(1, int(n_genes * density))
    stride = 17  # gcd(17, n_genes) == 1 for power-of-two n_genes
    offsets = (np.arange(nnz, dtype=np.int64) * stride) % n_genes
    starts = rng.randint(0, n_genes, size=n_cells).astype(np.int64)
    cols = ((starts[:, None] + offsets[None, :]) % n_genes).reshape(-1)
    # canonical CSR wants sorted columns per row; sort each row's small
    # nnz block (cheap: n_cells × nnz·log nnz)
    cols = np.sort(cols.reshape(n_cells, nnz), axis=1).reshape(-1)
    vals = rng.poisson(3.0, size=cols.shape[0]).astype(np.float32) + 1.0
    indptr = np.arange(n_cells + 1, dtype=np.int64) * nnz
    return scipy.sparse.csr_matrix(
        (vals, cols.astype(np.int32), indptr), shape=(n_cells, n_genes)
    )


def synth_counts_device(n_cells: int, n_genes: int, density: float = 0.07):
    """Generate the same statistics directly in HBM as int16 (chunked to
    bound the generation working set)."""
    import jax
    import jax.numpy as jnp

    chunk = 65536

    @jax.jit
    def gen(key):
        k1, k2 = jax.random.split(key)
        mask = jax.random.uniform(k1, (chunk, n_genes)) < density
        counts = jax.random.poisson(k2, 3.0, (chunk, n_genes)) + 1
        return jnp.where(mask, counts, 0).astype(jnp.int16)

    n_chunks = -(-n_cells // chunk)
    parts = [gen(jax.random.PRNGKey(1000 + i)) for i in range(n_chunks)]
    x = jnp.concatenate(parts, axis=0)[:n_cells]
    return jax.block_until_ready(x)


def main() -> None:
    n_cells = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    n_epochs = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    streaming_cells = int(sys.argv[3]) if len(sys.argv) > 3 else 100_000
    n_genes = 2048
    batch = 2048

    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir", "/tmp/scvae_tpu_jax_cache"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from scvae_tpu.models import vae, create_train_state, make_optimizer
    from scvae_tpu.models import step, training
    from scvae_tpu.data.pipeline import BatchPipeline

    config = vae.VAEConfig(
        feature_size=n_genes,
        latent_size=100,
        hidden_sizes=(256, 256),
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True,
        number_of_warm_up_epochs=200,
    )
    rng = jax.random.PRNGKey(0)
    params, state = vae.init(config, rng)
    optimizer = make_optimizer(1e-4)

    def loss(params, model_state, batch_dict, rng, warm_up_weight):
        return vae.loss_fn(
            config, params, model_state, batch_dict, rng,
            warm_up_weight=warm_up_weight,
        )

    # ---- device placement: int16-resident + whole-epoch scan -------------
    print(
        f"generating {n_cells:,} cells × {n_genes} genes in HBM…",
        file=sys.stderr,
        flush=True,
    )
    t0 = time.perf_counter()
    x_dev = synth_counts_device(n_cells, n_genes)
    gen_s = time.perf_counter() - t0
    print(
        f"generated {x_dev.nbytes / 2**30:.2f} GiB int16 in {gen_s:.1f}s",
        file=sys.stderr,
        flush=True,
    )
    # DMA-aligned packed layout + alias so the training scan uses the
    # Pallas row gather once per step (device-side reshape; same bytes)
    from scvae_tpu.ops.gather import FieldAlias, PackedRows, can_pack

    if jax.default_backend() == "tpu" and can_pack(
        n_cells, n_genes, np.int16
    ):
        a = 16  # int16 sublane alignment
        packed = PackedRows(
            data=x_dev.reshape(n_cells * a, n_genes // a),
            n_rows=n_cells,
            n_cols=n_genes,
        )
        data = {"x": packed, "t": FieldAlias("x")}
    else:
        data = {"x": x_dev, "t": x_dev}

    train_epoch = step.make_train_epoch(loss, optimizer)
    train_state = create_train_state(params, state, optimizer)
    perm_rng = np.random.RandomState(1)
    steps_per_epoch = n_cells // batch

    perm = step.epoch_permutation(n_cells, batch, perm_rng)
    print("compiling + warmup epoch…", file=sys.stderr, flush=True)
    train_state, metrics = train_epoch(
        train_state, data, perm, jax.random.PRNGKey(2), 1.0
    )
    float(metrics["lower_bound"])

    times = []
    for e in range(n_epochs):
        perm = step.epoch_permutation(n_cells, batch, perm_rng)
        t0 = time.perf_counter()
        train_state, metrics = train_epoch(
            train_state, data, perm, jax.random.PRNGKey(3 + e), 1.0
        )
        lb = float(metrics["lower_bound"])
        times.append(time.perf_counter() - t0)
    best = min(times)
    print(json.dumps({
        "metric": f"cells/sec/chip, VAE-NB device-resident, {n_cells:,} cells",
        "value": round(steps_per_epoch * batch / best, 1),
        "unit": "cells/sec/chip",
        "epoch_seconds": round(best, 2),
        "lower_bound": round(lb, 2),
    }))
    # ---- BASELINE config 5: streamed IW-ELBO evaluation + latent
    # extraction over the full 1M cells (round 3, VERDICT item 6) --------
    def eval_fn(p, s, batch_dict, r):
        metrics, _ = vae.elbo_terms(
            config, p, s, batch_dict, r, training=False, n_iw=8, n_mc=1,
        )
        return metrics

    eval_epoch = step.make_eval_epoch(eval_fn)
    eval_batch = 1024
    idx = step.sequential_batches(n_cells, eval_batch)
    print("IW-ELBO (R=8) evaluation pass…", file=sys.stderr, flush=True)
    out = eval_epoch(
        train_state.params, train_state.model_state, data, idx,
        jax.random.PRNGKey(11),
    )
    float(out["lower_bound"])  # compile+warm
    t0 = time.perf_counter()
    out = eval_epoch(
        train_state.params, train_state.model_state, data, idx,
        jax.random.PRNGKey(12),
    )
    iw_lb = float(out["lower_bound"])
    iw_s = time.perf_counter() - t0
    print(json.dumps({
        "metric": (
            f"cells/sec/chip, IW-ELBO (R=8) evaluation, {n_cells:,} cells"
        ),
        "value": round(idx.size / iw_s, 1),
        "unit": "cells/sec/chip",
        "pass_seconds": round(iw_s, 2),
        "iw_lower_bound": round(iw_lb, 2),
    }))

    # latent extraction: q(z|x) means for every cell, kept device-side
    # (fetching 1M×100 f32 crosses the ~20 MB/s tunnel; a real host DMAs
    # it in <1 s — the chip-side throughput is the portable number)
    import jax.numpy as jnp

    @jax.jit
    def latent_epoch(p, s, data, idx):
        def body(_, batch_idx):
            batch = step.cast_batch_to_f32(step.gather_batch(data, batch_idx))
            z = vae.latent_means(config, p, s, batch["x"])
            return (), jnp.sum(z)

        _, sums = jax.lax.scan(body, (), idx)
        return jnp.sum(sums)

    checksum = float(latent_epoch(
        train_state.params, train_state.model_state, data, idx))  # compile
    t0 = time.perf_counter()
    checksum = float(latent_epoch(
        train_state.params, train_state.model_state, data, idx))
    lat_s = time.perf_counter() - t0
    assert np.isfinite(checksum)
    print(json.dumps({
        "metric": (
            f"cells/sec/chip, latent extraction (q_z means), "
            f"{n_cells:,} cells"
        ),
        "value": round(idx.size / lat_s, 1),
        "unit": "cells/sec/chip",
        "pass_seconds": round(lat_s, 2),
    }))

    del data, x_dev, train_state

    # ---- streaming placement: host pipeline, per-step transfer -----------
    print(
        f"building {streaming_cells:,}-cell host CSR for streaming…",
        file=sys.stderr,
        flush=True,
    )
    values = synth_counts_csr(streaming_cells, n_genes)
    train_step = step.make_train_step(loss, optimizer, donate=False)

    def stream_epoch(wire_format):
        """One streamed epoch; returns (cells/s, lower bound, wire MB)."""
        from scvae_tpu.data.pipeline import CSRWire

        params, state = vae.init(config, jax.random.PRNGKey(0))
        train_state = create_train_state(params, state, optimizer)
        pipe = BatchPipeline(
            {"x": values, "t": values}, batch, shuffle=True, seed=0,
            count_dtype=(np.int16, np.int32), wire_format=wire_format,
        )
        # wire bytes of the first batch (all full batches are equal-size)
        first = next(iter(pipe.epoch()))
        x = first["x"]
        if isinstance(x, CSRWire):
            batch_bytes = sum(
                np.asarray(a).nbytes for a in (x.data, x.cols, x.rows)
            )
        else:
            batch_bytes = np.asarray(x).nbytes
        # warmup/compile on one batch
        train_state, m = train_step(
            train_state, first, jax.random.PRNGKey(9), 1.0
        )
        float(m["lower_bound"])
        run_epoch = training.streaming_epoch_runner(
            train_step,
            lambda epoch: BatchPipeline(
                {"x": values, "t": values}, batch, shuffle=True,
                seed=epoch, count_dtype=(np.int16, np.int32),
                wire_format=wire_format,
            ),
        )
        t0 = time.perf_counter()
        train_state, metrics = run_epoch(
            train_state, 0, 1.0, jax.random.PRNGKey(10)
        )
        stream_s = time.perf_counter() - t0
        return (
            streaming_cells / stream_s,
            float(metrics["lower_bound"]),
            batch_bytes * (streaming_cells / batch) / 2**20,
            stream_s,
        )

    print("streaming epoch (dense int16 wire)…", file=sys.stderr,
          flush=True)
    dense_cps, dense_lb, dense_mb, dense_s = stream_epoch("dense")
    print("streaming epoch (CSR wire)…", file=sys.stderr, flush=True)
    csr_cps, csr_lb, csr_mb, csr_s = stream_epoch("csr")
    print(json.dumps({
        "metric": (
            f"cells/sec/chip, VAE-NB streaming, {streaming_cells:,} cells "
            "(host-link-bound on the tunnelled chip)"
        ),
        "value": round(csr_cps, 1),
        "unit": "cells/sec/chip",
        "epoch_seconds": round(csr_s, 2),
        "lower_bound": round(csr_lb, 2),
        "wire_mb_per_epoch": round(csr_mb, 1),
        "dense_wire": {
            "cells_per_sec": round(dense_cps, 1),
            "epoch_seconds": round(dense_s, 2),
            "lower_bound": round(dense_lb, 2),
            "wire_mb_per_epoch": round(dense_mb, 1),
        },
        "wire_reduction": round(dense_mb / max(csr_mb, 1e-9), 2),
    }))


if __name__ == "__main__":
    main()
