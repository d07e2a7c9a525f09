"""Round-4 step-glue attribution by ablation (VERDICT r03 item 3).

The trace names the kernels (bwd 0.20 ms, fwd 0.13, gather 0.074 of a
0.52 ms step) but the remaining ~0.11 ms is unnamed XLA fusions.  This
script slope-times the production epoch against targeted ablations so
each glue component gets a measured cost:

  baseline      production config (packed gather, fused kernels, bf16)
  x_bf16        gather emits bf16 encoder input directly (kills the
                f32→bf16 cast round trip over the (B, F) batch)
  no_bn         minibatch_normalisation=False (4 batch-norm layers)
  sgd           plain SGD instead of clip(1)+Adam (optimiser IO)
  det_z         deterministic z (no rng normal sampling)
  no_warmup     warm-up weight folded constant

Usage: python benchmarks/tpu_r4_variants.py [batch] [steps]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

N_CELLS = 68_579
N_GENES = 2048
LATENT = 100
HIDDEN = (256, 256)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 33


def slope(fn, k1=2, k2=8, reps=3):
    fn(1)
    t1 = t2 = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fn(k1)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        fn(k2)
        t2 = min(t2, time.perf_counter() - t0)
    return (t2 - t1) / (k2 - k1)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import scipy.sparse

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, vae
    from scvae_tpu.models.step import epoch_permutation, make_train_epoch

    rng_np = np.random.RandomState(0)
    nnz = max(1, int(N_GENES * 0.07))
    rows = np.repeat(np.arange(N_CELLS), nnz)
    cols = rng_np.randint(0, N_GENES, size=rows.shape[0])
    vals = rng_np.poisson(3.0, size=rows.shape[0]).astype(np.float32) + 1.0
    counts = scipy.sparse.csr_matrix((vals, (rows, cols)),
                                     shape=(N_CELLS, N_GENES))
    data = device_resident_data({"x": counts, "t": counts},
                                count_dtype=np.int16)
    jax.block_until_ready(jax.tree_util.tree_leaves(data)[0])

    def build(tag, *, bn=True, opt="clip_adam", batch_dtypes=None,
              deterministic=False, warm_up=1.0):
        config = vae.VAEConfig(
            feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=bn, number_of_warm_up_epochs=200,
        )
        params, state = vae.init(config, jax.random.PRNGKey(0))
        if opt == "clip_adam":
            optimizer = optax.chain(optax.clip(1.0), optax.adam(1e-4))
        elif opt == "adam":
            optimizer = optax.adam(1e-4)
        else:
            optimizer = optax.sgd(1e-4)
        ts = create_train_state(params, state, optimizer)

        def loss(params, model_state, batch, rng, warm_up_weight):
            metrics, outputs = vae.elbo_terms(
                config, params, model_state, batch, rng, training=True,
                warm_up_weight=warm_up_weight,
                deterministic_z=deterministic,
            )
            return -metrics["lower_bound_weighted"], (
                metrics, outputs.new_state
            )

        train_epoch = make_train_epoch(loss, optimizer,
                                       batch_dtypes=batch_dtypes)
        perm = jnp.asarray(
            epoch_permutation(N_CELLS, BATCH, np.random.RandomState(1))
        )
        holder = {"ts": ts}

        def run(n):
            m = None
            for e in range(n):
                holder["ts"], m = train_epoch(
                    holder["ts"], data, perm,
                    jax.random.PRNGKey(3 + e), warm_up,
                )
            v = float(m["lower_bound"])
            assert np.isfinite(v), (tag, v)

        return run

    steps = N_CELLS // BATCH
    results = {}
    variants = [
        ("baseline", {}),
        ("x_bf16", {"batch_dtypes": {"x": jnp.bfloat16}}),
        ("no_bn", {"bn": False}),
        ("adam_noclip", {"opt": "adam"}),
        ("sgd", {"opt": "sgd"}),
        ("det_z", {"deterministic": True}),
    ]
    for tag, kw in variants:
        run = build(tag, **kw)
        per_epoch = slope(run)
        ms = 1e3 * per_epoch / steps
        results[tag] = ms
        delta = ms - results.get("baseline", ms)
        print(f"  {tag:14s} {ms:7.4f} ms/step  "
              f"({steps * BATCH / per_epoch:,.0f} cells/s)"
              + (f"  Δ {delta:+.4f}" if tag != "baseline" else ""),
              flush=True)


if __name__ == "__main__":
    main()
