"""GMVAE grouped-kernel TPU check: the K-cluster likelihood with an
in-kernel group loop vs the flat broadcast path — correctness (identical
first-epoch bound) + slope-timed throughput (VERDICT round-2 item 3)."""
import sys
import time

import numpy as np

import jax

N_CELLS = 68_579
N_GENES = 2048
LATENT = 100
HIDDEN = (256, 256)


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import scipy.sparse

    import scvae_tpu.ops as ops
    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, make_optimizer, gmvae
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
    jax.block_until_ready(data)

    config = gmvae.GMVAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=10, minibatch_normalisation=True,
    )
    optimizer = make_optimizer(1e-4)

    results = {}
    for label, patch in (("grouped", None), ("flat", 1)):
        if patch is not None:
            # force the flat broadcast path by shrinking the group cap
            saved = ops.fused_likelihood._MAX_FUSED_GROUPS
            ops.fused_likelihood._MAX_FUSED_GROUPS = patch
        try:
            def loss(params, model_state, batch, rng, warm_up_weight):
                return gmvae.loss_fn(config, params, model_state, batch, rng,
                                     warm_up_weight=warm_up_weight)

            params, state = gmvae.init(config, jax.random.PRNGKey(0))
            ts = create_train_state(params, state, optimizer)
            train_epoch = make_train_epoch(loss, optimizer)
            perm_rng = np.random.RandomState(1)
            B = 512

            def run(n, ts):
                m = None
                for e in range(n):
                    perm = epoch_permutation(N_CELLS, B, perm_rng)
                    ts, m = train_epoch(ts, data, perm,
                                        jax.random.PRNGKey(7), 1.0)
                return ts, float(m["lower_bound"])

            t0 = time.perf_counter()
            ts, lb = run(1, ts)
            log(f"{label}: first epoch {time.perf_counter()-t0:.1f}s "
                f"lb={lb:.4f}")
            t1 = t2 = np.inf
            for _ in range(3):
                t0 = time.perf_counter()
                ts, _ = run(1, ts)
                t1 = min(t1, time.perf_counter() - t0)
                t0 = time.perf_counter()
                ts, _ = run(4, ts)
                t2 = min(t2, time.perf_counter() - t0)
            per_epoch = (t2 - t1) / 3
            steps = N_CELLS // B
            results[label] = (lb, per_epoch)
            log(f"{label}: {1e3*per_epoch/steps:.3f} ms/step "
                f"({steps*B/per_epoch:,.0f} cells/s)")
        finally:
            if patch is not None:
                ops.fused_likelihood._MAX_FUSED_GROUPS = saved

    lb_g, _ = results["grouped"]
    lb_f, _ = results["flat"]
    rel = abs(lb_g - lb_f) / abs(lb_f)
    log(f"first-epoch bounds: grouped={lb_g:.4f} flat={lb_f:.4f} "
        f"rel={rel:.2e}")
    assert rel < 2e-4
    print("OK")


if __name__ == "__main__":
    main()
