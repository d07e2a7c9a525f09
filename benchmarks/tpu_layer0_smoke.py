"""Quantify the GMVAE shared-layer0 split (VERDICT r02 item 3): the
q(z|x,y_k) encoder computes the dominant (B, F)·(F, H) matmul ONCE and
adds the K one-hot embedding rows, vs the reference-style K reuse=True
subgraphs recomputing it per cluster
(gaussian_mixture_variational_autoencoder.py:2936-3007).

The naive path is forced by (a) patching the config's x-dropout
probability below 1 (the split is disabled under input dropout, whose
mask must be drawn per cluster) while (b) no-op'ing networks.dropout, so
the computed values are identical and only the concat-vs-split structure
differs."""
import sys
import time

import numpy as np

import jax

N_CELLS = 68_579
N_GENES = 2048


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
    import scipy.sparse

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, make_optimizer, gmvae
    from scvae_tpu.models import networks
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
    optimizer = make_optimizer(1e-4)
    B = 512

    def measure(tag, naive):
        config = gmvae.GMVAEConfig(
            feature_size=N_GENES, latent_size=100, hidden_sizes=(256, 256),
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=10, minibatch_normalisation=True,
            dropout_keep_probabilities=(0.0, 0.5) if naive else (),
        )
        saved = networks.dropout
        if naive:
            networks.dropout = lambda rng, x, keep_prob: x  # structure only
        try:
            def loss(params, model_state, batch, rng, warm_up_weight):
                return gmvae.loss_fn(config, params, model_state, batch, rng,
                                     warm_up_weight=warm_up_weight)

            params, state = gmvae.init(config, jax.random.PRNGKey(0))
            ts = create_train_state(params, state, optimizer)
            train_epoch = make_train_epoch(loss, optimizer)
            perm_rng = np.random.RandomState(1)

            def run(n, ts):
                m = None
                for e in range(n):
                    perm = epoch_permutation(N_CELLS, B, perm_rng)
                    ts, m = train_epoch(ts, data, perm,
                                        jax.random.PRNGKey(7), 1.0)
                return ts, float(m["lower_bound"])

            t0 = time.perf_counter()
            ts, lb = run(1, ts)
            log(f"{tag}: first epoch {time.perf_counter()-t0:.1f}s "
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
            log(f"{tag}: {1e3*per_epoch/steps:.3f} ms/step "
                f"({steps*B/per_epoch:,.0f} cells/s)")
            return lb
        finally:
            networks.dropout = saved

    lb_split = measure("split_layer0", naive=False)
    lb_naive = measure("naive_concat", naive=True)
    rel = abs(lb_split - lb_naive) / abs(lb_naive)
    log(f"bound rel diff (identical math expected): {rel:.2e}")
    print("OK")


if __name__ == "__main__":
    main()
