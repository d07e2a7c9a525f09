"""Post-optimisation TPU check: gather dedup (FieldAlias) + forward
kernel weight-resident grid.  Slope-timed VAE-NB (B=2048) and GMVAE-NB
(B=512, B=1024)."""
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

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, make_optimizer, gmvae, vae
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

    def measure(module, config, batch_size, tag, expect_lb=None):
        def loss(params, model_state, batch, rng, warm_up_weight):
            return module.loss_fn(config, params, model_state, batch, rng,
                                  warm_up_weight=warm_up_weight)

        params, state = module.init(config, jax.random.PRNGKey(0))
        ts = create_train_state(params, state, optimizer)
        train_epoch = make_train_epoch(loss, optimizer)
        perm_rng = np.random.RandomState(1)

        def run(n, ts):
            m = None
            for e in range(n):
                perm = epoch_permutation(N_CELLS, batch_size, perm_rng)
                ts, m = train_epoch(ts, data, perm,
                                    jax.random.PRNGKey(7), 1.0)
            return ts, float(m["lower_bound"])

        t0 = time.perf_counter()
        ts, lb = run(1, ts)
        log(f"{tag}: first epoch {time.perf_counter()-t0:.1f}s lb={lb:.4f}")
        if expect_lb is not None:
            rel = abs(lb - expect_lb) / abs(expect_lb)
            log(f"{tag}: vs expected lb rel {rel:.2e}")
            assert rel < 1e-4, (lb, expect_lb)
        t1 = t2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            ts, _ = run(1, ts)
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            ts, _ = run(4, ts)
            t2 = min(t2, time.perf_counter() - t0)
        per_epoch = (t2 - t1) / 3
        steps = N_CELLS // batch_size
        log(f"{tag}: {1e3*per_epoch/steps:.3f} ms/step "
            f"({steps*batch_size/per_epoch:,.0f} cells/s)")

    v = vae.VAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )
    gm = gmvae.GMVAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=10, minibatch_normalisation=True,
    )
    # expected bounds from the pre-optimisation runs (same seeds): the
    # dedup + grid swap must not change the math
    measure(vae, v, 2048, "vae_nb", expect_lb=-1810.8478)
    measure(gmvae, gm, 512, "gmvae_b512", expect_lb=-1423.6277)
    measure(gmvae, gm, 1024, "gmvae_b1024")
    print("OK")


if __name__ == "__main__":
    main()
