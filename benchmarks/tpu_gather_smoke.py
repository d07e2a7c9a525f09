"""One consolidated TPU check for the packed Pallas gather path:
correctness (packed vs unpacked epoch curves identical) and slope-timed
epoch cost for both.  Kept to 4 compiled programs — the remote compile
service is slow, so exploration happens here, not in many tiny runs.
"""
import sys
import time

import numpy as np

import jax

N_CELLS = 68_579
N_GENES = 2048
BATCH = 2048
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
    from scvae_tpu.models import create_train_state, make_optimizer, vae
    from scvae_tpu.models.step import epoch_permutation, make_train_epoch

    rng_np = np.random.RandomState(0)
    nnz = max(1, int(N_GENES * 0.07))
    rows = np.repeat(np.arange(N_CELLS), nnz)
    cols = rng_np.randint(0, N_GENES, size=rows.shape[0])
    vals = rng_np.poisson(3.0, size=rows.shape[0]).astype(np.float32) + 1.0
    counts = scipy.sparse.csr_matrix((vals, (rows, cols)),
                                     shape=(N_CELLS, N_GENES))

    config = vae.VAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )
    optimizer = make_optimizer(1e-4)

    def loss(params, model_state, batch, rng, warm_up_weight):
        return vae.loss_fn(config, params, model_state, batch, rng,
                           warm_up_weight=warm_up_weight)

    results = {}
    curves = {}
    for packed in (False, True):
        log(f"staging packed={packed}…")
        data = device_resident_data({"x": counts, "t": counts},
                                    count_dtype=np.int16, packed=packed)
        jax.block_until_ready(data)
        params, state = vae.init(config, jax.random.PRNGKey(0))
        ts = create_train_state(params, state, optimizer)
        train_epoch = make_train_epoch(loss, optimizer)
        perm_rng = np.random.RandomState(1)

        def run(n, ts):
            m = None
            for e in range(n):
                perm = epoch_permutation(N_CELLS, BATCH, perm_rng)
                ts, m = train_epoch(ts, data, perm, jax.random.PRNGKey(7), 1.0)
            return ts, float(m["lower_bound"])

        log("warmup/compile…")
        t0 = time.perf_counter()
        ts, lb = run(1, ts)
        log(f"first epoch (incl. compile): {time.perf_counter()-t0:.1f}s "
            f"lb={lb:.2f}")
        curves[packed] = lb
        t1 = t2 = np.inf
        for _ in range(3):
            t0 = time.perf_counter()
            ts, _ = run(2, ts)
            t1 = min(t1, time.perf_counter() - t0)
            t0 = time.perf_counter()
            ts, _ = run(8, ts)
            t2 = min(t2, time.perf_counter() - t0)
        per_epoch = (t2 - t1) / 6
        steps = N_CELLS // BATCH
        results[packed] = per_epoch
        log(f"packed={packed}: {1e3*per_epoch/steps:.3f} ms/step "
            f"({steps*BATCH/per_epoch:,.0f} cells/s)")

    # identical seeds → identical first-epoch bound (both paths gather the
    # same rows; reduction orders differ only inside the likelihood sum)
    log(f"first-epoch bounds: unpacked={curves[False]:.4f} "
        f"packed={curves[True]:.4f} "
        f"rel diff={abs(curves[True]-curves[False])/abs(curves[False]):.2e}")
    assert abs(curves[True] - curves[False]) / abs(curves[False]) < 1e-4
    print("OK")


if __name__ == "__main__":
    main()
