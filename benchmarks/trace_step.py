"""Capture a jax.profiler trace of the production packed training epoch
and print the per-op table (round-4 VERDICT item 3: itemise the ~0.15 ms
of XLA glue + the backward kernel that bound the headline).

Usage: python benchmarks/trace_step.py [batch] [steps]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

N_CELLS = 68_579
N_GENES = 2048
LATENT = 100
HIDDEN = (256, 256)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 33


def main():
    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import scipy.sparse

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, make_optimizer, vae
    from scvae_tpu.models.step import epoch_permutation, make_train_epoch
    from scvae_tpu.utils.profiling import summarize_trace, trace

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
    print(f"packed: {type(data['x']).__name__}", file=sys.stderr)

    config = vae.VAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )
    params, state = vae.init(config, jax.random.PRNGKey(0))
    optimizer = make_optimizer(1e-4)
    ts = create_train_state(params, state, optimizer)

    def loss(params, model_state, batch, rng, warm_up_weight):
        return vae.loss_fn(config, params, model_state, batch, rng,
                           warm_up_weight=warm_up_weight)

    train_epoch = make_train_epoch(loss, optimizer, donate=False)
    perm = epoch_permutation(N_CELLS, BATCH,
                             np.random.RandomState(1))[:STEPS]
    perm = jnp.asarray(perm)

    def run():
        _, m = train_epoch(ts, data, perm, jax.random.PRNGKey(3), 1.0)
        return float(m["lower_bound"])

    run()  # compile + warm
    run()

    trace_dir = "/tmp/scvae_trace_r4"
    with trace(trace_dir):
        run()

    table = summarize_trace(trace_dir, top=40)
    total = sum(e["total_ms"] for e in table)
    print(f"\nTop ops over {STEPS} steps (ms total | per-step | count):")
    for e in table:
        print(f"  {e['total_ms']:9.3f}  {e['total_ms']/STEPS:7.4f}  "
              f"{e['count']:5d}  {e['name'][:90]}")
    print(f"  (sum of listed: {total:.1f} ms; {total/STEPS:.4f} ms/step)")


if __name__ == "__main__":
    main()
