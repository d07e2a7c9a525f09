"""Decompose the VAE-NB training step to find where the time goes.

The round-2 headline was 1.55 ms/step at B=2048 (F=2048, H=256,256, D=100)
while the matmuls cost ~0.11 ms at peak — ~93% of the step is NOT matmul
(VERDICT round 2, missing #2).  This script times each piece of the step in
isolation on the real chip so the optimisation targets are measured, not
guessed.  Pieces:

  epoch            full train epoch (the bench headline path)
  fixed_batch      same step scanned with a fixed device batch (no gather)
  gather_cast      jnp.take of x+t rows and int16→f32 cast only
  rng_sample       jax.random.split + normal sample only
  fwd_bwd_fused    value_and_grad of the loss on a fixed batch (no optax)
  likelihood       value_and_grad of the fused NB likelihood only
  likelihood_xla   value_and_grad of the unfused jnp likelihood only
  trunk            encoder+decoder MLPs forward+backward only (no heads)
  adam             optax clip+adam update only

Run:  python benchmarks/profile_step.py [batch] [steps]
"""

from __future__ import annotations

import sys
import time

import numpy as np

import jax
import jax.numpy as jnp


N_CELLS = 68_579
N_GENES = 2048
LATENT = 100
HIDDEN = (256, 256)
BATCH = int(sys.argv[1]) if len(sys.argv) > 1 else 2048
STEPS = int(sys.argv[2]) if len(sys.argv) > 2 else 33


def timed(fn, *args, n=5):
    """Best wall time of jitted fn over n runs; host-fetch sync."""
    out = fn(*args)
    jax.block_until_ready(out)
    float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
    best = np.inf
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args)
        float(np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[0])
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import create_train_state, make_optimizer, vae
    from scvae_tpu.models.step import epoch_permutation, make_train_epoch

    try:
        jax.config.update("jax_compilation_cache_dir",
                          "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import scipy.sparse

    rng_np = np.random.RandomState(0)
    nnz = max(1, int(N_GENES * 0.07))
    rows = np.repeat(np.arange(N_CELLS), nnz)
    cols = rng_np.randint(0, N_GENES, size=rows.shape[0])
    vals = rng_np.poisson(3.0, size=rows.shape[0]).astype(np.float32) + 1.0
    counts = scipy.sparse.csr_matrix((vals, (rows, cols)),
                                     shape=(N_CELLS, N_GENES))
    # unpacked here: this script decomposes the historical jnp.take path;
    # benchmarks/tpu_gather_smoke.py measures packed vs unpacked
    data = device_resident_data({"x": counts, "t": counts},
                                count_dtype=np.int16, packed=False)
    jax.block_until_ready(data["x"])
    print(f"data aliased: {data['x'] is data['t']}", file=sys.stderr)

    config = vae.VAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )
    rng = jax.random.PRNGKey(0)
    params, state = vae.init(config, rng)
    optimizer = make_optimizer(1e-4)
    ts = create_train_state(params, state, optimizer)

    def loss(params, model_state, batch, rng, warm_up_weight):
        return vae.loss_fn(config, params, model_state, batch, rng,
                           warm_up_weight=warm_up_weight)

    perm_rng = np.random.RandomState(1)
    perm = epoch_permutation(N_CELLS, BATCH, perm_rng)[:STEPS]

    results: dict[str, float] = {}

    # -- 0. dispatch+fetch floor: the tunnelled platform pays a host RTT on
    # the sync fetch; every number below contains it, so report it and use
    # slope timing for the headline.
    floor_fn = jax.jit(lambda s: jnp.sum(jax.lax.scan(
        lambda c, _: (c + 1.0, None), s, jnp.arange(4))[0]))
    floor = timed(floor_fn, 0.0)
    print(f"  fetch+dispatch floor: {floor * 1e3:.3f} ms/call", file=sys.stderr)
    results["floor_ms_per_call"] = floor * 1e3 / STEPS  # per-step share

    # -- 1. full epoch -----------------------------------------------------
    train_epoch = make_train_epoch(loss, optimizer)

    def run_epoch(ts):
        new_ts, metrics = train_epoch(ts, data, perm, jax.random.PRNGKey(3),
                                      1.0)
        return metrics["lower_bound"]

    # keep ts alive (donated inside) — copy for each call
    epoch_no_donate = make_train_epoch(loss, optimizer, jit=False)
    epoch_jit = jax.jit(lambda ts, data, perm: epoch_no_donate(
        ts, data, perm, jax.random.PRNGKey(3), 1.0)[1]["lower_bound"])
    results["epoch"] = timed(epoch_jit, ts, data, perm) / STEPS
    perm4 = epoch_permutation(N_CELLS, BATCH, np.random.RandomState(7),
                              )[:STEPS] if False else None
    # slope: 4x steps by tiling the permutation (scan length is static)
    perm_long = np.concatenate([perm] * 4, axis=0)
    t_long = timed(epoch_jit, ts, data, perm_long)
    t_short = timed(epoch_jit, ts, data, perm)
    results["epoch_slope"] = (t_long - t_short) / (3 * STEPS)

    # -- 2. fixed batch (no gather) ---------------------------------------
    fixed = {k: jnp.asarray(np.asarray(v[:BATCH]), v.dtype)
             for k, v in data.items()}
    jax.block_until_ready(fixed["x"])

    def fixed_epoch(ts, fixed):
        from scvae_tpu.models.step import cast_batch_to_f32

        def body(carry, i):
            ts, rng = carry
            rng, sub = jax.random.split(rng)
            batch = cast_batch_to_f32(fixed)
            (l, (m, new_state)), grads = jax.value_and_grad(
                loss, has_aux=True)(ts.params, ts.model_state, batch, sub, 1.0)
            updates, new_opt = optimizer.update(grads, ts.opt_state, ts.params)
            import optax
            new_params = optax.apply_updates(ts.params, updates)
            from scvae_tpu.models.step import TrainState
            return (TrainState(new_params, new_state, new_opt, ts.step + 1),
                    rng), m["lower_bound"]

        (_, _), lbs = jax.lax.scan(body, (ts, jax.random.PRNGKey(3)),
                                   jnp.arange(STEPS))
        return jnp.mean(lbs)

    results["fixed_batch"] = timed(jax.jit(fixed_epoch), ts, fixed) / STEPS

    # -- 3. gather + cast only --------------------------------------------
    def gather_epoch(perm, data):
        from scvae_tpu.models.step import cast_batch_to_f32

        def body(acc, idx):
            batch = cast_batch_to_f32(
                {k: jnp.take(v, idx, axis=0) for k, v in data.items()})
            return acc + jnp.sum(batch["x"][:, 0]) + jnp.sum(
                batch["t"][:, -1]), None

        acc, _ = jax.lax.scan(body, 0.0, perm)
        return acc

    results["gather_cast"] = timed(jax.jit(gather_epoch), perm, data) / STEPS

    def gather_x_epoch(perm, x):
        def body(acc, idx):
            b = jnp.take(x, idx, axis=0).astype(jnp.float32)
            return acc + jnp.sum(b[:, 0]), None

        acc, _ = jax.lax.scan(body, 0.0, perm)
        return acc

    results["gather_x_only"] = timed(jax.jit(gather_x_epoch), perm, data["x"]) / STEPS

    # -- 4. rng ------------------------------------------------------------
    def rng_epoch(seed):
        def body(rng, _):
            rng, a, b, c, d = jax.random.split(rng, 5)
            z = jax.random.normal(d, (1, BATCH, LATENT))
            return rng, jnp.sum(z)

        _, out = jax.lax.scan(body, jax.random.PRNGKey(seed),
                              jnp.arange(STEPS))
        return jnp.sum(out)

    results["rng_sample"] = timed(jax.jit(rng_epoch), 0) / STEPS

    # -- 5. fwd+bwd only (fused), fixed batch ------------------------------
    from scvae_tpu.models.step import cast_batch_to_f32
    fixed_f32 = cast_batch_to_f32(fixed)

    def fwdbwd(params, model_state, fixed_f32):
        def body(acc, i):
            (l, _), grads = jax.value_and_grad(loss, has_aux=True)(
                params, model_state, fixed_f32, jax.random.fold_in(
                    jax.random.PRNGKey(0), i), 1.0)
            return acc + l, None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    results["fwd_bwd_fused"] = timed(
        jax.jit(fwdbwd), ts.params, ts.model_state, fixed_f32) / STEPS

    # -- 6. likelihood only ------------------------------------------------
    h_fix = jnp.asarray(
        np.random.RandomState(2).rand(1, BATCH, HIDDEN[0]), jnp.float32)
    t_fix = fixed_f32["t"]

    def ll_fused(params, h_fix, t_fix):
        from scvae_tpu import ops

        def one(params):
            rows = ops.fused_log_likelihood(
                "negative binomial", h_fix, params["reconstruction"], t_fix)
            return jnp.sum(rows)

        def body(acc, i):
            l, g = jax.value_and_grad(one)(params)
            return acc + l + g["reconstruction"]["p"]["kernel"][0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    results["likelihood_fused"] = timed(jax.jit(ll_fused), ts.params, h_fix, t_fix) / STEPS

    def ll_xla(params, h_fix, t_fix):
        from scvae_tpu import ops

        def one(params):
            rows = ops.reference_log_likelihood(
                "negative binomial", h_fix, params["reconstruction"], t_fix)
            return jnp.sum(rows)

        def body(acc, i):
            l, g = jax.value_and_grad(one)(params)
            return acc + l + g["reconstruction"]["p"]["kernel"][0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    results["likelihood_xla"] = timed(jax.jit(ll_xla), ts.params, h_fix, t_fix) / STEPS

    # -- 7. trunk matmuls only ---------------------------------------------
    from scvae_tpu.models import networks

    def trunk(params, model_state, x):

        def one(params):
            h, _ = networks.apply_mlp(
                params["encoder"], model_state["encoder"], x,
                training=True, compute_dtype=jnp.bfloat16)
            mu = networks.apply_dense(params["posterior"]["mu"], h,
                                      compute_dtype=jnp.bfloat16)
            d, _ = networks.apply_mlp(
                params["decoder"], model_state["decoder"],
                mu[None, :, :], training=True, compute_dtype=jnp.bfloat16)
            return jnp.sum(d)

        def body(acc, i):
            l, g = jax.value_and_grad(one)(params)
            return acc + l + g["encoder"]["layers"][0]["kernel"][0, 0], None

        acc, _ = jax.lax.scan(body, 0.0, jnp.arange(STEPS))
        return acc

    results["trunk"] = timed(jax.jit(trunk), ts.params, ts.model_state, fixed_f32["x"]) / STEPS

    # -- 8. adam update only ----------------------------------------------
    import optax

    def adam_only(ts):
        def body(carry, i):
            params, opt_state = carry
            grads = jax.tree_util.tree_map(lambda p: p * 1e-6, params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), None

        (params, _), _ = jax.lax.scan(body, (ts.params, ts.opt_state),
                                      jnp.arange(STEPS))
        return params["posterior"]["mu"]["kernel"]

    results["adam"] = timed(jax.jit(adam_only), ts) / STEPS

    print(f"\nB={BATCH} F={N_GENES} H={HIDDEN} D={LATENT} steps={STEPS}")
    for k, v in results.items():
        print(f"  {k:18s} {v * 1e3:8.3f} ms/step")


if __name__ == "__main__":
    main()
