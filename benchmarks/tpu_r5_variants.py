"""Round-5 headline ablations (VERDICT r04 item 7): bound the two
remaining unmeasured candidates on the B=2048 flagship step.

1. ``last_bn_off`` — skip batch norm on the LAST layer of each MLP.
   UPPER-BOUNDS the win of folding the last decoder bn scale/shift into
   the fused forward's h-block load (the fold keeps all the math; this
   ablation removes it entirely, plus the encoder's counterpart).
2. ``head_adam_masked`` — SGD instead of Adam for the reconstruction-
   head parameters (``optax.multi_transform``).  UPPER-BOUNDS the win of
   fusing the head-param Adam update into the backward kernel epilogue:
   masking removes the heads' m/v read+write entirely (~17 MB/step),
   while the in-kernel fusion could only save the dW write + g read
   (~8 MB/step) and still pays the m/v traffic.

If an ablation's speedup is within chip noise (±2-3%), the real
optimisation cannot beat noise either → documented dead end.

Method: same slope timing as bench.py, interleaved A/B/A to cancel chip
drift.  Run alone on the chip (no concurrent CPU-heavy work).
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402  (repo-root bench harness)


def timed(config, data, host_arrays, batch=2048, optimizer=None):
    from scvae_tpu.models.api import _bf16_batch_dtypes

    runner = bench.EpochRunner(
        config, data, bench.N_CELLS, batch,
        batch_dtypes=_bf16_batch_dtypes(host_arrays, config),
    )
    if optimizer is not None:
        # rebuild the epoch fn around the ablated optimizer
        import jax

        from scvae_tpu.models import create_train_state
        from scvae_tpu.models import vae
        from scvae_tpu.models.step import make_train_epoch

        params, state = vae.init(config, jax.random.PRNGKey(0))

        def loss(params, model_state, batch_dict, rng, warm_up_weight):
            return vae.loss_fn(
                config, params, model_state, batch_dict, rng,
                warm_up_weight=warm_up_weight,
            )

        runner.state = create_train_state(params, state, optimizer)
        runner.train_epoch = make_train_epoch(
            loss, optimizer,
            batch_dtypes=_bf16_batch_dtypes(host_arrays, config),
        )
    per_epoch, quality = bench.slope_time(runner.run, reps=3)
    ms = 1000 * per_epoch / runner.steps_per_epoch
    return ms, quality


def main() -> None:
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__))), ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import optax

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import networks, vae

    values = bench.make_counts(bench.N_CELLS, bench.N_GENES)
    host_arrays = {"x": values, "t": values}
    data = device_resident_data(host_arrays, count_dtype=np.int16)
    jax.block_until_ready(data["x"])

    config = vae.VAEConfig(
        feature_size=bench.N_GENES, latent_size=bench.LATENT,
        hidden_sizes=bench.HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )

    out = {}

    # -- A: baseline ---------------------------------------------------
    ms, q = timed(config, data, host_arrays)
    out["base_1"] = {"ms_per_step": round(ms, 4), **q}
    print(json.dumps(out), flush=True)

    # -- B1: last-layer bn off ----------------------------------------
    original_apply_mlp = networks.apply_mlp

    def apply_mlp_last_bn_off(params, state, x, *, training, rng=None,
                              activation=jax.nn.relu,
                              input_dropout_keep_prob=1.0,
                              hidden_dropout_keep_prob=1.0,
                              compute_dtype=None):
        use_bn = "batch_norm" in params
        new_bn_states = []
        h = x
        n = len(params["layers"])
        for i, layer in enumerate(params["layers"]):
            keep = (input_dropout_keep_prob if i == 0
                    else hidden_dropout_keep_prob)
            if training and rng is not None and keep < 1.0:
                rng, sub = jax.random.split(rng)
                h = networks.dropout(sub, h, keep)
            h = networks.apply_dense(layer, h, compute_dtype=compute_dtype)
            if use_bn:
                if i == n - 1:  # ablated: last layer keeps raw h
                    new_bn_states.append(state["batch_norm"][i])
                else:
                    h, bn_s = networks.apply_batch_norm(
                        params["batch_norm"][i], state["batch_norm"][i],
                        h, training=training,
                    )
                    new_bn_states.append(bn_s)
            h = activation(h)
        new_state = {}
        if use_bn:
            new_state["batch_norm"] = new_bn_states
        return h, new_state

    networks.apply_mlp = apply_mlp_last_bn_off
    try:
        ms, q = timed(config, data, host_arrays)
    finally:
        networks.apply_mlp = original_apply_mlp
    out["last_bn_off"] = {"ms_per_step": round(ms, 4), **q}
    print(json.dumps(out), flush=True)

    # -- A again (drift control) --------------------------------------
    ms, q = timed(config, data, host_arrays)
    out["base_2"] = {"ms_per_step": round(ms, 4), **q}
    print(json.dumps(out), flush=True)

    # -- B2: head params on plain SGD (no Adam moments) ----------------
    def label(params):
        return {
            k: ("head" if k in ("reconstruction", "categorised_logits")
                else "rest")
            for k in params
        }

    masked = optax.chain(
        optax.clip(1.0),
        optax.multi_transform(
            {"head": optax.sgd(1e-4), "rest": optax.adam(1e-4)},
            label,
        ),
    )
    ms, q = timed(config, data, host_arrays, optimizer=masked)
    out["head_adam_masked"] = {"ms_per_step": round(ms, 4), **q}
    print(json.dumps(out), flush=True)

    # -- A once more ---------------------------------------------------
    ms, q = timed(config, data, host_arrays)
    out["base_3"] = {"ms_per_step": round(ms, 4), **q}
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
