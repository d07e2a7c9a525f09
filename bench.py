"""Benchmark: cells/sec/chip for the BASELINE.json configs.

Headline (the printed JSON line's ``value``): VAE-NB training throughput
on a synthetic 10x-PBMC-68k-shaped count matrix (68k cells × 2048
selected genes — the reference applies variance feature selection before
training, ``docs/guide.rst:205-211``).  The same line carries, under
``configs``, the remaining BASELINE configs:

* ``vae_nb``            — config 2: VAE, negative binomial (headline,
                          B=2048 for round-over-round comparability)
* ``vae_nb_large_batch``— same model at B∈{4096, 8192}: amortises the
                          fixed per-step optimiser I/O (best reported)
* ``vae_zinb_cat``      — config 3: VAE, ZINB + piecewise-categorical heads
* ``gmvae_nb``          — config 4: GMVAE-NB (K=10) training throughput
                          (batch sweep 512-4096, best reported)
* ``gmvae_ari``         — config 4: GMVAE clustering ARI vs labels on the
                          seeded ``development`` set, CI-gate config
                          (quality, not speed; bounded to
                          ``ARI_TRAIN_BUDGET_S``)
* ``iw_evaluation``     — config 5: IW-ELBO (R=8) evaluation throughput

Timing methodology (round 3): the tunnelled TPU platform charges a
~26 ms dispatch+fetch round trip on every synchronous host read, which at
33 steps/epoch added ~0.8 ms/step to round-2 numbers.  Throughput is now
**slope-timed**: K₂ and K₁ epochs are dispatched back-to-back with ONE
final host fetch each, and the per-step time is
(t(K₂) − t(K₁)) / ((K₂−K₁)·steps) — pure steady-state device time, which
is what production training achieves with deferred metric fetching
(``training.py`` fetch_mode="deferred").  The residual RTT is reported as
``dispatch_fetch_floor_ms`` for transparency.

Robustness (round-2 post-mortem: rc=124 with no JSON): the result line is
printed IMMEDIATELY after the headline config and re-printed, updated,
after every further config; each config runs under an explicit time
budget and a failure/budget-miss records an error entry instead of
sinking the record.  Parse the LAST JSON line.

``vs_baseline`` is measured throughput divided by REFERENCE_BASELINE — an
estimate of the reference TF1 implementation's training throughput on
GPU-class hardware for this config (one ``session.run`` per feed_dict
minibatch of 100, host-side densification per step; the reference
publishes no numbers, so this self-chosen constant anchors
round-over-round comparison only; see BASELINE.md).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

REFERENCE_BASELINE_CELLS_PER_SEC = 50_000.0

N_CELLS = 68_579  # 10x-PBMC-68k size
N_GENES = 2048
LATENT = 100
HIDDEN = (256, 256)
BATCH = 2048

# Per-config wall budgets (seconds).  The driver's overall budget killed
# round 2 mid-ARI; every config now checks in before starting and the ARI
# config bounds its own training time.
TOTAL_BUDGET_S = float(os.environ.get("SCVAE_BENCH_BUDGET_S", 1500))
ARI_TRAIN_BUDGET_S = float(os.environ.get("SCVAE_ARI_BUDGET_S", 300))

# Device bf16 peak, set in main() once the backend is known; lets every
# training config record tflops/mfu (VERDICT r03 item 6: the GMVAE entry
# must carry its MFU with the K× FLOP basis stated).
PEAK_TFLOPS: float | None = None

_START = time.monotonic()


def remaining_budget() -> float:
    return TOTAL_BUDGET_S - (time.monotonic() - _START)


# bf16 peak TFLOP/s by device kind (public spec sheets); the MFU basis is
# stated in the emitted JSON (``mfu_basis``).
BF16_PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,
    "TPU v5e": 197.0,
    "TPU v5": 459.0,
    "TPU v5p": 459.0,
    "TPU v6 lite": 918.0,
    "TPU v6e": 918.0,
}


def log(*args):
    print(*args, file=sys.stderr, flush=True)


def make_counts(n_cells: int, n_genes: int, density: float = 0.07):
    """Synthetic sparse counts with PBMC-like sparsity (~93% zeros)."""
    import scipy.sparse

    rng_np = np.random.RandomState(0)
    n_nonzero_per_row = max(1, int(n_genes * density))
    rows = np.repeat(np.arange(n_cells), n_nonzero_per_row)
    cols = rng_np.randint(0, n_genes, size=rows.shape[0])
    vals = rng_np.poisson(3.0, size=rows.shape[0]).astype(np.float32) + 1.0
    return scipy.sparse.csr_matrix(
        (vals, (rows, cols)), shape=(n_cells, n_genes)
    )


def analytic_train_flops_per_cell(config) -> float:
    """Model matmul FLOPs per cell for one training step: 2·MAC forward +
    4·MAC backward = 6·MAC (XLA's counter misses matmuls inside the fused
    Pallas likelihood custom-call, so the honest MFU number is analytic)."""
    f = config.feature_size
    hidden = list(config.hidden_sizes)
    d = config.latent_size
    n_recon = len(config.reconstruction_spec.parameters)
    macs = 0
    # encoder chain
    dims = [f] + hidden
    for a, b in zip(dims[:-1], dims[1:]):
        macs += a * b
    # posterior heads (mu, log_sigma)
    macs += hidden[-1] * d * 2
    # decoder chain (reversed hidden)
    dims = [d] + hidden[::-1]
    for a, b in zip(dims[:-1], dims[1:]):
        macs += a * b
    # reconstruction heads (+ categorised logits)
    macs += hidden[0] * f * n_recon
    if config.k_max:
        macs += hidden[0] * f * (config.k_max + 1)
    k = getattr(config, "n_clusters", 1)
    if k > 1:  # GMVAE: q(y|x) trunk + K-way encoder/decoder/heads
        macs *= k  # decoder+heads+encoder run per cluster (approximation)
    return 6.0 * macs


class EpochRunner:
    """Dispatch n training epochs back-to-back with ONE final host fetch."""

    def __init__(self, config, data, n_cells, batch, seed=0,
                 batch_dtypes=None):
        import jax

        from scvae_tpu.models import create_train_state, make_optimizer
        from scvae_tpu.models import gmvae, vae
        from scvae_tpu.models.step import epoch_permutation, make_train_epoch

        module = (
            gmvae if config.__class__.__name__ == "GMVAEConfig" else vae
        )
        from scvae_tpu.models.api import _append_lgamma_rowsum

        data = _append_lgamma_rowsum(data, config)
        rng = jax.random.PRNGKey(seed)
        params, state = module.init(config, rng)
        optimizer = make_optimizer(1e-4)
        self.jax = jax
        self.config = config
        self.data = data
        self.batch = batch
        self.n_cells = n_cells
        self.steps_per_epoch = n_cells // batch
        self.state = create_train_state(params, state, optimizer)
        self.perm_rng = np.random.RandomState(1)
        self.epoch_permutation = epoch_permutation

        def loss(params, model_state, batch, rng, warm_up_weight):
            return module.loss_fn(
                config, params, model_state, batch, rng,
                warm_up_weight=warm_up_weight,
            )

        self.train_epoch = make_train_epoch(
            loss, optimizer, batch_dtypes=batch_dtypes
        )
        self._e = 0

    def run(self, n_epochs: int) -> float:
        """Run n epochs; returns the last epoch's mean lower bound (the
        float() is the single sync point)."""
        metrics = None
        for _ in range(n_epochs):
            perm = self.epoch_permutation(
                self.n_cells, self.batch, self.perm_rng
            )
            self.state, metrics = self.train_epoch(
                self.state, self.data, perm,
                self.jax.random.PRNGKey(3 + self._e), 1.0,
            )
            self._e += 1
        value = float(metrics["lower_bound"])
        assert np.isfinite(value), value
        return value


def slope_time_epochs(runner, k1=2, k2=8, reps=3):
    """Per-epoch steady-state seconds via the slope between k1- and
    k2-epoch dispatch groups (one sync fetch each), best of ``reps``."""
    runner.run(1)  # warm up (compile + first-touch)
    t1 = t2 = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        runner.run(k1)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        runner.run(k2)
        t2 = min(t2, time.perf_counter() - t0)
    per_epoch = (t2 - t1) / (k2 - k1)
    floor_ms = max(0.0, (t1 - k1 * per_epoch)) * 1e3
    return per_epoch, floor_ms


def bench_training(config, data, n_cells, batch, budget_key, configs,
                   batch_dtypes=None):
    runner = EpochRunner(config, data, n_cells, batch,
                         batch_dtypes=batch_dtypes)
    per_epoch, floor_ms = slope_time_epochs(runner)
    steps = runner.steps_per_epoch
    cells_per_sec = steps * batch / per_epoch
    flops_per_epoch = (
        analytic_train_flops_per_cell(config) * batch * steps
    )
    flops_per_sec = flops_per_epoch / per_epoch
    entry = {
        "cells_per_sec": round(cells_per_sec, 1),
        "ms_per_step": round(1000 * per_epoch / steps, 4),
        "batch": batch,
        "dispatch_fetch_floor_ms": round(floor_ms, 2),
        "tflops": round(flops_per_sec / 1e12, 2),
    }
    if PEAK_TFLOPS:
        entry["mfu"] = round(flops_per_sec / 1e12 / PEAK_TFLOPS, 4)
    configs[budget_key] = entry
    return cells_per_sec, flops_per_sec


def bench_iw_evaluation(config, data, n_cells, batch, n_iw):
    """IW-ELBO evaluation throughput (BASELINE config 5), slope-timed."""
    import jax

    from scvae_tpu.models import vae
    from scvae_tpu.models.step import make_eval_epoch, sequential_batches

    rng = jax.random.PRNGKey(0)
    params, state = vae.init(config, rng)

    def eval_fn(params, model_state, batch, rng):
        metrics, _ = vae.elbo_terms(
            config, params, model_state, batch, rng,
            training=False, n_iw=n_iw, n_mc=1,
        )
        return metrics

    eval_epoch = make_eval_epoch(eval_fn)
    idx = sequential_batches(n_cells, batch)

    def run(n):
        out = None
        for e in range(n):
            out = eval_epoch(params, state, data, idx,
                             jax.random.PRNGKey(5 + e))
        value = float(out["lower_bound"])
        assert np.isfinite(value)

    run(1)
    t1 = t2 = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        run(1)
        t1 = min(t1, time.perf_counter() - t0)
        t0 = time.perf_counter()
        run(4)
        t2 = min(t2, time.perf_counter() - t0)
    per_pass = (t2 - t1) / 3
    return idx.size / per_pass


def bench_gmvae_ari() -> dict:
    """GMVAE clustering quality: ARI vs labels on the seeded development
    data — the EXACT CI-gate configuration (tests/test_gmvae.py
    TestClusteringQualityGate: 2000 cells, K=5, latent 10, hidden [64],
    warm-up 10, 30 epochs, minibatch 256, seed 0, f32), so the recorded
    value is directly comparable round-over-round to the gate's 0.2537
    known-good and its 0.15 collapse floor (VERDICT r03 item 7).
    Training is bounded to ARI_TRAIN_BUDGET_S seconds: the model trains
    in chunks until the budget runs out, then evaluates whatever it has —
    quality reporting must never sink the throughput record (the emitted
    epochs_trained says whether the run is budget-truncated)."""
    import tempfile

    from scvae_tpu.analyses.metrics import adjusted_rand_index
    from scvae_tpu.data import DataSet
    from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

    target_epochs = 30
    with tempfile.TemporaryDirectory() as tmp:
        ds = DataSet(
            "development", directory=tmp + "/data",
            example_filter=["random", 2000],
        )
        train, valid, test = ds.split(method="random", fraction=0.9)
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=train.number_of_features,
            latent_size=10,
            hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=5,
            number_of_warm_up_epochs=10,
            precision="float32",  # match the CPU-f32 gate's known-good
            log_directory=tmp + "/models",
        )
        deadline = time.monotonic() + ARI_TRAIN_BUDGET_S
        epochs_done = 0
        chunk = 10
        while time.monotonic() < deadline and epochs_done < target_epochs:
            target = min(target_epochs, epochs_done + chunk)
            model.train(
                train, valid, number_of_epochs=target, minibatch_size=256,
                seed=0, verbose=False, data_placement="device",
                track_accuracy=False,
            )
            epochs_done = target
        transformed, _, _ = model.evaluate(
            test, minibatch_size=256, output_versions="all", verbose=False
        )
        to_id = test.class_name_to_class_id
        label_ids = np.array([to_id[n] for n in test.labels])
        ari = float(
            adjusted_rand_index(label_ids, transformed.predicted_cluster_ids)
        )
        return {"adjusted_rand_index": round(ari, 4),
                "epochs_trained": epochs_done,
                "config": "CI gate: 2000 cells, K=5, 30 epochs, seed 0",
                "gate_floor": 0.15,
                "known_good": 0.2537}


def main() -> None:
    import jax

    # Persistent compilation cache inside the repo (survives across
    # rounds, unlike /tmp): first-ever run pays the remote compile,
    # later bench runs start hot.
    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         ".jax_cache"),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from scvae_tpu.data.pipeline import device_resident_data
    from scvae_tpu.models import gmvae, vae

    devices = jax.devices()
    log(f"devices: {devices}")
    device_kind = devices[0].device_kind
    global PEAK_TFLOPS
    PEAK_TFLOPS = BF16_PEAK_TFLOPS.get(device_kind)

    log("generating synthetic counts…")
    values = make_counts(N_CELLS, N_GENES)
    host_arrays = {"x": values, "t": values}
    log("staging data in HBM…")
    data = device_resident_data(
        {"x": values, "t": values}, count_dtype=np.int16
    )
    jax.block_until_ready(data["x"])

    configs: dict[str, dict] = {}
    result: dict = {}

    def emit(partial: bool):
        peak = BF16_PEAK_TFLOPS.get(device_kind)
        result.update(
            {
                "metric": (
                    "cells/sec/chip, VAE-NB training, 68k cells x 2048 genes"
                ),
                "unit": "cells/sec/chip",
                "baseline_note": (
                    "baseline is a self-chosen 50k cells/s estimate of the "
                    "reference TF1 feed_dict loop (no published numbers); "
                    "round-over-round anchor only"
                ),
                "timing_note": (
                    "slope-timed steady-state device ms/step (two epoch "
                    "groups, one sync fetch each); the tunnelled host "
                    "round-trip is excluded and reported per config as "
                    "dispatch_fetch_floor_ms"
                ),
                "mfu_basis": (
                    f"analytic 6*MAC model flops / bf16 peak "
                    f"({peak if peak else 'unknown'} TFLOP/s for "
                    f"{device_kind}); training matmuls run bf16 with f32 "
                    "accumulation"
                ),
                "device_kind": device_kind,
                "partial": partial,
                "configs": configs,
            }
        )
        print(json.dumps(result), flush=True)

    # -- headline: VAE-NB training (BASELINE config 2) ----------------------
    config = vae.VAEConfig(
        feature_size=N_GENES, latent_size=LATENT, hidden_sizes=HIDDEN,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=200,
    )
    log("benchmarking VAE-NB…")
    from scvae_tpu.models.api import _bf16_batch_dtypes

    cells_per_sec, flops_per_sec = bench_training(
        config, data, N_CELLS, BATCH, "vae_nb", configs,
        batch_dtypes=_bf16_batch_dtypes(host_arrays, config),
    )
    tflops = flops_per_sec / 1e12
    peak = BF16_PEAK_TFLOPS.get(device_kind)
    mfu = tflops / peak if peak else None
    result.update(
        {
            "value": round(cells_per_sec, 1),
            "vs_baseline": round(
                cells_per_sec / REFERENCE_BASELINE_CELLS_PER_SEC, 3
            ),
            "tflops": round(tflops, 2),
            "mfu": round(mfu, 4) if mfu else None,
        }
    )
    log(f"VAE-NB: {configs['vae_nb']['ms_per_step']} ms/step → "
        f"{cells_per_sec:,.0f} cells/s ({tflops:.2f} TFLOP/s"
        + (f", MFU {mfu:.2%})" if mfu else ")"))
    emit(partial=True)

    # Large-batch companion entry: larger batches amortise the per-step
    # optimiser I/O (Adam reads/writes ~50 MB of moments regardless of
    # batch) and the kernels' fixed costs; the headline stays B=2048 for
    # round-over-round comparability.
    if remaining_budget() > 220:
        try:
            best_lb = None
            lb_sweep = {}
            for lb_batch in (4096, 8192):
                if best_lb is not None and remaining_budget() < 150:
                    break
                log(f"benchmarking VAE-NB at B={lb_batch}…")
                sub: dict[str, dict] = {}
                bench_training(
                    config, data, N_CELLS, lb_batch, "x", sub,
                    batch_dtypes=_bf16_batch_dtypes(host_arrays, config),
                )
                lb_sweep[str(lb_batch)] = sub["x"]["cells_per_sec"]
                if best_lb is None or (
                    sub["x"]["cells_per_sec"] > best_lb["cells_per_sec"]
                ):
                    best_lb = sub["x"]
                configs["vae_nb_large_batch"] = dict(
                    best_lb, batch_sweep=dict(lb_sweep)
                )
                emit(partial=True)
            log(f"VAE-NB large batch: "
                f"{best_lb['cells_per_sec']:,.0f} cells/s "
                f"(B={best_lb['batch']}; sweep {lb_sweep})")
        except Exception as error:
            configs["vae_nb_large_batch"] = {"error": str(error)[:200]}
        emit(partial=True)
    else:
        configs["vae_nb_large_batch"] = {"skipped": "budget"}

    # -- config 3: ZINB + categorised counts --------------------------------
    if remaining_budget() > 120:
        try:
            config_zinb = vae.VAEConfig(
                feature_size=N_GENES, latent_size=LATENT,
                hidden_sizes=HIDDEN,
                reconstruction_distribution=(
                    "zero-inflated negative binomial"
                ),
                number_of_reconstruction_classes=10,
                minibatch_normalisation=True,
            )
            log("benchmarking VAE-ZINB+categorised…")
            bench_training(
                config_zinb, data, N_CELLS, BATCH, "vae_zinb_cat", configs,
                batch_dtypes=_bf16_batch_dtypes(host_arrays, config_zinb),
            )
            log(f"ZINB+cat: {configs['vae_zinb_cat']['cells_per_sec']:,.0f}"
                " cells/s")
        except Exception as error:
            configs["vae_zinb_cat"] = {"error": str(error)[:200]}
        emit(partial=True)
    else:
        configs["vae_zinb_cat"] = {"skipped": "budget"}

    # -- config 4: GMVAE-NB training throughput (batch sweep) ---------------
    if remaining_budget() > 180:
        try:
            config_gm = gmvae.GMVAEConfig(
                feature_size=N_GENES, latent_size=LATENT,
                hidden_sizes=HIDDEN,
                reconstruction_distribution="negative binomial",
                number_of_latent_clusters=10,
                minibatch_normalisation=True,
            )
            log("benchmarking GMVAE-NB (batch sweep)…")
            best = None
            sweep = {}
            # 2048 first (round-over-round comparability), then the wider
            # sweep while budget allows — always leaving the ARI config
            # its own training budget.
            for gm_batch in (2048, 1024, 512, 4096):
                if best is not None and remaining_budget() < (
                    ARI_TRAIN_BUDGET_S + 240
                ):
                    break
                sub: dict[str, dict] = {}
                bench_training(
                    config_gm, data, N_CELLS, gm_batch, "x", sub,
                    batch_dtypes=_bf16_batch_dtypes(host_arrays, config_gm),
                )
                sweep[str(gm_batch)] = sub["x"]["cells_per_sec"]
                if best is None or (
                    sub["x"]["cells_per_sec"] > best["cells_per_sec"]
                ):
                    best = sub["x"]
                configs["gmvae_nb"] = dict(best, batch_sweep=dict(sweep))
                emit(partial=True)
            best["batch_sweep"] = sweep
            best["mfu_note"] = (
                "FLOP basis counts the exact K=10 y-marginalisation "
                "(likelihood+encoder+decoder run per cluster, as in the "
                "reference), so MFU is comparable to the VAE entries"
            )
            configs["gmvae_nb"] = best
            log(f"GMVAE-NB: {best['cells_per_sec']:,.0f} cells/s "
                f"(B={best['batch']}; sweep {sweep})")
        except Exception as error:
            configs["gmvae_nb"] = {"error": str(error)[:200]}
        emit(partial=True)
    else:
        configs["gmvae_nb"] = {"skipped": "budget"}

    # -- config 5: IW-ELBO evaluation ---------------------------------------
    if remaining_budget() > 120:
        try:
            log("benchmarking IW evaluation…")
            iw_cells = bench_iw_evaluation(config, data, N_CELLS, 1024,
                                           n_iw=8)
            log(f"IW-ELBO (R=8) evaluation: {iw_cells:,.0f} cells/s")
            configs["iw_evaluation"] = {
                "cells_per_sec": round(iw_cells, 1),
                "n_iw": 8,
            }
        except Exception as error:
            configs["iw_evaluation"] = {"error": str(error)[:200]}
        emit(partial=True)
    else:
        configs["iw_evaluation"] = {"skipped": "budget"}

    # -- config 4 quality: GMVAE ARI on development -------------------------
    if remaining_budget() > ARI_TRAIN_BUDGET_S + 60:
        try:
            log("training GMVAE on development for ARI "
                f"(≤{ARI_TRAIN_BUDGET_S:.0f}s)…")
            configs["gmvae_ari"] = bench_gmvae_ari()
            log(f"GMVAE development ARI: "
                f"{configs['gmvae_ari']['adjusted_rand_index']}")
        except Exception as error:  # quality must not sink the bench
            log(f"GMVAE ARI config failed: {error}")
            configs["gmvae_ari"] = {"error": str(error)[:200]}
    else:
        configs["gmvae_ari"] = {"skipped": "budget"}

    emit(partial=False)


if __name__ == "__main__":
    main()
