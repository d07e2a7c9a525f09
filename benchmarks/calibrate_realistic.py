"""Calibration run for the realistic-synthetic quality bands
(tests/test_realistic_synthetic.py; VERDICT r04 item 3).

Reproduces the recorded values the test floors are set from:

* GMVAE clustering ARI under log-normal library-size variation +
  per-gene dispersion heterogeneity (no batch effect, data seed 0,
  train seed 0, 30 epochs) — recorded 0.6318.
* VAE batch-correction effectiveness: corrected-minus-uncorrected
  TEST lower bound with the planted additive batch program, data seeds
  1/2/3 — recorded +208.2 / +96.3 / +1622.5 nats.

Run on CPU f32 (the gate platform):
``JAX_PLATFORMS=cpu python benchmarks/calibrate_realistic.py``
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from test_realistic_synthetic import (  # noqa: E402
    F, K, make_sets, realistic_counts,
)


def gmvae_ari(train, valid, test, log_dir):
    from scvae_tpu.analyses.metrics import adjusted_rand_index
    from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

    model = GaussianMixtureVariationalAutoencoder(
        feature_size=F, latent_size=8, hidden_sizes=[64],
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=K, number_of_warm_up_epochs=5,
        log_directory=log_dir,
    )
    model.train(
        train, valid, number_of_epochs=30, minibatch_size=512,
        seed=0, verbose=False, data_placement="device",
        track_accuracy=False,
    )
    transformed, _, _ = model.evaluate(
        test, minibatch_size=512, output_versions="all", verbose=False
    )
    to_id = test.class_name_to_class_id
    label_ids = np.array([to_id[n] for n in test.labels])
    return float(
        adjusted_rand_index(label_ids, transformed.predicted_cluster_ids)
    )


def vae_test_lb(train, valid, test, log_dir, batch_correction):
    from scvae_tpu.models import VariationalAutoencoder

    model = VariationalAutoencoder(
        feature_size=F, latent_size=8, hidden_sizes=[64],
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=True, number_of_warm_up_epochs=3,
        batch_correction=batch_correction,
        number_of_batches=2 if batch_correction else None,
        log_directory=log_dir,
    )
    model.train(
        train, valid, number_of_epochs=10, minibatch_size=512,
        seed=0, verbose=False, data_placement="device",
    )
    model.evaluate(
        test, minibatch_size=512, output_versions="all", verbose=False
    )
    return float(model._last_evaluation_metrics["lower_bound"])


def main():
    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        counts, labels, batches = realistic_counts(
            6000, seed=0, batch_effect=False
        )
        lib = counts.sum(axis=1)
        out["library_size_p95_over_p5"] = round(float(
            np.percentile(lib, 95) / np.percentile(lib, 5)
        ), 2)
        train, valid, test = make_sets(counts, labels, batches)
        t0 = time.time()
        out["gmvae_clean_ari"] = round(
            gmvae_ari(train, valid, test, os.path.join(tmp, "a")), 4
        )
        out["gmvae_seconds"] = round(time.time() - t0)
        print(json.dumps(out), flush=True)

        for seed in (1, 2, 3):
            counts, labels, batches = realistic_counts(
                6000, seed=seed, batch_effect=True
            )
            train, valid, test = make_sets(counts, labels, batches)
            lb_u = vae_test_lb(
                train, valid, test, os.path.join(tmp, f"u{seed}"), False
            )
            lb_c = vae_test_lb(
                train, valid, test, os.path.join(tmp, f"c{seed}"), True
            )
            out[f"batch_correction_delta_seed{seed}"] = round(
                lb_c - lb_u, 1
            )
            print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
