"""Calibration run for the realistic-synthetic quality bands
(tests/test_realistic_synthetic.py; VERDICT r04 item 3).

Generates NB counts with the pathologies real 10x data has — log-normal
library-size variation, per-gene dispersion heterogeneity, and a planted
2-batch effect — then trains the GMVAE with and without
``batch_correction`` and prints the ARIs, so the test floors are set
from recorded values rather than guesses.

Run on CPU f32 (the gate platform): ``JAX_PLATFORMS=cpu python
benchmarks/calibrate_realistic.py``.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"
))

from test_realistic_synthetic import (  # noqa: E402
    F, K, make_sets, realistic_counts,
)


def train_gmvae(train, valid, test, tmp, batch_correction, seed=0,
                count_sum=False, tag="m", epochs=10):
    from scvae_tpu.analyses.metrics import adjusted_rand_index
    from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

    model = GaussianMixtureVariationalAutoencoder(
        feature_size=F, latent_size=8, hidden_sizes=[64],
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=K,
        number_of_warm_up_epochs=3,
        batch_correction=batch_correction,
        number_of_batches=2 if batch_correction else None,
        count_sum=count_sum,
        log_directory=os.path.join(tmp, tag),
    )
    result = model.train(
        train, valid, number_of_epochs=epochs, minibatch_size=512,
        seed=seed, verbose=False, data_placement="device",
        track_accuracy=False,
    )
    transformed, _, _ = model.evaluate(
        test, minibatch_size=512, output_versions="all", verbose=False
    )
    to_id = test.class_name_to_class_id
    label_ids = np.array([to_id[n] for n in test.labels])
    ari = float(
        adjusted_rand_index(label_ids, transformed.predicted_cluster_ids)
    )
    lb = float(result.history["training"]["lower_bound"][-1])
    return ari, lb


def main():
    import tempfile

    out = {}
    with tempfile.TemporaryDirectory() as tmp:
        # Leg A: realistic pathologies WITHOUT batch effect — the model
        # must still cluster under library-size + dispersion heterogeneity.
        counts, labels, batches = realistic_counts(
            6000, seed=0, batch_effect=False
        )
        lib = counts.sum(axis=1)
        out["library_size_p95_over_p5"] = float(
            np.percentile(lib, 95) / np.percentile(lib, 5)
        )
        train, valid, test = make_sets(counts, labels, batches)
        t0 = time.time()
        ari, lb = train_gmvae(train, valid, test, tmp, False, tag="a_plain")
        out["no_batch_effect"] = {
            "ari": ari, "final_lb": lb, "seconds": round(time.time() - t0),
        }
        print(json.dumps(out), flush=True)
        t0 = time.time()
        ari, lb = train_gmvae(
            train, valid, test, tmp, False, count_sum=True, tag="a_cs"
        )
        out["no_batch_effect_count_sum"] = {
            "ari": ari, "final_lb": lb, "seconds": round(time.time() - t0),
        }
        print(json.dumps(out), flush=True)

        # Leg B: planted batch effect, correction OFF vs ON.
        counts, labels, batches = realistic_counts(
            6000, seed=1, batch_effect=True
        )
        train, valid, test = make_sets(counts, labels, batches)
        t0 = time.time()
        ari_u, lb_u = train_gmvae(
            train, valid, test, tmp, False, count_sum=True, tag="b_u"
        )
        out["batch_effect_uncorrected"] = {
            "ari": ari_u, "final_lb": lb_u,
            "seconds": round(time.time() - t0),
        }
        print(json.dumps(out), flush=True)
        t0 = time.time()
        ari_c, lb_c = train_gmvae(
            train, valid, test, tmp, True, count_sum=True, tag="b_c"
        )
        out["batch_effect_corrected"] = {
            "ari": ari_c, "final_lb": lb_c,
            "seconds": round(time.time() - t0),
        }
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
