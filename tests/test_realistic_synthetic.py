"""Quality evidence one step closer to real data (VERDICT r04 item 3).

Round-4's planted-cluster synthetic was idealised Poisson with equal
library sizes; real 10x data is not.  This module's generator adds the
pathologies real data actually stresses — and the reference's guide
claims results on (`/root/reference/docs/guide.rst:201-211`):

* **log-normal library-size variation** (≥10× p95/p5 spread — deeper
  cells have proportionally more counts everywhere; σ=0.75 →
  exp(2·1.645·0.75) ≈ 12× on the multiplier, measured 11.8× on count
  sums after NB noise compresses the tails),
* **per-gene dispersion heterogeneity** (NB with gene-specific inverse
  dispersion r drawn log-uniform over [0.3, 10] — some genes near-
  Poisson, some heavily over-dispersed),
* **a planted 2-batch effect** (batch 1 additionally expresses a
  disjoint 512-gene program — a batch-specific signature like a
  stress response — the covariate the reference's ``batch_correction``
  one-hot decoder input exists to absorb,
  `/root/reference/scvae/models/variational_autoencoder.py:2396-2462`).

Recorded values (2026-08-21, CPU f32, seeds below,
``benchmarks/calibrate_realistic.py``):

* GMVAE clustering under library-size + dispersion heterogeneity
  (no batch effect, data seed 0, 30 epochs): **ARI 0.6318** (floor
  0.48 = recorded − 0.15, per VERDICT r04 item 3).  For scale: the
  same model on the idealised equal-library Poisson synthetic reaches
  0.98 (``test_quality_scale.py``), a slightly milder σ=0.7 spread
  measures 0.77, and 20 epochs at this spread measure 0.50 — the
  pathologies genuinely bite, and the band sits in the
  hard-but-working regime.
* Batch-correction effectiveness (VAE, additive batch program):
  corrected-minus-uncorrected TEST lower bound across data seeds 1/2/3
  (train seed 0): **+208.2 / +96.3 / +1622.5 nats** — correction always
  improves held-out likelihood (it explains the planted batch program
  through the batch input instead of forcing it through the latent).
  The latent batch-centroid separation usually shrinks too (measured at
  σ=0.7: 2.05→1.83, 2.08→2.00) but not monotonically on every seed
  (2.27→2.30), so the test asserts the likelihood effect only.  Clustering-ARI rescue is
  NOT asserted: the reference's correction is decoder-side, so q(y|x)
  still sees batch-contaminated counts — at this training budget the
  measured ARI deltas (0.40→0.43) are within run noise, and an
  assertion there would test luck, not the feature.
"""

import numpy as np
import pytest

F = 2048
K = 4
GENES_PER_PROGRAM = 256
BATCH_PROGRAM = slice(1024, 1536)  # disjoint from the K type programs
BATCH_PROGRAM_RATE = 3.0


def realistic_counts(n_cells, seed=0, batch_effect=False):
    """NB counts with K planted cluster programs plus the real-data
    pathologies above.  Returns (counts, type_labels, batch_indices)."""
    rng = np.random.RandomState(seed)
    labels = rng.randint(0, K, size=n_cells)
    batches = rng.randint(0, 2, size=n_cells)
    base = np.full((K, F), 0.2, np.float32)
    for k in range(K):
        base[k, k * GENES_PER_PROGRAM:(k + 1) * GENES_PER_PROGRAM] = 3.0
    # log-normal library size (≥10× p95/p5 spread)
    library = np.exp(
        rng.normal(0.0, 0.75, size=n_cells)
    ).astype(np.float32)
    mu = base[labels] * library[:, None]
    if batch_effect:
        program = np.zeros(F, np.float32)
        program[BATCH_PROGRAM] = BATCH_PROGRAM_RATE
        mu = mu + (
            (batches[:, None] == 1) * program[None, :] * library[:, None]
        )
    # gene-specific inverse dispersion r: NB via gamma-Poisson mixture
    r = np.exp(
        rng.uniform(np.log(0.3), np.log(10.0), size=F)
    ).astype(np.float32)
    lam = rng.gamma(shape=r[None, :], scale=mu / r[None, :])
    counts = rng.poisson(lam).astype(np.float32)
    return counts, labels, batches


def make_sets(counts, labels, batches):
    """(n−1000)/500/500 train/valid/test DataSets carrying batch ids."""
    from scvae_tpu.data import DataSet

    def subset(lo, hi, kind):
        return DataSet(
            "realistic", title="realistic synthetic", specifications={},
            values=counts[lo:hi],
            labels=np.array([f"type {k}" for k in labels[lo:hi]]),
            example_names=np.array([f"cell {i}" for i in range(lo, hi)]),
            feature_names=np.array([f"gene {j}" for j in range(F)]),
            batch_indices=batches[lo:hi],
            batch_names=["batch 0", "batch 1"],
            kind=kind, version="original",
        )

    n = counts.shape[0]
    return (
        subset(0, n - 1000, "training"),
        subset(n - 1000, n - 500, "validation"),
        subset(n - 500, n, "test"),
    )


def test_library_size_spread_is_realistic():
    counts, _, _ = realistic_counts(2000, seed=0)
    lib = counts.sum(axis=1)
    spread = np.percentile(lib, 95) / np.percentile(lib, 5)
    assert spread >= 10.0, spread


@pytest.mark.slow
class TestRealisticSynthetic:
    def test_gmvae_clusters_under_realistic_pathologies(self, tmp_path):
        """Library-size + dispersion heterogeneity: the GMVAE must still
        recover the planted partition.  Recorded known-good ARI 0.6318
        (module docstring); floor = recorded − 0.15."""
        from scvae_tpu.analyses.metrics import adjusted_rand_index
        from scvae_tpu.models import GaussianMixtureVariationalAutoencoder

        counts, labels, batches = realistic_counts(
            6000, seed=0, batch_effect=False
        )
        train, valid, test = make_sets(counts, labels, batches)
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=F, latent_size=8, hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=K,
            number_of_warm_up_epochs=5,
            log_directory=str(tmp_path / "models"),
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
        ari = float(adjusted_rand_index(
            label_ids, transformed.predicted_cluster_ids
        ))
        assert ari >= 0.48, (
            f"realistic-synthetic ARI {ari:.3f} below 0.48 "
            "(recorded known-good 0.6318)"
        )

    def _train_vae(self, train, valid, test, log_dir, batch_correction):
        from scvae_tpu.models import VariationalAutoencoder

        model = VariationalAutoencoder(
            feature_size=F, latent_size=8, hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            minibatch_normalisation=True, number_of_warm_up_epochs=3,
            batch_correction=batch_correction,
            number_of_batches=2 if batch_correction else None,
            log_directory=str(log_dir),
        )
        model.train(
            train, valid, number_of_epochs=10, minibatch_size=512,
            seed=0, verbose=False, data_placement="device",
        )
        model.evaluate(
            test, minibatch_size=512, output_versions="all",
            verbose=False,
        )
        return float(model._last_evaluation_metrics["lower_bound"])

    def test_batch_correction_improves_heldout_likelihood(self, tmp_path):
        """Effectiveness, not just wiring: with a planted batch program,
        ``batch_correction=True`` must improve the TEST-set lower bound
        (the decoder explains the program through the batch one-hot
        instead of forcing it through the latent).  Recorded deltas
        +208.2/+96.3/+1622.5 nats over data seeds 1/2/3 (module
        docstring); the floor is well under the weakest recorded
        delta."""
        counts, labels, batches = realistic_counts(
            6000, seed=1, batch_effect=True
        )
        train, valid, test = make_sets(counts, labels, batches)
        lb_uncorrected = self._train_vae(
            train, valid, test, tmp_path / "m_u", False
        )
        lb_corrected = self._train_vae(
            train, valid, test, tmp_path / "m_c", True
        )
        assert lb_corrected >= lb_uncorrected + 40.0, (
            f"batch correction did not improve held-out likelihood: "
            f"corrected {lb_corrected:.1f} vs uncorrected "
            f"{lb_uncorrected:.1f} (recorded delta +208.2)"
        )
