"""Golden regression guards: fixed-seed short trainings on the development
set must land in known ELBO ranges (SURVEY.md §4 item 3 — the parity
fixture; catches numerics regressions in likelihoods/objectives)."""

import numpy as np
import pytest

from scvae_tpu.data import DataSet
from scvae_tpu.models import (
    GaussianMixtureVariationalAutoencoder,
    VariationalAutoencoder,
)


@pytest.fixture(scope="module")
def dev_split(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("data"))
    ds = DataSet(
        "development", directory=directory, example_filter=["random", 1000]
    )
    return ds.split(method="random", fraction=0.9)


def test_vae_nb_golden_trajectory(tmp_path, dev_split):
    train_set, valid_set, _ = dev_split
    model = VariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[32],
        reconstruction_distribution="negative binomial",
        number_of_warm_up_epochs=5,
        log_directory=str(tmp_path / "m"),
    )
    result = model.train(
        train_set, valid_set, number_of_epochs=10, minibatch_size=100,
        learning_rate=1e-3, data_placement="device", seed=0, verbose=False,
    )
    curve = result.history["validation"]["lower_bound"]
    assert np.all(np.isfinite(curve)), curve
    # Known-good run (2026-08-20, fixed seeds, CPU f32):
    #   curve[0] = −14318.4, curve[4] = −24735.4 (KL warm-up dip),
    #   curve[-1] = −6052.0.
    # ±2% bands: a numerics regression (likelihood −inf, KL sign, clip
    # bug, optimiser drift) breaks these immediately, while benign
    # reduction-order noise across jax versions stays well inside.
    np.testing.assert_allclose(curve[0], -14318.4, rtol=0.02)
    np.testing.assert_allclose(curve[4], -24735.4, rtol=0.02)
    np.testing.assert_allclose(curve[-1], -6052.0, rtol=0.02)


def test_gmvae_golden_trajectory(tmp_path, dev_split):
    train_set, valid_set, _ = dev_split
    model = GaussianMixtureVariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[32],
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=3,
        log_directory=str(tmp_path / "m"),
    )
    result = model.train(
        train_set, valid_set, number_of_epochs=3, minibatch_size=100,
        learning_rate=1e-3, data_placement="device", seed=0, verbose=False,
    )
    curve = result.history["validation"]["lower_bound"]
    assert np.all(np.isfinite(curve)), curve
    # Known-good run (2026-08-20, fixed seeds, CPU f32):
    #   curve = [−7576.6, −6453.5, −8586.9] — ±2% bands.
    np.testing.assert_allclose(
        curve, [-7576.6, -6453.5, -8586.9], rtol=0.02
    )
    # KL decomposition guard (round-3): the summed KL (z + y terms) of
    # the same known-good run, ±2% — a KL-sign/weighting regression that
    # leaves the total ELBO near-unchanged still trips this.
    kl = result.history["validation"]["kl_divergence"]
    np.testing.assert_allclose(
        kl, [570.50, 320.11, 255.02], rtol=0.02
    )
    acc = result.history["validation"]["accuracy"]
    assert all(0.0 <= a <= 1.0 for a in acc)
