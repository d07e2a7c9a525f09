"""Intermediate analyses, caches-directory scratch training, subanalyses."""

import os

import numpy as np
import pytest

from scvae_tpu import analyses
from scvae_tpu.analyses import subanalyses
from scvae_tpu.data import DataSet
from scvae_tpu.models import (
    GaussianMixtureVariationalAutoencoder,
    VariationalAutoencoder,
)


@pytest.fixture(scope="module")
def dev_sets(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("data"))
    ds = DataSet(
        "development", directory=directory, example_filter=["random", 300]
    )
    return ds.split(method="random", fraction=0.9)


def test_intermediate_analyser_called(tmp_path, dev_sets):
    train_set, valid_set, _ = dev_sets
    calls = []

    def analyser(**kwargs):
        calls.append(kwargs["epoch"])
        assert kwargs["latent_values"].shape[1] == 2

    model = VariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[16],
        log_directory=str(tmp_path / "models"),
    )
    model.train(
        train_set, valid_set, number_of_epochs=3, minibatch_size=64,
        intermediate_analyser=analyser, verbose=False,
    )
    assert 0 in calls and 2 in calls


def test_gmvae_latent_values_fn(tmp_path, dev_sets):
    import jax.numpy as jnp

    train_set, _, _ = dev_sets
    model = GaussianMixtureVariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[16],
        number_of_latent_clusters=3,
        log_directory=str(tmp_path / "models"),
    )
    import jax

    state = model._init_state(jax.random.PRNGKey(0))
    x = jnp.asarray(
        np.asarray(train_set.values[:16].todense(), np.float32)
    )
    latents = model._latent_values_fn()(state.params, state.model_state, x)
    assert latents.shape == (16, 2)


def test_caches_directory_moves_results(tmp_path, dev_sets):
    train_set, valid_set, _ = dev_sets
    model = VariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[16],
        log_directory=str(tmp_path / "models"),
    )
    scratch = str(tmp_path / "scratch")
    model.train(
        train_set, valid_set, number_of_epochs=1, minibatch_size=64,
        caches_directory=scratch, verbose=False,
    )
    # results in the permanent location, scratch cleaned up
    assert model.has_been_trained()
    assert not os.path.exists(
        os.path.join(scratch, model.name)
    ) or not os.listdir(os.path.join(scratch, model.name))


def test_analyse_intermediate_results_plots(tmp_path, dev_sets):
    train_set, _, _ = dev_sets
    rng = np.random.RandomState(0)
    saved = analyses.analyse_intermediate_results(
        epoch=4,
        latent_values=rng.randn(train_set.number_of_examples, 2),
        data_set=train_set,
        model_name="VAE/test",
        analyses_directory=str(tmp_path / "analyses"),
    )
    assert saved and all(os.path.exists(p) for p in saved)


class TestSubanalyses:
    def test_distributions(self, tmp_path, dev_sets):
        train_set, _, _ = dev_sets
        saved = subanalyses.analyse_distributions(
            train_set, analyses_directory=str(tmp_path / "a")
        )
        assert len(saved) >= 3

    def test_matrices(self, tmp_path, dev_sets):
        train_set, _, _ = dev_sets
        saved = subanalyses.analyse_matrices(
            train_set, plot_distances=True,
            analyses_directory=str(tmp_path / "a"),
        )
        assert len(saved) == 2

    def test_decompositions_with_centroids(self, tmp_path, dev_sets):
        train_set, _, _ = dev_sets
        rng = np.random.RandomState(0)
        centroids = {
            "prior": {
                "means": rng.randn(3, 25),
                "covariance_matrices": np.stack([np.eye(25)] * 3),
            }
        }
        saved = subanalyses.analyse_decompositions(
            train_set,
            centroids=centroids,
            decomposition_methods=["PCA"],
            analyses_directory=str(tmp_path / "a"),
        )
        assert saved

    def test_centroid_probabilities(self, tmp_path):
        saved = subanalyses.analyse_centroid_probabilities(
            {"prior": {"probabilities": np.array([[0.2, 0.8], [0.4, 0.6]])}},
            analyses_directory=str(tmp_path / "a"),
        )
        assert saved
        assert any("probabilities_prior" in s for s in saved)

    def test_centroid_probabilities_posterior_vs_prior(self, tmp_path):
        # Posterior bars with dashed prior levels in one figure
        # (reference subanalyses.py:1068-1142 / histograms.py:259).
        saved = subanalyses.analyse_centroid_probabilities(
            {
                "prior": {"probabilities": np.array([0.5, 0.5])},
                "posterior": {"probabilities": np.array([[0.3, 0.7]])},
            },
            analyses_directory=str(tmp_path / "a"),
        )
        assert any("probabilities_posterior_prior" in s for s in saved)

    def test_predictions_export(self, tmp_path, dev_sets):
        _, _, test_set = dev_sets
        test_set.update_predictions(
            predicted_cluster_ids=np.zeros(
                test_set.number_of_examples, np.int32
            )
        )
        saved = subanalyses.analyse_predictions(
            test_set, analyses_directory=str(tmp_path / "a")
        )
        assert saved and os.path.exists(saved[0])
        test_set.reset_predictions()
