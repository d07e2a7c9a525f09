"""API end-to-end coverage for the remaining model configurations:
count-sum models, batch correction, IW evaluation, LFM, categorised
counts, noisy preprocessing (BASELINE.json configs 1–3 in miniature)."""

import numpy as np
import pytest
import scipy.sparse

from scvae_tpu.data import DataSet
from scvae_tpu.data.sparse import SparseRowMatrix
from scvae_tpu.models import VariationalAutoencoder


def _make_labelled_dataset(tmp_path, n=240, f=20, n_batches=3):
    rng = np.random.RandomState(0)
    values = SparseRowMatrix(
        scipy.sparse.csr_matrix(rng.poisson(2.0, (n, f)).astype(np.float32))
    )
    return DataSet(
        "synthetic",
        specifications={},
        values=values,
        labels=rng.choice(["a", "b"], n),
        example_names=np.array([f"c{i}" for i in range(n)]),
        feature_names=np.array([f"g{j}" for j in range(f)]),
        batch_indices=rng.randint(0, n_batches, n),
        directory=str(tmp_path / "data"),
        kind="training",
    )


def _train_and_evaluate(tmp_path, data_set, **model_kwargs):
    model = VariationalAutoencoder(
        feature_size=data_set.number_of_features,
        latent_size=2,
        hidden_sizes=[12],
        log_directory=str(tmp_path / "models"),
        **model_kwargs,
    )
    model.train(
        data_set, data_set, number_of_epochs=2, minibatch_size=64,
        verbose=False,
    )
    outputs = model.evaluate(data_set, minibatch_size=64, verbose=False)
    return model, outputs


def test_constrained_poisson_end_to_end(tmp_path):
    ds = _make_labelled_dataset(tmp_path)
    model, (transformed, reconstructed, latent) = _train_and_evaluate(
        tmp_path, ds, reconstruction_distribution="constrained poisson"
    )
    assert model.config.use_count_sum_as_parameter
    assert np.isfinite(model._last_evaluation_metrics["lower_bound"])
    assert np.isfinite(np.asarray(reconstructed.values)).all()


def test_count_sum_feature_end_to_end(tmp_path):
    ds = _make_labelled_dataset(tmp_path)
    model, _ = _train_and_evaluate(
        tmp_path, ds, reconstruction_distribution="poisson", count_sum=True
    )
    assert model.config.use_count_sum_as_feature
    assert "sum" in model.name


def test_batch_correction_end_to_end(tmp_path):
    ds = _make_labelled_dataset(tmp_path, n_batches=3)
    model, _ = _train_and_evaluate(
        tmp_path, ds,
        reconstruction_distribution="poisson",
        batch_correction=True,
        number_of_batches=3,
    )
    assert "bc" in model.name.split("-")
    assert np.isfinite(model._last_evaluation_metrics["lower_bound"])


def test_importance_weighted_evaluation(tmp_path):
    ds = _make_labelled_dataset(tmp_path)
    model = VariationalAutoencoder(
        feature_size=ds.number_of_features,
        latent_size=2,
        hidden_sizes=[12],
        reconstruction_distribution="poisson",
        number_of_importance_samples={"training": 1, "evaluation": 16},
        number_of_monte_carlo_samples={"training": 1, "evaluation": 2},
        log_directory=str(tmp_path / "models"),
    )
    model.train(ds, ds, number_of_epochs=2, minibatch_size=64, verbose=False)
    model.evaluate(ds, minibatch_size=64, verbose=False)
    iw_elbo = model._last_evaluation_metrics["lower_bound"]
    assert np.isfinite(iw_elbo)
    # evaluation minibatch is scaled down by iw·mc to keep the flattened
    # batch constant (reference :1843-1847)
    assert model._scaled_minibatch_size(64, "evaluation") == 2


def test_lfm_architecture_end_to_end(tmp_path):
    ds = _make_labelled_dataset(tmp_path)
    model, _ = _train_and_evaluate(
        tmp_path, ds,
        reconstruction_distribution="poisson",
        inference_architecture="LFM",
        generative_architecture="LFM",
        minibatch_normalisation=False,
    )
    assert "ia_LFM" in model.name and "ga_LFM" in model.name


def test_categorised_counts_end_to_end(tmp_path):
    ds = _make_labelled_dataset(tmp_path)
    model, (transformed, reconstructed, latent) = _train_and_evaluate(
        tmp_path, ds,
        reconstruction_distribution="negative binomial",
        number_of_reconstruction_classes=4,
    )
    assert "k_4" in model.name
    assert np.isfinite(np.asarray(reconstructed.values)).all()


def test_noisy_preprocessing_uses_streaming(tmp_path):
    # noisy binarise = fresh Bernoulli sample per epoch; like the
    # reference it assumes [0, 1]-valued data (e.g. normalised MNIST)
    rng = np.random.RandomState(0)
    values = SparseRowMatrix(
        scipy.sparse.csr_matrix(rng.rand(200, 16).astype(np.float32))
    )
    ds = DataSet(
        "grey",
        specifications={},
        values=values,
        example_names=np.array([f"c{i}" for i in range(200)]),
        feature_names=np.array([f"g{j}" for j in range(16)]),
        noisy_preprocessing_methods=["binarise"],
        directory=str(tmp_path / "d"),
        kind="training",
    )
    model = VariationalAutoencoder(
        feature_size=16,
        latent_size=2,
        hidden_sizes=[12],
        reconstruction_distribution="bernoulli",
        log_directory=str(tmp_path / "models"),
    )
    result = model.train(
        ds, ds, number_of_epochs=2, minibatch_size=64, verbose=False
    )
    assert result.number_of_epochs_trained == 2
    assert np.isfinite(result.history["validation"]["lower_bound"][-1])
