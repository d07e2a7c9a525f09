"""GMVAE accuracy-evolution tracking, async checkpoints, mnist_keras loader."""

import numpy as np
import pytest

from scvae_tpu.data import DataSet
from scvae_tpu.models import GaussianMixtureVariationalAutoencoder, checkpoints


def test_gmvae_tracks_accuracy_curves(tmp_path):
    ds = DataSet(
        "development", directory=str(tmp_path / "d"),
        example_filter=["random", 400],
    )
    train_set, valid_set, _ = ds.split(method="random", fraction=0.9)
    model = GaussianMixtureVariationalAutoencoder(
        feature_size=25, latent_size=2, hidden_sizes=[16],
        number_of_latent_clusters=3,
        log_directory=str(tmp_path / "models"),
    )
    result = model.train(
        train_set, valid_set, number_of_epochs=2, minibatch_size=64,
        verbose=False,
    )
    curves = checkpoints.load_learning_curves(model.log_directory())
    assert "accuracy" in curves["training"]
    assert "accuracy" in curves["validation"]
    assert len(curves["training"]["accuracy"]) == 2
    for value in curves["training"]["accuracy"]:
        assert 0.0 <= value <= 1.0


def test_async_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    directory = str(tmp_path / "ckpt")
    tree = {"w": jnp.arange(6.0).reshape(2, 3)}
    checkpoints.save_checkpoint(directory, tree, epoch=3, async_write=True)
    checkpoints.copy_checkpoint_version(
        directory, str(tmp_path / "ckpt" / "best"), async_write=True
    )
    checkpoints.wait_for_pending_writes()
    restored, meta = checkpoints.restore_checkpoint(directory, tree)
    assert meta["epoch"] == 3
    np.testing.assert_array_equal(np.asarray(restored["w"]), tree["w"])
    assert checkpoints.checkpoint_exists(str(tmp_path / "ckpt" / "best"))


def test_mnist_keras_loader(tmp_path):
    from scvae_tpu.data.loaders import LOADERS

    rng = np.random.RandomState(0)
    path = str(tmp_path / "mnist.npz")
    np.savez(
        path,
        x_train=rng.randint(0, 255, (20, 4, 4), dtype=np.uint8),
        y_train=rng.randint(0, 10, 20),
        x_test=rng.randint(0, 255, (5, 4, 4), dtype=np.uint8),
        y_test=rng.randint(0, 10, 5),
    )
    d = LOADERS["mnist_keras"]({"all": {"full": path}})
    assert d["values"].shape == (25, 16)
    assert d["split indices"]["training"] == slice(0, 20)
    assert len(d["labels"]) == 25


def test_gmvae_centroid_evolution(tmp_path):
    ds = DataSet(
        "development", directory=str(tmp_path / "d"),
        example_filter=["random", 300],
    )
    train_set, valid_set, _ = ds.split(method="random", fraction=0.9)
    model = GaussianMixtureVariationalAutoencoder(
        feature_size=25, latent_size=3, hidden_sizes=[16],
        number_of_latent_clusters=4,
        log_directory=str(tmp_path / "models"),
    )
    model.train(
        train_set, valid_set, number_of_epochs=2, minibatch_size=64,
        verbose=False,
    )
    history = checkpoints.load_centroids(model.log_directory())
    assert history is not None
    assert history["probabilities"].shape == (2, 4)
    assert history["means"].shape == (2, 4, 3)
    assert history["covariance_matrices"].shape == (2, 4, 3, 3)

    from scvae_tpu import analyses

    results = analyses.analyse_model(
        model, analyses_directory=str(tmp_path / "analyses")
    )
    assert results["centroids"] is not None
    assert any("centroid" in f for f in results["figures"])
