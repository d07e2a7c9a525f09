"""End-to-end API tests: train → checkpoint versions → resume → evaluate →
sample on the development dataset (SURVEY.md §4 items 3/5)."""

import os

import numpy as np
import pytest

from scvae_tpu.data import DataSet
from scvae_tpu.models import VariationalAutoencoder
from scvae_tpu.models import checkpoints


@pytest.fixture(scope="module")
def dev_sets(tmp_path_factory):
    directory = str(tmp_path_factory.mktemp("data"))
    ds = DataSet(
        "development",
        directory=directory,
        example_filter=["random", 600],
    )
    train, valid, test = ds.split(method="random", fraction=0.9)
    return train, valid, test


def make_model(tmp_path, **kwargs):
    defaults = dict(
        feature_size=25,
        latent_size=2,
        hidden_sizes=[16],
        reconstruction_distribution="poisson",
        minibatch_normalisation=True,
        log_directory=str(tmp_path / "models"),
    )
    defaults.update(kwargs)
    return VariationalAutoencoder(**defaults)


class TestNaming:
    def test_model_name_layout(self, tmp_path):
        model = make_model(tmp_path)
        assert model.name == os.path.join(
            "VAE", "gaussian", "poisson-l_2-h_16-mc_1-iw_1-kl-bn"
        )

    def test_name_encodes_options(self, tmp_path):
        model = make_model(
            tmp_path,
            reconstruction_distribution="negative binomial",
            number_of_reconstruction_classes=4,
            count_sum=True,
            number_of_warm_up_epochs=10,
            kl_weight=0.5,
        )
        name = model.name
        assert "negative_binomial" in name
        assert "k_4" in name and "sum" in name
        assert "klw_0.5" in name and "wu_10" in name
        assert "kl" in name.split("-")  # gaussian latent → analytic KL tag

    def test_log_directory_versions(self, tmp_path):
        model = make_model(tmp_path)
        base = model.log_directory()
        assert model.log_directory(best_model=True) == os.path.join(base, "best")
        assert model.log_directory(early_stopping=True) == os.path.join(
            base, "early_stopping"
        )
        with pytest.raises(ValueError):
            model.log_directory(early_stopping=True, best_model=True)


class TestTrainEvaluateSample:
    def test_full_cycle(self, tmp_path, dev_sets):
        train_set, valid_set, test_set = dev_sets
        model = make_model(tmp_path)
        result = model.train(
            train_set,
            valid_set,
            number_of_epochs=3,
            minibatch_size=64,
            learning_rate=1e-3,
            verbose=False,
        )
        assert result.number_of_epochs_trained == 3
        assert model.has_been_trained()
        assert model.better_model_exists()  # best/ copy exists

        curves = checkpoints.load_learning_curves(model.log_directory())
        assert len(curves["training"]["lower_bound"]) == 3
        assert len(curves["validation"]["lower_bound"]) == 3

        # ELBO improves over epochs
        lb = curves["training"]["lower_bound"]
        assert lb[-1] > lb[0]

        # evaluate end-of-training version
        transformed, reconstructed, latent = model.evaluate(
            test_set, minibatch_size=64, verbose=False
        )
        assert reconstructed.version == "reconstructed"
        assert reconstructed.values.shape == (test_set.number_of_examples, 25)
        assert latent.version == "z"
        assert latent.values.shape == (test_set.number_of_examples, 2)
        assert np.isfinite(model._last_evaluation_metrics["lower_bound"])

        # evaluate best version
        model.evaluate(
            test_set, minibatch_size=64, use_best_model=True, verbose=False
        )

        # sampling
        samples = model.sample(sample_size=30, minibatch_size=16)
        assert samples.values.shape == (30, 25)
        assert np.isfinite(np.asarray(samples.values)).all()

    def test_resume_continues_from_checkpoint(self, tmp_path, dev_sets):
        train_set, valid_set, _ = dev_sets
        model = make_model(tmp_path)
        model.train(
            train_set, valid_set, number_of_epochs=2, minibatch_size=64,
            verbose=False,
        )
        assert model.number_of_epochs_trained() == 2
        result = model.train(
            train_set, valid_set, number_of_epochs=4, minibatch_size=64,
            verbose=False,
        )
        assert result.number_of_epochs_trained == 4
        curves = checkpoints.load_learning_curves(model.log_directory())
        assert len(curves["validation"]["lower_bound"]) == 4

    def test_reset_training(self, tmp_path, dev_sets):
        train_set, valid_set, _ = dev_sets
        model = make_model(tmp_path)
        model.train(
            train_set, valid_set, number_of_epochs=1, minibatch_size=64,
            verbose=False,
        )
        model.train(
            train_set, valid_set, number_of_epochs=1, minibatch_size=64,
            reset_training=True, verbose=False,
        )
        curves = checkpoints.load_learning_curves(model.log_directory())
        assert len(curves["validation"]["lower_bound"]) == 1

    def test_run_id_isolates(self, tmp_path, dev_sets):
        train_set, valid_set, _ = dev_sets
        model = make_model(tmp_path)
        model.train(
            train_set, valid_set, number_of_epochs=1, minibatch_size=64,
            run_id="abc", verbose=False,
        )
        assert model.has_been_trained(run_id="abc")
        assert not model.has_been_trained()

    def test_minibatch_scaled_by_samples(self, tmp_path):
        model = make_model(
            tmp_path,
            number_of_monte_carlo_samples={"training": 2, "evaluation": 1},
            number_of_importance_samples={"training": 5, "evaluation": 1},
        )
        assert model._scaled_minibatch_size(100, "training") == 10
        assert model._scaled_minibatch_size(100, "evaluation") == 100


class TestCheckpoints:
    def test_roundtrip(self, tmp_path, rng):
        import jax.numpy as jnp

        tree = {"a": jnp.ones((3, 2)), "b": [jnp.zeros(4), jnp.full((2,), 7.0)]}
        directory = str(tmp_path / "ckpt")
        checkpoints.save_checkpoint(directory, tree, epoch=5, step=123)
        restored, meta = checkpoints.restore_checkpoint(directory, tree)
        assert meta["epoch"] == 5 and meta["step"] == 123
        np.testing.assert_array_equal(np.asarray(restored["b"][1]), [7.0, 7.0])

    def test_shape_mismatch_raises(self, tmp_path):
        import jax.numpy as jnp

        directory = str(tmp_path / "ckpt")
        checkpoints.save_checkpoint(directory, {"a": jnp.ones(3)}, epoch=1)
        with pytest.raises(ValueError):
            checkpoints.restore_checkpoint(directory, {"a": jnp.ones(4)})


class TestDeferredMetricsFetch:
    """fetch_mode="deferred" pipelines host processing one epoch behind the
    device; the recorded curves must be identical to sync mode."""

    def test_curves_match_sync(self, tmp_path, dev_sets):
        train, valid, _ = dev_sets
        common = dict(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
        )
        kwargs = dict(
            number_of_epochs=4, minibatch_size=128, seed=0,
            data_placement="device", verbose=False,
        )
        sync_model = VariationalAutoencoder(
            log_directory=str(tmp_path / "sync"), **common
        )
        r_sync = sync_model.train(train, valid, metrics_fetch="sync",
                                  **kwargs)
        deferred_model = VariationalAutoencoder(
            log_directory=str(tmp_path / "deferred"), **common
        )
        r_def = deferred_model.train(train, valid, metrics_fetch="deferred",
                                     **kwargs)
        for kind in ("training", "validation"):
            for key in r_sync.history[kind]:
                np.testing.assert_allclose(
                    r_sync.history[kind][key],
                    r_def.history[kind][key],
                    rtol=1e-6,
                    err_msg=f"{kind}/{key}",
                )
        assert r_def.number_of_epochs_trained == 4

    def test_streaming_falls_back_to_sync(self, tmp_path, dev_sets):
        train, valid, _ = dev_sets
        model = VariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            reconstruction_distribution="poisson",
            log_directory=str(tmp_path / "stream"),
        )
        result = model.train(
            train, valid, number_of_epochs=2, minibatch_size=128,
            data_placement="streaming", metrics_fetch="deferred",
            verbose=False,
        )
        assert result.number_of_epochs_trained == 2

    def test_invalid_mode_raises(self, tmp_path, dev_sets):
        train, valid, _ = dev_sets
        model = VariationalAutoencoder(
            feature_size=25, latent_size=2, hidden_sizes=[16],
            log_directory=str(tmp_path / "bad"),
        )
        with pytest.raises(ValueError):
            model.train(train, valid, number_of_epochs=1,
                        metrics_fetch="lazy", verbose=False)
