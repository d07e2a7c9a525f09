"""GMVAE tests: shapes, marginalised-loss invariants, clustering behaviour,
training end-to-end (SURVEY.md §4 + §7 phase 3)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scvae_tpu.data import DataSet
from scvae_tpu.models import (
    GaussianMixtureVariationalAutoencoder,
    create_train_state,
    make_optimizer,
    make_train_step,
)
from scvae_tpu.models import gmvae


def make_batch(np_rng, b=16, f=10):
    x = np_rng.poisson(2.0, size=(b, f)).astype(np.float32)
    cs = x.sum(axis=1, keepdims=True)
    return {
        "x": jnp.asarray(x),
        "t": jnp.asarray(x),
        "count_sum": jnp.asarray(cs),
        "count_sum_feature": jnp.asarray(cs / max(cs.max(), 1.0)),
    }


def make_config(**kwargs):
    defaults = dict(
        feature_size=10,
        latent_size=3,
        hidden_sizes=(16,),
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=4,
        minibatch_normalisation=False,
    )
    defaults.update(kwargs)
    return gmvae.GMVAEConfig(**defaults)


class TestForward:
    def test_shapes(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        batch = make_batch(np_rng)
        out = gmvae.forward(
            config, params, state, batch, rng, training=False, n_iw=2, n_mc=3
        )
        assert out.z.shape == (6, 4, 16, 3)  # (S, K, B, D)
        assert out.q_y.logits.shape == (16, 4)
        lp = out.p_x.log_prob(batch["t"])
        assert lp.shape == (4, 6, 16, 10)  # (K, S, B, F)

    def test_q_y_probs_normalised(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        out = gmvae.forward(
            config, params, state, make_batch(np_rng), rng, training=False
        )
        np.testing.assert_allclose(
            np.asarray(out.q_y.probs.sum(axis=-1)), 1.0, rtol=1e-5
        )

    @pytest.mark.parametrize(
        "latent", ["gaussian mixture", "full-covariance gaussian mixture",
                   "legacy gaussian mixture"]
    )
    def test_latent_variants(self, rng, np_rng, latent):
        config = make_config(latent_distribution=latent)
        params, state = gmvae.init(config, rng)
        metrics, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))

    @pytest.mark.parametrize("prior", ["uniform", "learn"])
    def test_prior_methods(self, rng, np_rng, prior):
        config = make_config(prior_probabilities_method=prior)
        params, state = gmvae.init(config, rng)
        if prior == "learn":
            assert "p_y_logits" in params
        metrics, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))

    def test_custom_prior(self, rng, np_rng):
        config = make_config(
            prior_probabilities_method="custom",
            prior_probabilities=(0.1, 0.2, 0.3, 0.4),
        )
        params, state = gmvae.init(config, rng)
        out = gmvae.forward(
            config, params, state, make_batch(np_rng), rng, training=False
        )
        np.testing.assert_allclose(
            np.asarray(out.p_y.probs), [0.1, 0.2, 0.3, 0.4], rtol=1e-5
        )

    def test_categorised_reconstruction(self, rng, np_rng):
        config = make_config(number_of_reconstruction_classes=3)
        params, state = gmvae.init(config, rng)
        metrics, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))


class TestObjective:
    def test_kl_y_uniform_bounded_by_log_k(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        metrics, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=False
        )
        kl_y = float(metrics["kl_divergence_y"])
        assert 0.0 <= kl_y <= np.log(4) + 1e-5

    def test_kl_decomposition(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        metrics, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=False
        )
        np.testing.assert_allclose(
            float(metrics["kl_divergence"]),
            float(metrics["kl_divergence_z"]) + float(metrics["kl_divergence_y"]),
            rtol=1e-5,
        )
        np.testing.assert_allclose(
            float(metrics["lower_bound"]),
            float(metrics["reconstruction_error"])
            - float(metrics["kl_divergence"]),
            rtol=1e-5,
        )

    def test_free_nats_floor(self, rng, np_rng):
        """Pins the reference's free-nats semantics
        (gaussian_mixture_variational_autoencoder.py:3391-3398): the floor
        is applied to the BATCH-MEAN KL_y at proportion × H(p_y) and only
        modifies the weighted training objective, never the reported
        bound."""
        config = make_config(
            proportion_of_free_nats_for_y_kl_divergence=1.0
        )
        params, state = gmvae.init(config, rng)
        batch = make_batch(np_rng)
        m, _ = gmvae.elbo_terms(
            config, params, state, batch, rng, training=False,
            warm_up_weight=1.0,
        )
        k = config.number_of_latent_clusters
        kl_y_modified = max(float(m["kl_divergence_y"]), float(np.log(k)))
        np.testing.assert_allclose(
            float(m["lower_bound_weighted"]),
            float(m["reconstruction_error"])
            - (float(m["kl_divergence_z"]) + kl_y_modified),
            rtol=1e-5,
        )
        # The unweighted bound keeps the true (unfloored) KL_y.
        np.testing.assert_allclose(
            float(m["lower_bound"]),
            float(m["reconstruction_error"])
            - float(m["kl_divergence_z"])
            - float(m["kl_divergence_y"]),
            rtol=1e-5,
        )
        # At init q(y|x) ≈ uniform so KL_y ≈ 0 < log K: the floor binds.
        assert float(m["kl_divergence_y"]) < float(np.log(k))
        assert (
            float(m["lower_bound_weighted"])
            < float(m["lower_bound"]) - 0.5 * float(np.log(k))
        )

    def test_warm_up_removes_kl(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        batch = make_batch(np_rng)
        m0, _ = gmvae.elbo_terms(
            config, params, state, batch, rng, training=False,
            warm_up_weight=0.0,
        )
        np.testing.assert_allclose(
            float(m0["lower_bound_weighted"]),
            float(m0["reconstruction_error"]),
            rtol=1e-5,
        )

    def test_kl_divergence_neurons_shape(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        m, _ = gmvae.elbo_terms(
            config, params, state, make_batch(np_rng), rng, training=False
        )
        assert m["kl_divergence_neurons"].shape == (3,)
        np.testing.assert_allclose(
            float(jnp.sum(m["kl_divergence_neurons"])),
            float(m["kl_divergence_z"]),
            rtol=1e-4,
        )


class TestTraining:
    def test_elbo_improves_and_gradients_flow(self, rng, np_rng):
        config = make_config(minibatch_normalisation=True, learning_rate=1e-2)
        params, state = gmvae.init(config, rng)
        optimizer = make_optimizer(1e-2)
        ts = create_train_state(params, state, optimizer)

        def loss(params, model_state, batch, rng, wuw):
            return gmvae.loss_fn(
                config, params, model_state, batch, rng, warm_up_weight=wuw
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = make_batch(np_rng, b=64)
        first = None
        for _ in range(40):
            rng, sub = jax.random.split(rng)
            ts, metrics = train_step(ts, batch, sub, 1.0)
            if first is None:
                first = float(metrics["lower_bound"])
        assert float(metrics["lower_bound"]) > first + 1.0

    def test_evaluation_outputs(self, rng, np_rng):
        config = make_config()
        params, state = gmvae.init(config, rng)
        batch = make_batch(np_rng)
        out = gmvae.evaluation_outputs(
            config, params, state, batch, rng, n_iw=2, n_mc=2
        )
        assert out["p_x_mean"].shape == (16, 10)
        assert out["q_z_mean"].shape == (16, 3)
        assert out["y_probs"].shape == (16, 4)
        assert out["cluster_ids"].shape == (16,)
        np.testing.assert_allclose(
            float(out["q_y_probabilities"].sum()), 1.0, rtol=1e-5
        )


class TestGMVAEApi:
    @pytest.fixture(scope="class")
    def dev_sets(self, tmp_path_factory):
        directory = str(tmp_path_factory.mktemp("data"))
        ds = DataSet(
            "development", directory=directory,
            example_filter=["random", 500],
        )
        return ds.split(method="random", fraction=0.9)

    def test_name_includes_clusters(self, tmp_path):
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25,
            latent_size=2,
            hidden_sizes=[16],
            number_of_latent_clusters=3,
            log_directory=str(tmp_path),
        )
        assert "GMVAE" in model.name
        assert "c_3" in model.name

    def test_train_evaluate_sample(self, tmp_path, dev_sets):
        train_set, valid_set, test_set = dev_sets
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25,
            latent_size=2,
            hidden_sizes=[16],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=3,
            log_directory=str(tmp_path / "models"),
        )
        result = model.train(
            train_set, valid_set, number_of_epochs=2, minibatch_size=64,
            learning_rate=1e-3, verbose=False,
        )
        assert result.number_of_epochs_trained == 2

        transformed, reconstructed, latent = model.evaluate(
            test_set, minibatch_size=64, verbose=False
        )
        assert transformed.has_predicted_cluster_ids
        assert transformed.predicted_cluster_ids.shape == (
            test_set.number_of_examples,
        )
        assert transformed.has_predicted_labels
        assert latent["z"].values.shape == (test_set.number_of_examples, 2)
        assert latent["y"].values.shape == (test_set.number_of_examples, 3)
        assert "kl_divergence_y" in model._last_evaluation_metrics

        samples = model.sample(sample_size=20, minibatch_size=10)
        assert samples.values.shape == (20, 25)

    def test_learned_prior_trains(self, tmp_path, dev_sets):
        train_set, valid_set, _ = dev_sets
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25,
            latent_size=2,
            hidden_sizes=[16],
            number_of_latent_clusters=3,
            prior_probabilities_method="learn",
            log_directory=str(tmp_path / "models"),
        )
        result = model.train(
            train_set, valid_set, number_of_epochs=1, minibatch_size=64,
            verbose=False,
        )
        assert result.number_of_epochs_trained == 1


class TestClusteringQualityGate:
    """ARI regression gate (round 3, VERDICT item 4): a silent
    cluster-collapse regression must FAIL the suite, not just degrade a
    log somewhere.  Fixed-seed bounded run (~25 s CPU); the recorded
    known-good ARI is 0.2537 (2026-08-21, CPU f32, seeds below) — the
    0.15 floor is far above collapse (ARI ≈ 0) yet tolerant of
    reduction-order noise across jax versions.  Threshold documented in
    PARITY.md §3."""

    def test_development_ari_floor(self, tmp_path):
        import numpy as np

        from scvae_tpu.analyses.metrics import adjusted_rand_index
        from scvae_tpu.data import DataSet

        ds = DataSet(
            "development",
            directory=str(tmp_path / "data"),
            example_filter=["random", 2000],
        )
        train, valid, test = ds.split(method="random", fraction=0.9)
        model = GaussianMixtureVariationalAutoencoder(
            feature_size=25,
            latent_size=10,
            hidden_sizes=[64],
            reconstruction_distribution="negative binomial",
            number_of_latent_clusters=5,
            number_of_warm_up_epochs=10,
            log_directory=str(tmp_path / "models"),
        )
        model.train(
            train, valid, number_of_epochs=30, minibatch_size=256,
            seed=0, verbose=False, data_placement="device",
            track_accuracy=False,
        )
        transformed, _, _ = model.evaluate(
            test, minibatch_size=256, output_versions="all", verbose=False
        )
        to_id = test.class_name_to_class_id
        labels = np.array([to_id[n] for n in test.labels])
        ari = adjusted_rand_index(labels, transformed.predicted_cluster_ids)
        assert ari >= 0.15, (
            f"GMVAE clustering ARI {ari:.4f} below the 0.15 regression "
            "floor (known-good 0.2537) — possible cluster collapse"
        )
