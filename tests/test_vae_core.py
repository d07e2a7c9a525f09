"""VAE core tests: shapes, ELBO decomposition invariants, and training
actually improving the bound on synthetic count data."""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from scvae_tpu.models import (
    create_train_state,
    make_optimizer,
    make_train_step,
    tree_finite,
)
from scvae_tpu.models import vae
from scvae_tpu.models.objectives import EarlyStopping, log_reduce_exp, warm_up_weight


def make_batch(np_rng, b=16, f=10, dtype=np.float32):
    x = np_rng.poisson(2.0, size=(b, f)).astype(dtype)
    count_sum = x.sum(axis=1, keepdims=True)
    return {
        "x": jnp.asarray(x),
        "t": jnp.asarray(x),
        "count_sum": jnp.asarray(count_sum),
        "count_sum_feature": jnp.asarray(count_sum / max(count_sum.max(), 1.0)),
    }


def make_config(**kwargs):
    defaults = dict(
        feature_size=10,
        latent_size=3,
        hidden_sizes=(32,),
        reconstruction_distribution="poisson",
        minibatch_normalisation=False,
    )
    defaults.update(kwargs)
    return vae.VAEConfig(**defaults)


class TestForward:
    def test_shapes(self, rng, np_rng):
        config = make_config()
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng)
        out = vae.forward(
            config, params, state, batch, rng, training=False, n_iw=2, n_mc=3
        )
        assert out.z.shape == (6, 16, 3)
        lp = out.p_x.log_prob(batch["t"])
        assert lp.shape == (6, 16, 10)

    def test_deterministic_z_uses_mean(self, rng, np_rng):
        config = make_config()
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng)
        out = vae.forward(
            config, params, state, batch, rng, training=False, deterministic_z=True
        )
        np.testing.assert_allclose(
            np.asarray(out.z[0]), np.asarray(out.q_z.mean()), rtol=1e-6
        )

    @pytest.mark.parametrize(
        "recon",
        [
            "poisson",
            "negative binomial",
            "zero-inflated poisson",
            "zero-inflated negative binomial",
            "constrained poisson",
            "bernoulli",
            "gaussian",
            "log-normal",
            "lomax",
        ],
    )
    def test_all_reconstruction_distributions_run(self, rng, np_rng, recon):
        config = make_config(reconstruction_distribution=recon)
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng)
        metrics, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))

    def test_categorised_reconstruction(self, rng, np_rng):
        config = make_config(number_of_reconstruction_classes=4)
        params, state = vae.init(config, rng)
        assert "categorised_logits" in params
        batch = make_batch(np_rng)
        metrics, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))

    def test_count_sum_feature_and_batch_correction(self, rng, np_rng):
        config = make_config(
            count_sum=True, batch_correction=True, number_of_batches=3
        )
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng)
        batch["batch_indices"] = jnp.asarray(
            np.random.RandomState(0).randint(0, 3, size=(16, 1))
        )
        metrics, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))

    def test_lfm_architectures(self, rng, np_rng):
        config = make_config(
            inference_architecture="LFM", generative_architecture="LFM"
        )
        params, state = vae.init(config, rng)
        assert "encoder" not in params and "decoder" not in params
        batch = make_batch(np_rng)
        metrics, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=True
        )
        assert np.isfinite(float(metrics["lower_bound"]))


class TestObjective:
    def test_analytic_kl_close_to_sampled(self, rng, np_rng):
        config_a = make_config(analytical_kl_term=True)
        config_s = make_config(analytical_kl_term=False)
        params, state = vae.init(config_a, rng)
        batch = make_batch(np_rng)
        m_a, _ = vae.elbo_terms(
            config_a, params, state, batch, rng, training=False, n_mc=256
        )
        m_s, _ = vae.elbo_terms(
            config_s, params, state, batch, rng, training=False, n_mc=256
        )
        ka, ks = float(m_a["kl_divergence"]), float(m_s["kl_divergence"])
        assert abs(ka - ks) / abs(ka) < 0.1

    def test_unit_variance_latent_pins_sigma(self, rng, np_rng):
        config = make_config(latent_distribution="unit-variance gaussian")
        params, state = vae.init(config, rng)
        assert "log_sigma" not in params["posterior"]
        batch = make_batch(np_rng)
        out = vae.forward(config, params, state, batch, rng, training=False)
        np.testing.assert_allclose(np.asarray(out.q_z.scale), 1.0)

    def test_warm_up_weight_scales_kl(self, rng, np_rng):
        config = make_config()
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng)
        m0, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=False, warm_up_weight=0.0
        )
        m1, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=False, warm_up_weight=1.0
        )
        # with zero warm-up the weighted bound ignores the KL → larger
        assert float(m0["lower_bound_weighted"]) > float(m1["lower_bound_weighted"])
        # unweighted bound unchanged
        np.testing.assert_allclose(
            float(m0["lower_bound"]), float(m1["lower_bound"]), rtol=1e-6
        )

    def test_log_reduce_exp_matches_naive(self):
        x = jnp.asarray(np.random.RandomState(0).randn(5, 7).astype(np.float32))
        out = log_reduce_exp(x, axis=0)
        naive = jnp.log(jnp.mean(jnp.exp(x), axis=0))
        np.testing.assert_allclose(np.asarray(out), np.asarray(naive), rtol=1e-5)

    def test_log_reduce_exp_no_overflow(self):
        x = jnp.asarray([1000.0, 1000.0])
        assert np.isfinite(float(log_reduce_exp(x, axis=0)))

    def test_iw_bound_tightens(self, rng, np_rng):
        # IW bound with R>1 should be ≥ the R=1 ELBO (in expectation).
        config = make_config()
        params, state = vae.init(config, rng)
        batch = make_batch(np_rng, b=64)
        m1, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=False, n_iw=1, n_mc=32
        )
        m2, _ = vae.elbo_terms(
            config, params, state, batch, rng, training=False, n_iw=32, n_mc=1
        )
        assert float(m2["lower_bound"]) >= float(m1["lower_bound"]) - 0.5


class TestTraining:
    def test_elbo_improves(self, rng, np_rng):
        config = make_config(minibatch_normalisation=True, learning_rate=1e-2)
        params, state = vae.init(config, rng)
        optimizer = make_optimizer(config.learning_rate)
        ts = create_train_state(params, state, optimizer)

        def loss(params, model_state, batch, rng, warm_up_weight):
            return vae.loss_fn(
                config, params, model_state, batch, rng,
                warm_up_weight=warm_up_weight,
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = make_batch(np_rng, b=64)
        first = None
        metrics = {}
        for i in range(60):
            rng, sub = jax.random.split(rng)
            ts, metrics = train_step(ts, batch, sub, 1.0)
            if first is None:
                first = float(metrics["lower_bound"])
        assert float(metrics["lower_bound"]) > first + 1.0
        assert bool(tree_finite(ts.params))
        assert int(ts.step) == 60

    def test_batch_norm_state_updates(self, rng, np_rng):
        config = make_config(minibatch_normalisation=True)
        params, state = vae.init(config, rng)
        optimizer = make_optimizer(1e-3)
        ts = create_train_state(params, state, optimizer)

        def loss(params, model_state, batch, rng, warm_up_weight):
            return vae.loss_fn(
                config, params, model_state, batch, rng,
                warm_up_weight=warm_up_weight,
            )

        train_step = make_train_step(loss, optimizer, donate=False)
        batch = make_batch(np_rng)
        before = np.asarray(state["encoder"]["batch_norm"][0]["mean"]).copy()
        ts, _ = train_step(ts, batch, rng, 1.0)
        after = np.asarray(ts.model_state["encoder"]["batch_norm"][0]["mean"])
        assert not np.allclose(before, after)


class TestHarnessHelpers:
    def test_warm_up_schedule(self):
        assert warm_up_weight(0, 0) == 1.0
        assert warm_up_weight(0, 10) == 0.0
        assert warm_up_weight(5, 10) == 0.5
        assert warm_up_weight(20, 10) == 1.0

    def test_early_stopping(self):
        es = EarlyStopping(rounds=3)
        assert es.update(-10.0, 0)["improved"]
        assert es.update(-9.0, 1)["improved"]
        r = es.update(-9.5, 2)
        assert not r["improved"] and r["start_degrading"] and not r["stop"]
        es.update(-9.6, 3)
        r = es.update(-9.7, 4)
        assert r["stop"] and es.stopped
        assert es.best_epoch == 1

    def test_early_stopping_recovers(self):
        es = EarlyStopping(rounds=3)
        es.update(-10.0, 0)
        es.update(-11.0, 1)
        r = es.update(-9.0, 2)
        assert r["improved"] and es.epochs_without_improvement == 0
