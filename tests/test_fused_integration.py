"""Fused-likelihood VAE integration: CPU fallback path parity with the
default (distribution-library) objective, plus profiling utilities."""

import jax
import numpy as np
import pytest

from scvae_tpu.models import vae
from scvae_tpu.utils.profiling import StepTimer, log_spaced_indices


def _batch(np_rng, b=32, f=20):
    import jax.numpy as jnp

    x = np_rng.poisson(2.0, size=(b, f)).astype(np.float32)
    return {
        "x": jnp.asarray(x),
        "t": jnp.asarray(x),
        "count_sum": jnp.asarray(x.sum(axis=1, keepdims=True)) + 1.0,
    }


@pytest.mark.parametrize(
    "recon",
    [
        "poisson",
        "negative binomial",
        "zero-inflated poisson",
        "zero-inflated negative binomial",
        "constrained poisson",
    ],
)
def test_fused_objective_matches_default(rng, np_rng, recon):
    batch = _batch(np_rng)
    common = dict(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        reconstruction_distribution=recon, minibatch_normalisation=False,
    )
    config_default = vae.VAEConfig(fused_likelihood=False, **common)
    config_fused = vae.VAEConfig(fused_likelihood=True, **common)
    params, state = vae.init(config_default, rng)

    m_default, _ = vae.elbo_terms(
        config_default, params, state, batch, rng, training=True
    )
    m_fused, _ = vae.elbo_terms(
        config_fused, params, state, batch, rng, training=True
    )
    np.testing.assert_allclose(
        float(m_fused["lower_bound"]),
        float(m_default["lower_bound"]),
        rtol=2e-5,
    )
    np.testing.assert_allclose(
        float(m_fused["reconstruction_error"]),
        float(m_default["reconstruction_error"]),
        rtol=2e-5,
    )


def test_fused_gradients_match_default(rng, np_rng):
    batch = _batch(np_rng)
    common = dict(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=False,
    )
    config_default = vae.VAEConfig(fused_likelihood=False, **common)
    config_fused = vae.VAEConfig(fused_likelihood=True, **common)
    params, state = vae.init(config_default, rng)

    def make_loss(config):
        def loss(params):
            value, _ = vae.loss_fn(
                config, params, state, batch, jax.random.PRNGKey(7),
                warm_up_weight=1.0,
            )
            return value

        return loss

    g_default = jax.grad(make_loss(config_default))(params)
    g_fused = jax.grad(make_loss(config_fused))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_default),
        jax.tree_util.tree_leaves(g_fused),
    ):
        a, b = np.asarray(a), np.asarray(b)
        # tolerance scaled by the leaf's magnitude: large-count NB grads
        # reach ~1e5 and f32 summation order differs between the paths
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6 * scale)


def test_fused_flag_rejects_unsupported():
    with pytest.raises(ValueError):
        config = vae.VAEConfig(
            feature_size=10,
            reconstruction_distribution="lomax",
            fused_likelihood=True,
        )
        vae._fused_path_enabled(config)

    # categorised (k_max > 0) IS fusable since round 3 …
    config = vae.VAEConfig(
        feature_size=10,
        reconstruction_distribution="poisson",
        number_of_reconstruction_classes=4,
        fused_likelihood=True,
    )
    assert vae._fused_path_enabled(config)

    # … but not beyond the head cap (K+1 class heads must fit VMEM)
    with pytest.raises(ValueError):
        config = vae.VAEConfig(
            feature_size=10,
            reconstruction_distribution="poisson",
            number_of_reconstruction_classes=100,
            fused_likelihood=True,
        )
        vae._fused_path_enabled(config)


def test_evaluation_path_unaffected_by_fused_flag(rng, np_rng):
    batch = _batch(np_rng)
    config = vae.VAEConfig(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=False, fused_likelihood=True,
    )
    params, state = vae.init(config, rng)
    out = vae.evaluation_outputs(config, params, state, batch, rng)
    assert out["p_x_mean"].shape == (32, 20)


@pytest.mark.parametrize(
    "recon",
    [
        "poisson",
        "negative binomial",
        "constrained poisson",
    ],
)
def test_gmvae_fused_objective_matches_default(rng, np_rng, recon):
    from scvae_tpu.models import gmvae

    batch = _batch(np_rng)
    common = dict(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        number_of_latent_clusters=4,
        reconstruction_distribution=recon, minibatch_normalisation=False,
    )
    config_default = gmvae.GMVAEConfig(fused_likelihood=False, **common)
    config_fused = gmvae.GMVAEConfig(fused_likelihood=True, **common)
    params, state = gmvae.init(config_default, rng)

    m_default, _ = gmvae.elbo_terms(
        config_default, params, state, batch, rng, training=True
    )
    m_fused, _ = gmvae.elbo_terms(
        config_fused, params, state, batch, rng, training=True
    )
    for key in ("lower_bound", "reconstruction_error", "kl_divergence"):
        np.testing.assert_allclose(
            float(m_fused[key]), float(m_default[key]), rtol=2e-5
        )


def test_gmvae_fused_gradients_match_default(rng, np_rng):
    from scvae_tpu.models import gmvae

    batch = _batch(np_rng)
    common = dict(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        number_of_latent_clusters=4,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=False,
    )
    config_default = gmvae.GMVAEConfig(fused_likelihood=False, **common)
    config_fused = gmvae.GMVAEConfig(fused_likelihood=True, **common)
    params, state = gmvae.init(config_default, rng)

    def make_loss(config):
        def loss(params):
            value, _ = gmvae.loss_fn(
                config, params, state, batch, jax.random.PRNGKey(7),
                warm_up_weight=1.0,
            )
            return value

        return loss

    g_default = jax.grad(make_loss(config_default))(params)
    g_fused = jax.grad(make_loss(config_fused))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g_default),
        jax.tree_util.tree_leaves(g_fused),
    ):
        a, b = np.asarray(a), np.asarray(b)
        scale = max(np.abs(a).max(), 1.0)
        np.testing.assert_allclose(a, b, rtol=5e-3, atol=1e-6 * scale)


def test_gmvae_evaluation_path_unaffected_by_fused_flag(rng, np_rng):
    from scvae_tpu.models import gmvae

    batch = _batch(np_rng)
    config = gmvae.GMVAEConfig(
        feature_size=20, latent_size=3, hidden_sizes=(16,),
        number_of_latent_clusters=4,
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=False, fused_likelihood=True,
    )
    params, state = gmvae.init(config, rng)
    out = gmvae.evaluation_outputs(config, params, state, batch, rng)
    assert out["p_x_mean"].shape == (32, 20)


class TestProfiling:
    def test_log_spaced_indices(self):
        idx = log_spaced_indices(100)
        assert len(idx) <= 11
        assert idx[0] == 0 and idx[-1] == 99

    def test_step_timer(self):
        timer = StepTimer(items_per_step=10)
        for _ in range(3):
            with timer:
                pass
        assert len(timer.durations) == 3
        assert timer.items_per_second > 0
        assert "steps" in timer.summary()
