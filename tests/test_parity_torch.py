"""Independent-framework parity: with identical weights and inputs, the
ELBO computed by our JAX model must match a from-scratch PyTorch
re-implementation of the same graph (torch is CPU-only here and shares no
code with the JAX path, so this catches formula-level mistakes the
internal tests can't)."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from scvae_tpu.models import vae

TINY32 = float(np.finfo(np.float32).tiny)


def _np(x):
    return torch.from_numpy(np.array(x, np.float32))


def _clip_interior(x, lo, hi):
    lo_in = float(np.nextafter(np.float32(lo), np.float32(np.inf)))
    hi_in = float(np.nextafter(np.float32(hi), np.float32(-np.inf)))
    return torch.clamp(x, lo_in, hi_in)


@pytest.mark.parametrize("recon", ["poisson", "negative binomial"])
def test_elbo_matches_torch(rng, np_rng, recon):
    config = vae.VAEConfig(
        feature_size=12,
        latent_size=3,
        hidden_sizes=(8,),
        reconstruction_distribution=recon,
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)
    x = np_rng.poisson(2.0, size=(16, 12)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "t": jnp.asarray(x)}

    metrics, _ = vae.elbo_terms(
        config, params, state, batch, rng,
        training=False, deterministic_z=True,
    )

    # -- torch re-implementation (deterministic z = posterior mean) -------
    xt = _np(x)
    h = xt
    for layer in params["encoder"]["layers"]:
        h = torch.relu(h @ _np(layer["kernel"]) + _np(layer["bias"]))

    mu = _clip_interior(
        h @ _np(params["posterior"]["mu"]["kernel"])
        + _np(params["posterior"]["mu"]["bias"]),
        np.finfo(np.float32).min / 2,
        np.finfo(np.float32).max / 2,
    )
    log_sigma = _clip_interior(
        h @ _np(params["posterior"]["log_sigma"]["kernel"])
        + _np(params["posterior"]["log_sigma"]["bias"]),
        -3.0, 3.0,
    )
    z = mu  # deterministic

    d = z
    for layer in params["decoder"]["layers"]:
        d = torch.relu(d @ _np(layer["kernel"]) + _np(layer["bias"]))

    if recon == "poisson":
        log_lam = _clip_interior(
            d @ _np(params["reconstruction"]["log_lambda"]["kernel"])
            + _np(params["reconstruction"]["log_lambda"]["bias"]),
            -10.0, 10.0,
        )
        log_px = torch.distributions.Poisson(
            rate=torch.exp(log_lam)
        ).log_prob(xt)
    else:
        p = torch.clamp(
            torch.sigmoid(
                d @ _np(params["reconstruction"]["p"]["kernel"])
                + _np(params["reconstruction"]["p"]["bias"])
            ),
            TINY32,
            float(np.nextafter(np.float32(1.0), np.float32(0.0))),
        )
        log_r = _clip_interior(
            d @ _np(params["reconstruction"]["log_r"]["kernel"])
            + _np(params["reconstruction"]["log_r"]["bias"]),
            -10.0, 10.0,
        )
        r = torch.exp(log_r)
        log_px = (
            torch.lgamma(xt + r)
            - torch.lgamma(r)
            - torch.lgamma(1.0 + xt)
            + r * torch.log1p(-p)
            + xt * torch.log(p)
        )

    reconstruction_error = log_px.sum(dim=-1).mean()

    # deterministic-z path uses the sampled-KL formula at z = mu:
    # log q(mu|x) − log p(mu) summed over dimensions
    sigma = torch.exp(log_sigma)
    log_q = torch.distributions.Normal(mu, sigma).log_prob(z)
    log_p = torch.distributions.Normal(0.0, 1.0).log_prob(z)
    kl = (log_q - log_p).sum(dim=-1)
    lower_bound = (log_px.sum(dim=-1) - kl).mean()

    np.testing.assert_allclose(
        float(metrics["reconstruction_error"]),
        float(reconstruction_error),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(metrics["lower_bound"]), float(lower_bound), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["kl_divergence"]), float(kl.mean()), rtol=2e-3
    )


def test_kl_analytic_matches_torch(rng, np_rng):
    """Analytic gaussian KL (the training default) vs torch's closed form."""
    config = vae.VAEConfig(
        feature_size=12, latent_size=3, hidden_sizes=(8,),
        reconstruction_distribution="poisson",
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)
    x = np_rng.poisson(2.0, size=(16, 12)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "t": jnp.asarray(x)}
    metrics, outputs = vae.elbo_terms(
        config, params, state, batch, rng, training=False
    )
    mu = _np(outputs.q_z.mean())
    sigma = _np(outputs.q_z.stddev())
    kl = torch.distributions.kl_divergence(
        torch.distributions.Normal(mu, sigma),
        torch.distributions.Normal(0.0, 1.0),
    )
    np.testing.assert_allclose(
        float(metrics["kl_divergence"]),
        float(kl.mean(dim=0).sum()),
        rtol=1e-4,
    )
