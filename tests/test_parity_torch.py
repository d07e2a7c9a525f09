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


# ---------------------------------------------------------------------------
# Extended parity (round 2): injected-z single-batch parity for the count
# likelihoods, a full training-trajectory parity, and the GMVAE objective
# (reference models/variational_autoencoder.py:2560-2734 and
# gaussian_mixture_variational_autoencoder.py:3223-3434).
# ---------------------------------------------------------------------------


def _torch_mlp(layers, x):
    h = x
    for layer in layers:
        h = torch.relu(h @ _np(layer["kernel"]) + _np(layer["bias"]))
    return h


def _torch_head(head, h, activation=None, support=None):
    raw = h @ _np(head["kernel"]) + _np(head["bias"])
    if activation is not None:
        raw = activation(raw)
    if support is not None:
        raw = _clip_interior(raw, *support)
    return raw


def _torch_nb_log_prob(x, p, r):
    return (
        torch.lgamma(x + r)
        - torch.lgamma(r)
        - torch.lgamma(1.0 + x)
        + r * torch.log1p(-p)
        + torch.where(x > 0, x * torch.log(p), torch.zeros_like(x))
    )


def _torch_gaussian_log_prob(z, mu, sigma):
    return torch.distributions.Normal(mu, sigma).log_prob(z)


HALF_MIN = float(np.finfo(np.float32).min) / 2
HALF_MAX = float(np.finfo(np.float32).max) / 2


@pytest.mark.parametrize(
    "recon,k_max",
    [
        ("zero-inflated negative binomial", 0),
        ("constrained poisson", 0),
        ("negative binomial", 4),  # categorised piecewise wrapper
    ],
)
def test_elbo_matches_torch_injected_z(rng, np_rng, recon, k_max):
    """Sampled-z ELBO parity: feed the SAME z drawn by the JAX model into
    the torch re-implementation so every term matches exactly."""
    config = vae.VAEConfig(
        feature_size=12,
        latent_size=3,
        hidden_sizes=(8,),
        reconstruction_distribution=recon,
        number_of_reconstruction_classes=k_max,
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)
    x = np_rng.poisson(2.0, size=(16, 12)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "t": jnp.asarray(x)}
    if config.use_count_sum_as_parameter:
        batch["count_sum"] = jnp.asarray(x.sum(axis=1, keepdims=True))

    metrics, outputs = vae.elbo_terms(
        config, params, state, batch, rng, training=False
    )
    z = _np(outputs.z)  # (1, B, D) — the exact samples the JAX model used

    xt = _np(x)
    h = _torch_mlp(params["encoder"]["layers"], xt)
    mu = _torch_head(
        params["posterior"]["mu"], h, support=(HALF_MIN, HALF_MAX)
    )
    log_sigma = _torch_head(
        params["posterior"]["log_sigma"], h, support=(-3.0, 3.0)
    )

    d = _torch_mlp(params["decoder"]["layers"], z)

    tiny_hi = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
    if recon == "zero-inflated negative binomial":
        pi = _torch_head(
            params["reconstruction"]["pi"], d,
            activation=torch.sigmoid, support=(0.0, 1.0),
        )
        p = _torch_head(
            params["reconstruction"]["p"], d,
            activation=torch.sigmoid, support=(0.0, 1.0),
        )
        r = torch.exp(
            _torch_head(
                params["reconstruction"]["log_r"], d, support=(-10.0, 10.0)
            )
        )
        base_lp = _torch_nb_log_prob(xt, p, r)
        log_px = torch.where(
            xt > 0,
            torch.log1p(-pi) + base_lp,
            torch.logaddexp(torch.log(pi), torch.log1p(-pi) + base_lp),
        )
    elif recon == "constrained poisson":
        lam = _torch_head(
            params["reconstruction"]["lambda"], d,
            activation=lambda v: torch.softmax(v, dim=-1),
            support=(0.0, 1.0),
        )
        rate = lam * _np(np.asarray(batch["count_sum"]))
        log_px = xt * torch.log(rate) - rate - torch.lgamma(1.0 + xt)
    else:  # categorised negative binomial
        p = _torch_head(
            params["reconstruction"]["p"], d,
            activation=torch.sigmoid, support=(0.0, 1.0),
        )
        r = torch.exp(
            _torch_head(
                params["reconstruction"]["log_r"], d, support=(-10.0, 10.0)
            )
        )
        # kernel is stored class-major (K+1, H, F); build (..., F, K+1)
        kernel = _np(params["categorised_logits"]["kernel"])  # (K+1, H, F)
        bias = _np(params["categorised_logits"]["bias"])  # (K+1, F)
        logits = torch.stack(
            [d @ kernel[c] + bias[c] for c in range(k_max + 1)], dim=-1
        )  # (..., F, K+1)
        log_p_cat = torch.log_softmax(logits, dim=-1)
        idx = torch.clamp(xt, 0, k_max).long()
        cat_lp = torch.gather(
            log_p_cat,
            -1,
            idx.expand(log_p_cat.shape[:-1]).unsqueeze(-1),
        )[..., 0]
        shifted = torch.clamp(xt - k_max, min=0.0)
        base_lp = _torch_nb_log_prob(shifted, p, r)
        log_px = torch.where(xt < k_max, cat_lp, cat_lp + base_lp)

    reconstruction_error = log_px.sum(dim=-1).mean()
    # gaussian latent → the JAX model uses the ANALYTIC KL term
    sigma = torch.exp(log_sigma)
    kl = torch.distributions.kl_divergence(
        torch.distributions.Normal(mu, sigma),
        torch.distributions.Normal(0.0, 1.0),
    ).sum(dim=-1)
    lower_bound = (log_px.sum(dim=-1) - kl).mean()

    np.testing.assert_allclose(
        float(metrics["reconstruction_error"]),
        float(reconstruction_error),
        rtol=2e-4,
    )
    np.testing.assert_allclose(
        float(metrics["lower_bound"]), float(lower_bound), rtol=2e-4
    )


def test_training_trajectory_matches_torch(rng, np_rng, tmp_path):
    """Full short-training parity: identical init weights, batches, and
    deterministic-z objective trained with Adam + clip(-1,1) in both
    frameworks must produce matching ELBO trajectories — this pins the
    gradients, the optimiser, and the loop, not just the forward pass."""
    import optax

    from scvae_tpu.models import step as step_mod

    config = vae.VAEConfig(
        feature_size=12, latent_size=3, hidden_sizes=(8,),
        reconstruction_distribution="negative binomial",
        minibatch_normalisation=False,
    )
    params, state = vae.init(config, rng)
    data = np_rng.poisson(2.0, size=(64, 12)).astype(np.float32)
    lr = 1e-3
    n_steps = 20

    # -- JAX side ----------------------------------------------------------
    def loss_fn(params, model_state, batch, rng, wuw):
        metrics, outputs = vae.elbo_terms(
            config, params, model_state, batch, rng,
            training=True, deterministic_z=True, warm_up_weight=wuw,
        )
        return -metrics["lower_bound_weighted"], (metrics, outputs.new_state)

    optimizer = step_mod.make_optimizer(lr)
    ts = step_mod.create_train_state(params, state, optimizer)
    train_step = step_mod.make_train_step(loss_fn, optimizer, donate=False)
    jax_curve = []
    for i in range(n_steps):
        batch_np = data[(i % 4) * 16:(i % 4 + 1) * 16]
        batch = {"x": jnp.asarray(batch_np), "t": jnp.asarray(batch_np)}
        ts, metrics = train_step(ts, batch, jax.random.PRNGKey(i), 1.0)
        jax_curve.append(float(metrics["lower_bound"]))

    # -- torch side (same init, same batches) -------------------------------
    t_params = {
        "enc": [
            (
                torch.nn.Parameter(_np(layer["kernel"])),
                torch.nn.Parameter(_np(layer["bias"])),
            )
            for layer in params["encoder"]["layers"]
        ],
        "dec": [
            (
                torch.nn.Parameter(_np(layer["kernel"])),
                torch.nn.Parameter(_np(layer["bias"])),
            )
            for layer in params["decoder"]["layers"]
        ],
        "heads": {
            name: (
                torch.nn.Parameter(_np(head["kernel"])),
                torch.nn.Parameter(_np(head["bias"])),
            )
            for name, head in {
                **params["posterior"], **params["reconstruction"]
            }.items()
        },
    }
    flat = [p for pair in t_params["enc"] + t_params["dec"] for p in pair]
    flat += [p for pair in t_params["heads"].values() for p in pair]
    optimiser = torch.optim.Adam(flat, lr=lr)

    def torch_loss(batch_np):
        xt = _np(batch_np)
        h = xt
        for kernel, bias in t_params["enc"]:
            h = torch.relu(h @ kernel + bias)
        mu_k, mu_b = t_params["heads"]["mu"]
        ls_k, ls_b = t_params["heads"]["log_sigma"]
        mu = _clip_interior(h @ mu_k + mu_b, HALF_MIN, HALF_MAX)
        log_sigma = _clip_interior(h @ ls_k + ls_b, -3.0, 3.0)
        z = mu
        d = z
        for kernel, bias in t_params["dec"]:
            d = torch.relu(d @ kernel + bias)
        p_k, p_b = t_params["heads"]["p"]
        r_k, r_b = t_params["heads"]["log_r"]
        tiny = float(np.finfo(np.float32).tiny)
        hi = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
        p = torch.clamp(torch.sigmoid(d @ p_k + p_b), tiny, hi)
        r = torch.exp(_clip_interior(d @ r_k + r_b, -10.0, 10.0))
        log_px = _torch_nb_log_prob(xt, p, r).sum(dim=-1)
        sigma = torch.exp(log_sigma)
        kl = (
            _torch_gaussian_log_prob(z, mu, sigma)
            - _torch_gaussian_log_prob(
                z, torch.zeros_like(z), torch.ones_like(z)
            )
        ).sum(dim=-1)
        return -(log_px - kl).mean()

    torch_curve = []
    for i in range(n_steps):
        batch_np = data[(i % 4) * 16:(i % 4 + 1) * 16]
        optimiser.zero_grad()
        loss = torch_loss(batch_np)
        loss.backward()
        for p in flat:  # reference clips gradient VALUES to [-1, 1]
            if p.grad is not None:
                p.grad.clamp_(-1.0, 1.0)
        optimiser.step()
        torch_curve.append(-float(loss))

    np.testing.assert_allclose(jax_curve, torch_curve, rtol=1e-3)


def test_gmvae_objective_matches_torch(rng, np_rng):
    """GMVAE y-marginalised objective parity with injected z samples
    (reference ``gaussian_mixture_variational_autoencoder.py:3223-3434``)."""
    from scvae_tpu.models import gmvae

    k = 3
    config = gmvae.GMVAEConfig(
        feature_size=12, latent_size=3, hidden_sizes=(8,),
        reconstruction_distribution="negative binomial",
        number_of_latent_clusters=k,
        minibatch_normalisation=False,
    )
    params, state = gmvae.init(config, rng)
    x = np_rng.poisson(2.0, size=(16, 12)).astype(np.float32)
    batch = {"x": jnp.asarray(x), "t": jnp.asarray(x)}

    metrics, outputs = gmvae.elbo_terms(
        config, params, state, batch, rng, training=False
    )
    z = _np(outputs.z)  # (S=1, K, B, D), exact samples

    xt = _np(x)
    b = 16

    # q(y|x)
    h_y = _torch_mlp(params["q_y"]["encoder"]["layers"], xt)
    q_y_logits = _torch_head(params["q_y"]["logits"], h_y)
    q_y_log_probs = torch.log_softmax(q_y_logits, dim=-1)  # (B, K)
    q_y_probs = q_y_log_probs.exp()

    # q(z|x,y_k) on concat(x, onehot)
    q_z_means, q_z_scales = [], []
    for cluster in range(k):
        onehot = torch.zeros(b, k)
        onehot[:, cluster] = 1.0
        h = _torch_mlp(
            params["q_z"]["encoder"]["layers"],
            torch.cat([xt, onehot], dim=-1),
        )
        mean = _torch_head(
            params["q_z"]["heads"]["mean"], h, support=(HALF_MIN, HALF_MAX)
        )
        sp = _torch_head(
            params["q_z"]["heads"]["softplus_scale"], h,
            support=(HALF_MIN, HALF_MAX),
        )
        q_z_means.append(mean)
        q_z_scales.append(torch.sqrt(torch.nn.functional.softplus(sp)))
    q_z_mean = torch.stack(q_z_means)  # (K, B, D)
    q_z_scale = torch.stack(q_z_scales)

    # p(z|y_k) heads on the one-hot rows
    eye = torch.eye(k)
    p_z_mean = _torch_head(
        params["p_z"]["heads"]["mean"], eye, support=(HALF_MIN, HALF_MAX)
    )[:, None, :]
    p_z_scale = torch.sqrt(
        torch.nn.functional.softplus(
            _torch_head(
                params["p_z"]["heads"]["softplus_scale"], eye,
                support=(HALF_MIN, HALF_MAX),
            )
        )
    )[:, None, :]

    z0 = z[0]  # (K, B, D)
    log_q_z = _torch_gaussian_log_prob(z0, q_z_mean, q_z_scale).sum(-1)
    log_p_z = _torch_gaussian_log_prob(z0, p_z_mean, p_z_scale).sum(-1)
    kl_z = ((log_q_z - log_p_z) * q_y_probs.T).sum(0).mean()

    # decoder per cluster
    log_px_k = []
    tiny = float(np.finfo(np.float32).tiny)
    hi = float(np.nextafter(np.float32(1.0), np.float32(0.0)))
    for cluster in range(k):
        d = _torch_mlp(params["decoder"]["layers"], z0[cluster])
        p = torch.clamp(
            torch.sigmoid(
                d @ _np(params["reconstruction"]["p"]["kernel"])
                + _np(params["reconstruction"]["p"]["bias"])
            ),
            tiny, hi,
        )
        r = torch.exp(
            _clip_interior(
                d @ _np(params["reconstruction"]["log_r"]["kernel"])
                + _np(params["reconstruction"]["log_r"]["bias"]),
                -10.0, 10.0,
            )
        )
        log_px_k.append(_torch_nb_log_prob(xt, p, r).sum(-1))
    log_px = torch.stack(log_px_k)  # (K, B)
    recon = (log_px * q_y_probs.T).sum(0).mean()

    # KL_y for the uniform prior: log K − H(q)
    q_y_entropy = -(q_y_probs * q_y_log_probs).sum(-1)
    kl_y = (float(np.log(k)) - q_y_entropy).mean()

    np.testing.assert_allclose(
        float(metrics["reconstruction_error"]), float(recon), rtol=2e-4
    )
    np.testing.assert_allclose(
        float(metrics["kl_divergence_z"]), float(kl_z), rtol=2e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        float(metrics["kl_divergence_y"]), float(kl_y), rtol=2e-3, atol=1e-6
    )
    np.testing.assert_allclose(
        float(metrics["lower_bound"]),
        float(recon - kl_z - kl_y),
        rtol=2e-4,
    )
