"""Unit tests: every likelihood's log_prob/mean/variance vs scipy closed
forms (SURVEY.md §4 item 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.stats as st

from scvae_tpu.distributions import (
    DISTRIBUTIONS,
    Bernoulli,
    Categorical,
    Categorised,
    ExponentiallyModifiedNormal,
    Gamma,
    GaussianMixture,
    LogNormal,
    Lomax,
    MultivariateNormalDiag,
    MultivariateNormalTriL,
    NegativeBinomial,
    Normal,
    Poisson,
    ZeroInflated,
    fill_triangular,
    kl_divergence,
    parse_distribution,
)

ATOL = 1e-5
RTOL = 1e-5


def _allclose(a, b, atol=ATOL, rtol=RTOL):
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=atol, rtol=rtol)


class TestPoisson:
    def test_log_prob_matches_scipy(self):
        x = np.arange(0, 20, dtype=np.float32)
        log_rate = np.float32(1.3)
        d = Poisson(log_rate=jnp.asarray(log_rate))
        _allclose(d.log_prob(x), st.poisson.logpmf(x, np.exp(log_rate)))

    def test_moments(self):
        d = Poisson(log_rate=jnp.asarray(0.7))
        _allclose(d.mean(), np.exp(0.7), rtol=1e-6)
        _allclose(d.variance(), np.exp(0.7), rtol=1e-6)

    def test_sample_mean(self, rng):
        d = Poisson(log_rate=jnp.asarray(1.5))
        s = d.sample(rng, (20000,))
        assert abs(float(s.mean()) - np.exp(1.5)) < 0.1


class TestNegativeBinomial:
    def test_log_prob_matches_scipy(self):
        # TFP convention: probs = success prob; scipy nbinom uses p = 1 - probs.
        x = np.arange(0, 30, dtype=np.float32)
        r, p = 2.5, 0.3
        d = NegativeBinomial(total_count=jnp.asarray(r), probs=jnp.asarray(p))
        _allclose(d.log_prob(x), st.nbinom.logpmf(x, r, 1.0 - p))

    def test_moments(self):
        r, p = 3.0, 0.4
        d = NegativeBinomial(total_count=jnp.asarray(r), probs=jnp.asarray(p))
        _allclose(d.mean(), st.nbinom.mean(r, 1.0 - p), rtol=1e-6)
        _allclose(d.variance(), st.nbinom.var(r, 1.0 - p), rtol=1e-6)

    def test_sample_moments(self, rng):
        r, p = 4.0, 0.5
        d = NegativeBinomial(total_count=jnp.asarray(r), probs=jnp.asarray(p))
        s = np.asarray(d.sample(rng, (40000,)))
        assert abs(s.mean() - st.nbinom.mean(r, 1.0 - p)) < 0.1
        assert abs(s.var() - st.nbinom.var(r, 1.0 - p)) < 0.3


class TestBernoulli:
    def test_log_prob(self):
        logits = np.float32(0.37)
        d = Bernoulli(logits=jnp.asarray(logits))
        p = 1 / (1 + np.exp(-logits))
        _allclose(d.log_prob(np.float32(1.0)), np.log(p))
        _allclose(d.log_prob(np.float32(0.0)), np.log1p(-p))


class TestCategorical:
    def test_log_prob_and_moments(self):
        logits = np.array([0.1, -1.2, 2.0, 0.5], np.float32)
        d = Categorical(logits=jnp.asarray(logits))
        probs = np.exp(logits) / np.exp(logits).sum()
        for k in range(4):
            _allclose(d.log_prob(jnp.asarray(float(k))), np.log(probs[k]))
        ks = np.arange(4)
        _allclose(d.mean(), (probs * ks).sum())
        _allclose(d.variance(), (probs * ks**2).sum() - (probs * ks).sum() ** 2)


class TestGamma:
    def test_log_prob(self):
        x = np.linspace(0.05, 8.0, 40).astype(np.float32)
        a, b = 2.2, 1.7
        d = Gamma(concentration=jnp.asarray(a), rate=jnp.asarray(b))
        _allclose(d.log_prob(x), st.gamma.logpdf(x, a, scale=1 / b), atol=1e-4)


class TestNormalFamily:
    def test_normal(self):
        x = np.linspace(-4, 4, 33).astype(np.float32)
        d = Normal(loc=jnp.asarray(0.3), scale=jnp.asarray(1.7))
        _allclose(d.log_prob(x), st.norm.logpdf(x, 0.3, 1.7))

    def test_log_normal(self):
        x = np.linspace(0.05, 5, 33).astype(np.float32)
        d = LogNormal(loc=jnp.asarray(0.2), scale=jnp.asarray(0.8))
        _allclose(d.log_prob(x), st.lognorm.logpdf(x, 0.8, scale=np.exp(0.2)))
        _allclose(d.mean(), st.lognorm.mean(0.8, scale=np.exp(0.2)), rtol=1e-5)
        _allclose(d.variance(), st.lognorm.var(0.8, scale=np.exp(0.2)), rtol=1e-4)

    def test_kl_normal_analytic_vs_sampled(self, rng):
        q = Normal(loc=jnp.asarray(0.5), scale=jnp.asarray(0.7))
        p = Normal(loc=jnp.asarray(0.0), scale=jnp.asarray(1.0))
        analytic = float(kl_divergence(q, p))
        z = q.sample(rng, (200000,))
        sampled = float(jnp.mean(q.log_prob(z) - p.log_prob(z)))
        assert abs(analytic - sampled) < 0.01


class TestLomax:
    def test_log_prob(self):
        x = np.linspace(0.0, 10, 21).astype(np.float32)
        a, lam = 2.5, 1.3
        d = Lomax(concentration=jnp.asarray(a), scale=jnp.asarray(lam))
        _allclose(d.log_prob(x), st.lomax.logpdf(x, a, scale=lam), atol=1e-4)
        _allclose(d.cdf(x), st.lomax.cdf(x, a, scale=lam), atol=1e-5)
        _allclose(d.mean(), st.lomax.mean(a, scale=lam), rtol=1e-5)
        _allclose(d.variance(), st.lomax.var(a, scale=lam), rtol=1e-4)

    def test_undefined_moments(self):
        d = Lomax(concentration=jnp.asarray(0.8), scale=jnp.asarray(1.0))
        assert np.isnan(float(d.mean()))
        d2 = Lomax(concentration=jnp.asarray(1.5), scale=jnp.asarray(1.0))
        assert np.isinf(float(d2.variance()))

    def test_sampling_ks(self, rng):
        a, lam = 3.0, 2.0
        d = Lomax(concentration=jnp.asarray(a), scale=jnp.asarray(lam))
        s = np.asarray(d.sample(rng, (20000,)))
        stat, pvalue = st.kstest(s, lambda v: st.lomax.cdf(v, a, scale=lam))
        assert pvalue > 1e-3


class TestExponentiallyModifiedNormal:
    def test_log_prob(self):
        x = np.linspace(-3, 12, 31).astype(np.float32)
        mu, sigma, lam = 0.5, 1.2, 0.8
        d = ExponentiallyModifiedNormal(
            loc=jnp.asarray(mu), scale=jnp.asarray(sigma), rate=jnp.asarray(lam)
        )
        # scipy exponnorm: K = 1/(sigma*lambda)
        ref = st.exponnorm.logpdf(x, 1 / (sigma * lam), loc=mu, scale=sigma)
        _allclose(d.log_prob(x), ref, atol=1e-4)
        _allclose(d.mean(), st.exponnorm.mean(1 / (sigma * lam), mu, sigma), rtol=1e-5)
        _allclose(
            d.variance(), st.exponnorm.var(1 / (sigma * lam), mu, sigma), rtol=1e-5
        )

    def test_sampling_ks(self, rng):
        mu, sigma, lam = 0.0, 1.0, 0.5
        d = ExponentiallyModifiedNormal(
            loc=jnp.asarray(mu), scale=jnp.asarray(sigma), rate=jnp.asarray(lam)
        )
        s = np.asarray(d.sample(rng, (20000,)))
        _, pvalue = st.kstest(
            s, lambda v: st.exponnorm.cdf(v, 1 / (sigma * lam), mu, sigma)
        )
        assert pvalue > 1e-3


class TestZeroInflated:
    def test_zip_log_prob(self):
        pi, lam = 0.3, 2.0
        d = ZeroInflated(
            dist=Poisson(log_rate=jnp.asarray(np.log(lam), np.float32)),
            pi=jnp.asarray(pi, np.float32),
        )
        x = np.arange(0, 15, dtype=np.float32)
        base = st.poisson.pmf(x, lam)
        expected = np.where(
            x > 0, np.log(1 - pi) + st.poisson.logpmf(x, lam), np.log(pi + (1 - pi) * base)
        )
        _allclose(d.log_prob(x), expected, atol=1e-5)
        # mass sums to one over a generous support
        xs = np.arange(0, 60, dtype=np.float32)
        total = np.exp(np.asarray(d.log_prob(xs))).sum()
        assert abs(total - 1.0) < 1e-5

    def test_zinb_moments_vs_samples(self, rng):
        pi, r, p = 0.25, 3.0, 0.4
        d = ZeroInflated(
            dist=NegativeBinomial(total_count=jnp.asarray(r), probs=jnp.asarray(p)),
            pi=jnp.asarray(pi),
        )
        s = np.asarray(d.sample(rng, (60000,)))
        assert abs(s.mean() - float(d.mean())) < 0.05
        assert abs(s.var() - float(d.variance())) < 0.3

    def test_zip_degenerate_pi_zero(self):
        lam = 1.5
        d = ZeroInflated(
            dist=Poisson(log_rate=jnp.asarray(np.log(lam), np.float32)),
            pi=jnp.asarray(1e-38, np.float32),
        )
        x = np.arange(0, 10, dtype=np.float32)
        _allclose(d.log_prob(x), st.poisson.logpmf(x, lam), atol=1e-4)


class TestCategorised:
    def _make(self, k_max=4, lam=3.0):
        logits = jnp.asarray(
            np.array([0.2, -0.5, 1.0, 0.3, 0.7], np.float32)
        )  # K+1 = 5 classes → event_size K = 4
        cat = Categorical(logits=logits)
        dist = Poisson(log_rate=jnp.asarray(np.log(lam), np.float32))
        return Categorised(dist=dist, cat=cat), logits, lam

    def test_event_size(self):
        d, _, _ = self._make()
        assert d.event_size == 4

    def test_log_prob_piecewise(self):
        d, logits, lam = self._make()
        log_probs = np.asarray(jax.nn.log_softmax(logits))
        k = 4
        # below the boundary: pure categorical
        for x in range(k):
            _allclose(d.log_prob(jnp.asarray(float(x))), log_probs[x])
        # at/above the boundary: cat mass at K times shifted base
        for x in [4, 5, 9]:
            expected = log_probs[k] + st.poisson.logpmf(x - k, lam)
            _allclose(d.log_prob(jnp.asarray(float(x))), expected, atol=1e-5)

    def test_normalised(self):
        d, _, _ = self._make()
        xs = np.arange(0, 80, dtype=np.float32)
        total = np.exp(np.asarray(d.log_prob(xs))).sum()
        assert abs(total - 1.0) < 1e-5

    def test_moments_vs_numeric(self):
        d, _, _ = self._make()
        xs = np.arange(0, 200, dtype=np.float32)
        pmf = np.exp(np.asarray(d.log_prob(xs)))
        num_mean = (pmf * xs).sum()
        num_var = (pmf * xs**2).sum() - num_mean**2
        _allclose(d.mean(), num_mean, atol=1e-4)
        _allclose(d.variance(), num_var, atol=1e-3)


class TestMultivariateNormal:
    def test_diag(self):
        loc = np.array([0.5, -1.0, 2.0], np.float32)
        scale = np.array([1.0, 0.5, 2.0], np.float32)
        d = MultivariateNormalDiag(loc=jnp.asarray(loc), scale_diag=jnp.asarray(scale))
        x = np.array([0.0, 0.0, 1.0], np.float32)
        _allclose(
            d.log_prob(x), st.multivariate_normal.logpdf(x, loc, np.diag(scale**2))
        )

    def test_fill_triangular_matches_tfp_layout(self):
        x = jnp.asarray(np.arange(1, 7, dtype=np.float32))
        out = np.asarray(fill_triangular(x, 3))
        expected = np.array([[4, 0, 0], [6, 5, 0], [3, 2, 1]], np.float32)
        np.testing.assert_array_equal(out, expected)

    def test_tril(self):
        rng = np.random.RandomState(0)
        m = 4
        a = rng.randn(m, m).astype(np.float32)
        scale_tril = np.tril(a) + np.eye(m, dtype=np.float32) * 2.0
        loc = rng.randn(m).astype(np.float32)
        x = rng.randn(m).astype(np.float32)
        d = MultivariateNormalTriL(
            loc=jnp.asarray(loc), scale_tril=jnp.asarray(scale_tril)
        )
        cov = scale_tril @ scale_tril.T
        _allclose(d.log_prob(x), st.multivariate_normal.logpdf(x, loc, cov), atol=1e-4)
        _allclose(d.covariance(), cov, atol=1e-5)


class TestGaussianMixture:
    def test_log_prob_vs_manual(self):
        rng = np.random.RandomState(3)
        K, B, D = 3, 5, 2
        logits = rng.randn(B, K).astype(np.float32)
        means = rng.randn(K, B, D).astype(np.float32)
        scales = np.exp(rng.randn(K, B, D).astype(np.float32) * 0.3)
        d = GaussianMixture(
            logits=jnp.asarray(logits),
            means=jnp.asarray(means),
            scale_diags=jnp.asarray(scales),
        )
        x = rng.randn(B, D).astype(np.float32)
        log_mix = logits - st.logsumexp(logits, axis=-1, keepdims=True) \
            if hasattr(st, "logsumexp") else None
        from scipy.special import logsumexp as slse

        log_mix = logits - slse(logits, axis=-1, keepdims=True)
        comp = np.stack(
            [
                st.multivariate_normal.logpdf(x[b], means[k, b], np.diag(scales[k, b] ** 2))
                for b in range(B)
                for k in range(K)
            ]
        ).reshape(B, K)
        expected = slse(log_mix + comp, axis=-1)
        _allclose(d.log_prob(jnp.asarray(x)), expected, atol=1e-4)

    def test_moments_vs_samples(self, rng):
        K, D = 2, 3
        npr = np.random.RandomState(7)
        logits = npr.randn(K).astype(np.float32)
        means = npr.randn(K, D).astype(np.float32)
        scales = np.exp(npr.randn(K, D).astype(np.float32) * 0.2)
        d = GaussianMixture(
            logits=jnp.asarray(logits),
            means=jnp.asarray(means),
            scale_diags=jnp.asarray(scales),
        )
        s = np.asarray(d.sample(rng, (100000,)))
        np.testing.assert_allclose(s.mean(axis=0), np.asarray(d.mean()), atol=0.03)
        np.testing.assert_allclose(s.var(axis=0), np.asarray(d.variance()), atol=0.05)


class TestRegistry:
    def test_all_reference_names_present(self):
        for name in [
            "gaussian",
            "softplus gaussian",
            "modified gaussian",
            "multivariate gaussian",
            "gaussian mixture",
            "log-normal",
            "exponentially_modified_gaussian",
            "gamma",
            "categorical",
            "bernoulli",
            "poisson",
            "constrained poisson",
            "lomax",
            "zero-inflated poisson",
            "negative binomial",
            "zero-inflated negative binomial",
        ]:
            assert name in DISTRIBUTIONS

    def test_parse_distribution(self):
        assert parse_distribution("Negative Binomial") == "negative binomial"
        assert parse_distribution("zero-inflated_poisson") == "zero-inflated poisson"
        assert parse_distribution("gaussian", model_type="VAE") == "gaussian"
        assert (
            parse_distribution("Gaussian Mixture", model_type="GMVAE")
            == "gaussian mixture"
        )
        with pytest.raises(ValueError):
            parse_distribution("nope")

    def test_constrain_clips_to_support(self):
        spec = DISTRIBUTIONS["poisson"].parameters["log_lambda"]
        out = spec.constrain(jnp.asarray([-100.0, 0.0, 100.0]))
        assert float(out[0]) >= -10.0
        assert float(out[2]) <= 10.0

    def test_build_poisson(self):
        spec = DISTRIBUTIONS["poisson"]
        theta = {"log_lambda": jnp.asarray(1.0)}
        d = spec.build(theta)
        assert isinstance(d, Poisson)

    def test_build_constrained_poisson_uses_count_sum(self):
        spec = DISTRIBUTIONS["constrained poisson"]
        assert spec.uses_count_sum
        lam = spec.parameters["lambda"].constrain(jnp.asarray([0.0, 0.0, 0.0, 0.0]))
        _allclose(lam, np.full(4, 0.25), atol=1e-6)
        d = spec.build({"lambda": lam}, count_sum=jnp.asarray(100.0))
        _allclose(d.mean(), np.full(4, 25.0), rtol=1e-5)

    def test_distribution_pytree_roundtrip(self):
        d = NegativeBinomial(total_count=jnp.asarray(2.0), probs=jnp.asarray(0.3))
        leaves, treedef = jax.tree_util.tree_flatten(d)
        d2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert float(d2.total_count) == 2.0

    def test_log_prob_under_jit_and_grad(self):
        def loss(log_r, x):
            d = NegativeBinomial(total_count=jnp.exp(log_r), probs=jnp.asarray(0.3))
            return -jnp.sum(d.log_prob(x))

        g = jax.jit(jax.grad(loss))(jnp.asarray(1.0), jnp.asarray([0.0, 3.0, 7.0]))
        assert np.isfinite(float(g))
