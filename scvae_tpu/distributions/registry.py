"""Declarative distribution registry.

TPU-native counterpart of ``scvae/distributions/utilities.py:30-389``: maps
a distribution name → per-parameter specs (support interval, activation
function, initialiser, head-size function) + a pure constructor
``theta → Distribution``.  The model layer builds one dense head per
parameter using exactly these specs, so likelihood behaviour is controlled
from one place, as in the reference.

Activation outputs are clipped to the support interval shrunk by float32
tiny, matching ``scvae/models/variational_autoencoder.py:2480-2485``.

Mixture parameters differ structurally from the reference: per-component
parameters are stacked arrays with a leading cluster axis (vmap/MXU
friendly) instead of Python lists of tensors.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from scvae_tpu.distributions.base import Distribution
from scvae_tpu.distributions.categorised import Categorised
from scvae_tpu.distributions.counts import (
    Bernoulli,
    Categorical,
    Gamma,
    NegativeBinomial,
    Poisson,
)
from scvae_tpu.distributions.exponentially_modified_normal import (
    ExponentiallyModifiedNormal,
)
from scvae_tpu.distributions.lomax import Lomax
from scvae_tpu.distributions.mixture import GaussianMixture
from scvae_tpu.distributions.normal import (
    LogNormal,
    MultivariateNormalTriL,
    Normal,
    fill_triangular,
)
from scvae_tpu.distributions.zero_inflated import ZeroInflated
from scvae_tpu.utils.strings import normalise_string

_F32 = np.finfo(np.float32)
_TINY = float(_F32.tiny)
_HALF_MIN = float(_F32.min / 2)
_HALF_MAX = float(_F32.max / 2)


def _identity(x: jax.Array) -> jax.Array:
    return x


def _zeros(rng: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    del rng
    return jnp.zeros(shape, jnp.float32)


def _ones(rng: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    del rng
    return jnp.ones(shape, jnp.float32)


def _standard_normal(rng: jax.Array, shape: tuple[int, ...]) -> jax.Array:
    return jax.random.normal(rng, shape, jnp.float32)


@dataclasses.dataclass(frozen=True)
class ParameterSpec:
    """One distribution parameter: how its head output becomes a value."""

    support: tuple[float, float]
    activation: Callable[[jax.Array], jax.Array] = _identity
    initial_value: Callable[[jax.Array, tuple[int, ...]], jax.Array] = _zeros
    # Head width as a function of the event size m (identity except the
    # triangular-scale parameter, reference `size function`).
    size_fn: Callable[[int], int] = lambda m: m

    def constrain(self, raw: jax.Array) -> jax.Array:
        """activation → clip to the open support interval.

        The reference clips to ``support ∓ float32 tiny``
        (``variational_autoencoder.py:2480-2485``), but ``hi − tiny``
        rounds back to ``hi`` in float32 whenever ``|hi| ≳ 1e-31`` — e.g.
        ``1 − tiny == 1.0`` — so its clip fails to exclude the boundary
        and ``log1p(−p)`` can still produce −inf.  We clip to the nearest
        representable float32 strictly inside the interval instead
        (documented deviation; identical except at saturation).
        """
        lo, hi = self.support
        lo_in = float(np.nextafter(np.float32(lo), np.float32(np.inf)))
        hi_in = float(np.nextafter(np.float32(hi), np.float32(-np.inf)))
        return jnp.clip(self.activation(raw), lo_in, hi_in)


@dataclasses.dataclass(frozen=True)
class DistributionSpec:
    name: str
    parameters: dict[str, ParameterSpec]
    constructor: Callable[..., Distribution]
    uses_count_sum: bool = False  # "constrained"/"multinomial" classes take N

    def build(self, theta: dict[str, jax.Array], count_sum: Any = None) -> Distribution:
        if self.uses_count_sum:
            return self.constructor(theta, count_sum)
        return self.constructor(theta)


# --- constructors ---------------------------------------------------------


def _make_gaussian(theta):
    return Normal(loc=theta["mu"], scale=jnp.exp(theta["log_sigma"]))


def _make_softplus_gaussian(theta):
    return Normal(
        loc=theta["mean"], scale=jnp.sqrt(jax.nn.softplus(theta["softplus_scale"]))
    )


def _make_multivariate_gaussian(theta):
    loc = theta["locations"]
    m = loc.shape[-1]
    return MultivariateNormalTriL(
        loc=loc, scale_tril=fill_triangular(theta["scales"], m)
    )


def _make_gaussian_mixture(theta):
    return GaussianMixture(
        logits=theta["logits"],
        means=theta["mus"],
        scale_diags=jnp.exp(theta["log_sigmas"]),
    )


def _make_log_normal(theta):
    return LogNormal(loc=theta["mean"], scale=jnp.sqrt(theta["variance"]))


def _make_emg(theta):
    return ExponentiallyModifiedNormal(
        loc=theta["location"], scale=theta["scale"], rate=theta["rate"]
    )


def _make_gamma(theta):
    return Gamma(concentration=theta["concentration"], rate=theta["rate"])


def _make_categorical(theta):
    return Categorical(logits=theta["logits"])


def _make_bernoulli(theta):
    return Bernoulli(logits=theta["logits"])


def _make_poisson(theta):
    return Poisson(log_rate=theta["log_lambda"])


def _make_constrained_poisson(theta, count_sum):
    # rate = softmax-normalised λ over genes × per-cell total count N
    # (reference `scvae/distributions/utilities.py:218-228`).
    return Poisson(log_rate=jnp.log(theta["lambda"] * count_sum))


def _make_lomax(theta):
    return Lomax(
        concentration=jnp.exp(theta["log_concentration"]),
        scale=jnp.exp(theta["log_scale"]),
    )


def _make_zero_inflated_poisson(theta):
    return ZeroInflated(dist=Poisson(log_rate=theta["log_lambda"]), pi=theta["pi"])


def _make_negative_binomial(theta):
    return NegativeBinomial(total_count=jnp.exp(theta["log_r"]), probs=theta["p"])


def _make_zero_inflated_negative_binomial(theta):
    return ZeroInflated(
        dist=NegativeBinomial(total_count=jnp.exp(theta["log_r"]), probs=theta["p"]),
        pi=theta["pi"],
    )


# --- registry -------------------------------------------------------------

_softmax_last = lambda x: jax.nn.softmax(x, axis=-1)  # noqa: E731

DISTRIBUTIONS: dict[str, DistributionSpec] = {
    "gaussian": DistributionSpec(
        name="gaussian",
        parameters={
            "mu": ParameterSpec(support=(_HALF_MIN, _HALF_MAX)),
            "log_sigma": ParameterSpec(support=(-3.0, 3.0)),
        },
        constructor=_make_gaussian,
    ),
    "softplus gaussian": DistributionSpec(
        name="softplus gaussian",
        parameters={
            "mean": ParameterSpec(support=(_HALF_MIN, _HALF_MAX)),
            "softplus_scale": ParameterSpec(support=(_HALF_MIN, _HALF_MAX)),
        },
        constructor=_make_softplus_gaussian,
    ),
    "multivariate gaussian": DistributionSpec(
        name="multivariate gaussian",
        parameters={
            "locations": ParameterSpec(support=(-math.inf, math.inf)),
            "scales": ParameterSpec(
                support=(0.0, math.inf),
                activation=jax.nn.softplus,
                initial_value=_ones,
                size_fn=lambda m: m * (m + 1) // 2,
            ),
        },
        constructor=_make_multivariate_gaussian,
    ),
    "gaussian mixture": DistributionSpec(
        name="gaussian mixture",
        parameters={
            "logits": ParameterSpec(
                support=(-math.inf, math.inf), initial_value=_ones
            ),
            "mus": ParameterSpec(
                support=(-math.inf, math.inf), initial_value=_standard_normal
            ),
            "log_sigmas": ParameterSpec(support=(-3.0, 3.0)),
        },
        constructor=_make_gaussian_mixture,
    ),
    "log-normal": DistributionSpec(
        name="log-normal",
        parameters={
            "mean": ParameterSpec(support=(-math.inf, math.inf)),
            "variance": ParameterSpec(
                support=(0.0, math.inf), activation=jax.nn.softplus
            ),
        },
        constructor=_make_log_normal,
    ),
    "exponentially_modified_gaussian": DistributionSpec(
        name="exponentially_modified_gaussian",
        parameters={
            "location": ParameterSpec(support=(-math.inf, math.inf)),
            "scale": ParameterSpec(support=(0.0, math.inf), activation=jax.nn.softplus),
            "rate": ParameterSpec(support=(0.0, math.inf), activation=jax.nn.softplus),
        },
        constructor=_make_emg,
    ),
    "gamma": DistributionSpec(
        name="gamma",
        parameters={
            "concentration": ParameterSpec(
                support=(0.0, math.inf), activation=jax.nn.softplus
            ),
            "rate": ParameterSpec(support=(0.0, math.inf), activation=jax.nn.softplus),
        },
        constructor=_make_gamma,
    ),
    "categorical": DistributionSpec(
        name="categorical",
        parameters={"logits": ParameterSpec(support=(-math.inf, math.inf))},
        constructor=_make_categorical,
    ),
    "bernoulli": DistributionSpec(
        name="bernoulli",
        parameters={"logits": ParameterSpec(support=(-math.inf, math.inf))},
        constructor=_make_bernoulli,
    ),
    "poisson": DistributionSpec(
        name="poisson",
        parameters={"log_lambda": ParameterSpec(support=(-10.0, 10.0))},
        constructor=_make_poisson,
    ),
    "constrained poisson": DistributionSpec(
        name="constrained poisson",
        parameters={
            "lambda": ParameterSpec(support=(0.0, 1.0), activation=_softmax_last)
        },
        constructor=_make_constrained_poisson,
        uses_count_sum=True,
    ),
    "lomax": DistributionSpec(
        name="lomax",
        parameters={
            "log_concentration": ParameterSpec(support=(-10.0, 10.0)),
            "log_scale": ParameterSpec(support=(-10.0, 10.0)),
        },
        constructor=_make_lomax,
    ),
    "zero-inflated poisson": DistributionSpec(
        name="zero-inflated poisson",
        parameters={
            "pi": ParameterSpec(support=(0.0, 1.0), activation=jax.nn.sigmoid),
            "log_lambda": ParameterSpec(support=(-10.0, 10.0)),
        },
        constructor=_make_zero_inflated_poisson,
    ),
    "negative binomial": DistributionSpec(
        name="negative binomial",
        parameters={
            "p": ParameterSpec(support=(0.0, 1.0), activation=jax.nn.sigmoid),
            "log_r": ParameterSpec(support=(-10.0, 10.0)),
        },
        constructor=_make_negative_binomial,
    ),
    "zero-inflated negative binomial": DistributionSpec(
        name="zero-inflated negative binomial",
        parameters={
            "pi": ParameterSpec(support=(0.0, 1.0), activation=jax.nn.sigmoid),
            "p": ParameterSpec(support=(0.0, 1.0), activation=jax.nn.sigmoid),
            "log_r": ParameterSpec(support=(-10.0, 10.0)),
        },
        constructor=_make_zero_inflated_negative_binomial,
    ),
}
DISTRIBUTIONS["modified gaussian"] = dataclasses.replace(
    DISTRIBUTIONS["softplus gaussian"], name="modified gaussian"
)


# Latent registries (reference ``distributions/utilities.py:309-353``).
# "parameters" pins a prior/posterior parameter to a constant instead of a
# learned variable / dense head.
LATENT_DISTRIBUTIONS: dict[str, dict[str, Any]] = {
    "gaussian": {
        "prior": {"name": "gaussian", "parameters": {"mu": 0.0, "log_sigma": 0.0}},
        "posterior": {"name": "gaussian", "parameters": {}},
    },
    "unit-variance gaussian": {
        "prior": {"name": "gaussian", "parameters": {"mu": 0.0, "log_sigma": 0.0}},
        "posterior": {"name": "gaussian", "parameters": {"log_sigma": 0.0}},
    },
}

GAUSSIAN_MIXTURE_DISTRIBUTIONS: dict[str, dict[str, str]] = {
    "gaussian mixture": {
        "z prior": "softplus gaussian",
        "z posterior": "softplus gaussian",
    },
    "full-covariance gaussian mixture": {
        "z prior": "multivariate gaussian",
        "z posterior": "multivariate gaussian",
    },
    "legacy gaussian mixture": {
        "z prior": "modified gaussian",
        "z posterior": "modified gaussian",
    },
}


def parse_distribution(distribution: str, model_type: str | None = None) -> str:
    """Resolve a (possibly alias-formatted) name against the right registry
    (reference ``distributions/utilities.py:356-389``)."""
    distribution = normalise_string(distribution)

    if model_type is None:
        kind = "reconstruction"
        registry: dict[str, Any] = DISTRIBUTIONS
    elif isinstance(model_type, str):
        kind = "latent"
        if model_type == "VAE":
            registry = LATENT_DISTRIBUTIONS
        elif model_type == "GMVAE":
            registry = GAUSSIAN_MIXTURE_DISTRIBUTIONS
        else:
            raise ValueError("Model type not found.")
    else:
        raise TypeError("`model_type` should be a string.")

    for name in registry:
        if normalise_string(name) == distribution:
            return name
    raise ValueError(
        "{} distribution `{}` not supported{}.".format(
            kind.capitalize(),
            distribution,
            " for {}".format(model_type) if model_type else "",
        )
    )
