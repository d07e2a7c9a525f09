"""Variational auto-encoder: configuration, parameter init, forward pass,
and ELBO objective as pure functions.

TPU-native counterpart of ``scvae/models/variational_autoencoder.py``.  The
reference builds a TF1 graph in ``__init__`` (``:114-410, 2219-2734``); here
the model is a frozen config plus pure functions over explicit parameter /
batch-norm-state pytrees, designed so one ``jit``/``pjit`` of
``elbo_loss``'s gradient is the entire training hot path.

Shape conventions (vs the reference's flattened ``(R·L·B, ·)`` layout):
latent samples keep an explicit leading sample axis ``(S=R·L, B, ·)``; all
matmuls batch over it, which XLA maps onto the MXU without the tile/reshape
dance of ``variational_autoencoder.py:2560-2594``.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from scvae_tpu.distributions import (
    DISTRIBUTIONS,
    LATENT_DISTRIBUTIONS,
    Categorical,
    Categorised,
    Normal,
    kl_divergence,
    parse_distribution,
)
from scvae_tpu.models import networks
from scvae_tpu.models.objectives import log_reduce_exp

Params = dict[str, Any]
State = dict[str, Any]
Batch = dict[str, jax.Array]


@dataclasses.dataclass(frozen=True)
class VAEConfig:
    """Hyperparameters (reference ``variational_autoencoder.py:114-410``)."""

    feature_size: int
    latent_size: int = 2
    hidden_sizes: tuple[int, ...] = (100,)
    reconstruction_distribution: str = "poisson"
    number_of_reconstruction_classes: int = 0  # K (k_max); heads emit K+1 logits
    latent_distribution: str = "gaussian"
    parameterise_latent_posterior: bool = False
    analytical_kl_term: bool | None = None  # None → derived like the reference
    inference_architecture: str = "MLP"  # or "LFM"
    generative_architecture: str = "MLP"  # or "LFM"
    minibatch_normalisation: bool = True
    batch_correction: bool = False
    number_of_batches: int = 1
    count_sum: bool = False  # use normalised count sum as decoder feature
    dropout_keep_probabilities: tuple[float, ...] = ()
    number_of_warm_up_epochs: int = 0
    kl_weight: float = 1.0
    learning_rate: float = 1e-4
    # Fused Pallas decoder-head+likelihood kernel for the training loss:
    # True = force on (compiled kernel on TPU; jnp reference elsewhere),
    # False = force the plain XLA path, None = auto (on for TPU when the
    # distribution has a fused kernel, off elsewhere).  The kernel avoids
    # materialising the (B, F) per-parameter head activations in HBM and
    # runs its head matmuls in bf16 (f32 accumulation).  Official
    # driver-captured numbers live in BENCH_rNN.json; the step
    # decomposition is in STATUS.md §Performance.
    fused_likelihood: bool | None = None
    # Mixed-precision matmuls for TRAINING: inputs cast to bfloat16, f32
    # accumulation on the MXU, f32 master weights/optimizer state;
    # evaluation always runs full f32.  None → "bfloat16" on TPU backends
    # and "float32" elsewhere (CPU tests and parity checks stay exact).
    precision: str | None = None

    def __post_init__(self):
        object.__setattr__(
            self,
            "reconstruction_distribution",
            parse_distribution(self.reconstruction_distribution),
        )
        object.__setattr__(
            self,
            "latent_distribution",
            parse_distribution(self.latent_distribution, model_type="VAE"),
        )
        object.__setattr__(self, "hidden_sizes", tuple(self.hidden_sizes))

    # -- derived flags (reference :186-276) --------------------------------

    @property
    def k_max(self) -> int:
        return self.number_of_reconstruction_classes

    @property
    def use_count_sum_as_parameter(self) -> bool:
        return (
            "constrained" in self.reconstruction_distribution
            or "multinomial" in self.reconstruction_distribution
        )

    @property
    def use_count_sum_as_feature(self) -> bool:
        return self.count_sum

    @property
    def analytical_kl(self) -> bool:
        if self.analytical_kl_term is not None:
            return self.analytical_kl_term
        return self.latent_distribution == "gaussian"

    @property
    def dropout_keep_probability_h(self) -> float:
        ps = self.dropout_keep_probabilities
        return float(ps[0]) if len(ps) >= 1 and ps[0] else 1.0

    @property
    def dropout_keep_probability_x(self) -> float:
        ps = self.dropout_keep_probabilities
        return float(ps[1]) if len(ps) >= 2 and ps[1] else 1.0

    @property
    def dropout_keep_probability_z(self) -> float:
        ps = self.dropout_keep_probabilities
        return float(ps[2]) if len(ps) >= 3 and ps[2] else 1.0

    @property
    def latent_spec(self) -> dict[str, Any]:
        return LATENT_DISTRIBUTIONS[self.latent_distribution]

    @property
    def reconstruction_spec(self):
        return DISTRIBUTIONS[self.reconstruction_distribution]

    def decoder_input_size(self) -> int:
        size = self.latent_size
        if self.batch_correction:
            size += self.number_of_batches
        if self.use_count_sum_as_feature:
            size += 1
        return size

    def compute_dtype(self, training: bool):
        """Matmul input dtype for this pass (None → full precision)."""
        return resolve_compute_dtype(self.precision, training)


def resolve_compute_dtype(precision: str | None, training: bool):
    """bf16 matmul inputs for training on TPU (f32 accumulation); full f32
    for evaluation and on non-TPU backends unless explicitly requested."""
    if not training:
        return None
    if precision is None:
        precision = (
            "bfloat16" if jax.default_backend() == "tpu" else "float32"
        )
    if precision in ("float32", "highest", "f32"):
        return None
    if precision in ("bfloat16", "bf16"):
        return jnp.bfloat16
    raise ValueError(f"Unknown precision {precision!r}")


# --------------------------------------------------------------------------
# Initialisation
# --------------------------------------------------------------------------


def init(config: VAEConfig, rng: jax.Array) -> tuple[Params, State]:
    """Build the parameter and batch-norm-state pytrees."""
    params: Params = {}
    state: State = {}
    rngs = iter(jax.random.split(rng, 64))

    # Encoder
    if config.inference_architecture == "MLP":
        enc_params, enc_state = networks.init_mlp(
            next(rngs),
            config.feature_size,
            config.hidden_sizes,
            batch_norm=config.minibatch_normalisation,
        )
        params["encoder"] = enc_params
        state["encoder"] = enc_state
        enc_out = config.hidden_sizes[-1]
    elif config.inference_architecture == "LFM":
        enc_out = config.feature_size
    else:
        raise ValueError(
            "The inference architecture can only be MLP or LFM."
        )

    # Posterior heads: one dense layer per free latent parameter
    posterior_spec = config.latent_spec["posterior"]
    post_dist = DISTRIBUTIONS[posterior_spec["name"]]
    heads: Params = {}
    for pname, pspec in post_dist.parameters.items():
        if pname in posterior_spec["parameters"]:
            continue  # pinned to a constant
        heads[pname] = networks.init_dense(
            next(rngs), enc_out, pspec.size_fn(config.latent_size)
        )
    params["posterior"] = heads

    # Prior: constants for the gaussian latents (no parameters); learned
    # variables would go in params["prior"] for mixture latents.
    params["prior"] = {}

    # Decoder
    if config.generative_architecture == "MLP":
        dec_params, dec_state = networks.init_mlp(
            next(rngs),
            config.decoder_input_size(),
            tuple(reversed(config.hidden_sizes)),
            batch_norm=config.minibatch_normalisation,
        )
        params["decoder"] = dec_params
        state["decoder"] = dec_state
        dec_out = config.hidden_sizes[0]
    elif config.generative_architecture == "LFM":
        dec_out = config.decoder_input_size()
    else:
        raise ValueError(
            "The generative architecture can only be MLP or LFM."
        )

    # Reconstruction heads: one dense layer per distribution parameter
    recon_heads: Params = {}
    for pname, pspec in config.reconstruction_spec.parameters.items():
        recon_heads[pname] = networks.init_dense(
            next(rngs), dec_out, config.feature_size
        )
    params["reconstruction"] = recon_heads

    if config.k_max:
        params["categorised_logits"] = networks.init_categorised_head(
            next(rngs), dec_out, config.feature_size, config.k_max
        )

    return params, state


# --------------------------------------------------------------------------
# Forward pass
# --------------------------------------------------------------------------


@dataclasses.dataclass
class VAEOutputs:
    q_z: Any  # posterior distribution, batch (B, D)
    p_z: Any  # prior distribution
    z: jax.Array  # latent samples (S, B, D)
    p_x: Any  # reconstruction distribution, batch (S, B, F); None when the
    # caller requested the fused-likelihood path (heads are applied inside
    # the Pallas kernel instead)
    decoder_hidden: jax.Array  # (S, B, H) decoder output
    new_state: State


def _fused_path_enabled(config: VAEConfig) -> bool:
    from scvae_tpu.ops import supports_fused_likelihood

    if config.fused_likelihood is False:
        return False
    if not supports_fused_likelihood(
        config.reconstruction_distribution, config.k_max
    ):
        if config.fused_likelihood:
            raise ValueError(
                "fused_likelihood=True but "
                f"{config.reconstruction_distribution!r} (k_max="
                f"{config.k_max}) has no fused kernel"
            )
        return False
    if config.fused_likelihood is None:
        # Auto: on for TPU (measured faster with the bf16 trunk — see
        # VAEConfig.fused_likelihood), off elsewhere (the jnp reference
        # implementation has no advantage over plain XLA on CPU).
        from scvae_tpu.ops import pallas_enabled

        return pallas_enabled()
    return True


def _constrained_head(pspec, head_params, h, compute_dtype=None):
    return pspec.constrain(
        networks.apply_dense(head_params, h, compute_dtype=compute_dtype)
    )


def _build_posterior(
    config: VAEConfig, params: Params, h: jax.Array, compute_dtype=None
):
    """Posterior distribution from encoder output ``h`` of shape (B, H)."""
    posterior_spec = config.latent_spec["posterior"]
    dist_spec = DISTRIBUTIONS[posterior_spec["name"]]
    theta: dict[str, jax.Array] = {}
    for pname, pspec in dist_spec.parameters.items():
        if pname in posterior_spec["parameters"]:
            theta[pname] = jnp.asarray(
                posterior_spec["parameters"][pname], jnp.float32
            )
        else:
            raw = _constrained_head(
                pspec, params["posterior"][pname], h, compute_dtype
            )
            if config.parameterise_latent_posterior:
                # Residual posterior: posterior params += prior params
                # (reference :2333-2344).  Gaussian priors are constants.
                prior_value = config.latent_spec["prior"]["parameters"].get(pname)
                if prior_value is not None:
                    raw = raw + jnp.asarray(prior_value, jnp.float32)
            theta[pname] = raw
    return dist_spec.build(theta)


def _build_prior(config: VAEConfig, params: Params):
    prior_spec = config.latent_spec["prior"]
    dist_spec = DISTRIBUTIONS[prior_spec["name"]]
    theta: dict[str, jax.Array] = {}
    for pname in dist_spec.parameters:
        if pname in prior_spec["parameters"]:
            theta[pname] = jnp.asarray(prior_spec["parameters"][pname], jnp.float32)
        else:
            theta[pname] = params["prior"][pname]
    return dist_spec.build(theta)


def _decoder_inputs(
    config: VAEConfig, z: jax.Array, batch: Batch
) -> jax.Array:
    """Concat latent samples with batch one-hots / count-sum feature,
    broadcast over the sample axis (reference :2396-2462)."""
    parts = [z]
    s = z.shape[0]
    if config.batch_correction:
        onehot = jax.nn.one_hot(
            batch["batch_indices"][..., 0], config.number_of_batches,
            dtype=z.dtype,
        )
        parts.append(jnp.broadcast_to(onehot, (s,) + onehot.shape))
    if config.use_count_sum_as_feature:
        feature = batch["count_sum_feature"]  # (B, 1), normalised
        parts.append(jnp.broadcast_to(feature, (s,) + feature.shape))
    return jnp.concatenate(parts, axis=-1)


def _build_reconstruction(
    config: VAEConfig,
    params: Params,
    decoder_h: jax.Array,
    batch: Batch,
    compute_dtype=None,
):
    """Reconstruction distribution over (S, B, F) from decoder output."""
    spec = config.reconstruction_spec
    theta: dict[str, jax.Array] = {}
    for pname, pspec in spec.parameters.items():
        theta[pname] = _constrained_head(
            pspec, params["reconstruction"][pname], decoder_h, compute_dtype
        )
    count_sum = None
    if config.use_count_sum_as_parameter:
        count_sum = batch["count_sum"]  # (B, 1) raw per-cell total
    p_x = spec.build(theta, count_sum=count_sum)

    if config.k_max:
        logits = networks.apply_categorised_logits(
            params["categorised_logits"], decoder_h,
            compute_dtype=compute_dtype,
        )
        p_x = Categorised(dist=p_x, cat=Categorical(logits=logits))
    return p_x


def forward(
    config: VAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    training: bool,
    n_iw: int = 1,
    n_mc: int = 1,
    deterministic_z: bool = False,
    build_reconstruction: bool = True,
) -> VAEOutputs:
    rng_drop_enc, rng_drop_dec, rng_z = jax.random.split(rng, 3)
    new_state: State = {}

    x = batch["x"]
    compute_dtype = config.compute_dtype(training)

    # Encoder
    if config.inference_architecture == "MLP":
        h, enc_state = networks.apply_mlp(
            params["encoder"],
            state.get("encoder", {}),
            x,
            training=training,
            rng=rng_drop_enc,
            input_dropout_keep_prob=config.dropout_keep_probability_x,
            hidden_dropout_keep_prob=config.dropout_keep_probability_h,
            compute_dtype=compute_dtype,
        )
        new_state["encoder"] = enc_state
    else:  # LFM: identity — linear factor model
        h = x

    q_z = _build_posterior(config, params, h, compute_dtype)
    p_z = _build_prior(config, params)

    n_samples = n_iw * n_mc
    if deterministic_z:
        z = jnp.broadcast_to(
            q_z.mean(), (1,) + q_z.mean().shape
        )
    else:
        z = q_z.sample(rng_z, (n_samples,))  # (S, B, D)

    dec_in = _decoder_inputs(config, z, batch)

    if config.generative_architecture == "MLP":
        dec_h, dec_state = networks.apply_mlp(
            params["decoder"],
            state.get("decoder", {}),
            dec_in,
            training=training,
            rng=rng_drop_dec,
            input_dropout_keep_prob=config.dropout_keep_probability_z,
            hidden_dropout_keep_prob=config.dropout_keep_probability_h,
            compute_dtype=compute_dtype,
        )
        new_state["decoder"] = dec_state
    else:
        dec_h = dec_in

    p_x = (
        _build_reconstruction(config, params, dec_h, batch, compute_dtype)
        if build_reconstruction
        else None
    )

    return VAEOutputs(
        q_z=q_z, p_z=p_z, z=z, p_x=p_x, decoder_hidden=dec_h,
        new_state=new_state,
    )


# --------------------------------------------------------------------------
# Objective
# --------------------------------------------------------------------------


def elbo_terms(
    config: VAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    training: bool,
    n_iw: int = 1,
    n_mc: int = 1,
    warm_up_weight: jax.Array | float = 1.0,
    deterministic_z: bool = False,
    mesh=None,
) -> tuple[dict[str, jax.Array], VAEOutputs]:
    """Compute the ELBO decomposition (reference ``:2560-2734``).

    ``mesh``: when set, the fused Pallas likelihood routes through the
    ``shard_map`` wrappers of :mod:`scvae_tpu.ops.sharded` (GSPMD cannot
    partition the Pallas custom calls, so without this the fast path
    would not compose with data/tensor parallelism).  The fused path is
    training-only: a round-4 measurement found fused evaluation neutral
    (XLA streams the unfused IW eval well), so evaluation keeps the
    plain XLA path and the full ``p_x`` outputs.

    Returns metrics:
      * ``lower_bound`` — IW bound: mean over (L, B) of log-mean-exp over R
      * ``lower_bound_weighted`` — training objective with warm-up·kl_weight
      * ``reconstruction_error`` — mean log p(x|z)
      * ``kl_divergence`` — scalar KL (summed over latent dims)
      * ``kl_divergence_neurons`` — per-dimension KL (D,)
    """
    use_fused = _fused_path_enabled(config) and training and not deterministic_z
    outputs = forward(
        config,
        params,
        state,
        batch,
        rng,
        training=training,
        n_iw=n_iw,
        n_mc=n_mc,
        deterministic_z=deterministic_z,
        build_reconstruction=not use_fused,
    )
    t = batch["t"]
    s = outputs.z.shape[0]
    b = t.shape[0]
    if deterministic_z:
        n_iw = n_mc = 1

    if use_fused:
        # Fused Pallas path: head matmuls + log_prob + feature sum in one
        # kernel; (S, B) → (R, L, B).  Under a mesh the kernels run in
        # shard_map (ops.sharded) — GSPMD cannot partition custom calls.
        from scvae_tpu import ops

        use_pallas = ops.pallas_enabled()
        mesh_ok = mesh is not None and "data" in mesh.axis_names
        n_data = mesh.shape["data"] if mesh_ok else 1
        use_sharded = use_pallas and mesh_ok and b % n_data == 0
        # Hand the kernels bf16 hidden states directly when the compute
        # dtype is bf16: the kernel casts internally anyway (identical
        # math), but the HBM reads of h (forward + backward residual)
        # halve, and autodiff casts dh back to f32 for the trunk.  The
        # jnp reference fallbacks keep the f32 hidden states.
        fused_dtype = config.compute_dtype(training)
        dec_h = outputs.decoder_hidden
        if use_pallas and fused_dtype is not None:
            dec_h = dec_h.astype(fused_dtype)
        if config.k_max:
            if use_sharded:
                rows = ops.sharded_fused_categorised_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    params["categorised_logits"]["kernel"],
                    params["categorised_logits"]["bias"],
                    t,
                    mesh=mesh,
                    compute_dtype=config.compute_dtype(training),
                )
            else:
                fused = (
                    ops.fused_categorised_log_likelihood
                    if use_pallas and mesh is None
                    else ops.reference_categorised_log_likelihood
                )
                rows = fused(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    params["categorised_logits"]["kernel"],
                    params["categorised_logits"]["bias"],
                    t,
                    compute_dtype=config.compute_dtype(training),
                )
        else:
            count_sum = (
                batch["count_sum"]
                if config.use_count_sum_as_parameter
                else None
            )
            # The −lgamma(1+t) term is constant in the parameters and
            # per-ROW additive, so when the data pipeline staged its row
            # sums once per dataset (models/api._append_lgamma_rowsum)
            # the kernels skip the in-kernel lgamma chain — about half
            # the forward kernel's VPU work at the flagship shape.
            row_const = (
                batch.get("t_lgamma_rowsum")
                if config.reconstruction_distribution
                != "constrained poisson"
                else None
            )
            if use_sharded:
                rows = ops.sharded_fused_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    t,
                    mesh=mesh,
                    count_sum=count_sum,
                    compute_dtype=config.compute_dtype(training),
                    include_lgamma_const=row_const is None,
                )
                if row_const is not None:
                    rows = rows - row_const
            else:
                use_kernel = use_pallas and mesh is None
                fused = (
                    ops.fused_log_likelihood
                    if use_kernel
                    else ops.reference_log_likelihood
                )
                if use_kernel:
                    rows = fused(
                        config.reconstruction_distribution,
                        dec_h,
                        params["reconstruction"],
                        t,
                        count_sum=count_sum,
                        compute_dtype=config.compute_dtype(training),
                        include_lgamma_const=row_const is None,
                    )
                    if row_const is not None:
                        rows = rows - row_const
                else:
                    rows = fused(
                        config.reconstruction_distribution,
                        outputs.decoder_hidden,
                        params["reconstruction"],
                        t,
                        count_sum=count_sum,
                        compute_dtype=config.compute_dtype(training),
                    )
        log_p_x_given_z = jnp.reshape(rows, (n_iw, n_mc, b))
    else:
        # log p(x|z): (S, B, F) → sum features → (R, L, B)
        log_p_x_given_z = jnp.reshape(
            jnp.sum(outputs.p_x.log_prob(t), axis=-1), (n_iw, n_mc, b)
        )
    reconstruction_error = jnp.mean(log_p_x_given_z)

    if config.analytical_kl and not deterministic_z:
        kl_pointwise = kl_divergence(outputs.q_z, outputs.p_z)  # (B, D)
        kl_divergence_neurons = jnp.mean(kl_pointwise, axis=0)  # (D,)
        kl_scalar = jnp.sum(kl_divergence_neurons)
        kl_samples = jnp.sum(kl_pointwise, axis=-1)  # (B,) → broadcasts (R,L,B)
    else:
        z_reshaped = jnp.reshape(
            outputs.z, (n_iw, n_mc, b, config.latent_size)
        )
        log_q = outputs.q_z.log_prob(z_reshaped)  # (R, L, B, D)
        log_p = outputs.p_z.log_prob(z_reshaped)
        kl_pointwise = log_q - log_p
        kl_divergence_neurons = jnp.mean(
            jnp.reshape(kl_pointwise, (-1, config.latent_size)), axis=0
        )
        kl_scalar = jnp.sum(kl_divergence_neurons)
        kl_samples = jnp.sum(kl_pointwise, axis=-1)  # (R, L, B)

    lower_bound = jnp.mean(
        log_reduce_exp(log_p_x_given_z - kl_samples, axis=0)
    )
    lower_bound_weighted = jnp.mean(
        log_reduce_exp(
            log_p_x_given_z
            - warm_up_weight * config.kl_weight * kl_samples,
            axis=0,
        )
    )

    metrics = {
        "lower_bound": lower_bound,
        "lower_bound_weighted": lower_bound_weighted,
        "reconstruction_error": reconstruction_error,
        "kl_divergence": kl_scalar,
        "kl_divergence_neurons": kl_divergence_neurons,
    }
    return metrics, outputs


def latent_means(
    config: VAEConfig, params: Params, state: State, x: jax.Array
) -> jax.Array:
    """q(z|x) means without running the decoder — the cheap latent path
    for intermediate analyses and label prediction."""
    if config.inference_architecture == "MLP":
        h, _ = networks.apply_mlp(
            params["encoder"], state.get("encoder", {}), x, training=False
        )
    else:
        h = x
    q_z = _build_posterior(config, params, h)
    return q_z.mean()


def evaluation_outputs(
    config: VAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    n_iw: int = 1,
    n_mc: int = 1,
    deterministic_z: bool = False,
) -> dict[str, jax.Array]:
    """ELBO metrics + posterior-predictive reconstruction decomposition and
    latent means for one batch (reference ``:2658-2713`` and the evaluate
    accumulation at ``:1969-2049``).

    Returns scalars (``lower_bound``/``reconstruction_error``/
    ``kl_divergence``) plus arrays: ``p_x_mean`` (B, F), ``p_x_stddev``
    (B, F), ``stddev_of_p_x_given_z_mean`` (B, F), ``q_z_mean`` (B, D) and
    ``z`` (S, B, D).
    """
    metrics, outputs = elbo_terms(
        config,
        params,
        state,
        batch,
        rng,
        training=False,
        n_iw=n_iw,
        n_mc=n_mc,
        deterministic_z=deterministic_z,
    )
    if deterministic_z:
        n_iw = n_mc = 1
    b = batch["t"].shape[0]
    shape = (n_iw, n_mc, b, config.feature_size)
    p_mean = jnp.reshape(outputs.p_x.mean(), shape)
    p_var = jnp.reshape(outputs.p_x.variance(), shape)

    # Ê[x] = mean over MC then IW samples (reference :2665-2669)
    p_x_mean = jnp.mean(jnp.mean(p_mean, axis=1), axis=0)
    # ^V[E[x|z]] (reference :2673-2686)
    variance_of_p_x_given_z_mean = jnp.mean(
        jnp.mean(jnp.square(p_mean - p_x_mean[None, None]), axis=1), axis=0
    )
    stddev_of_p_x_given_z_mean = jnp.sqrt(variance_of_p_x_given_z_mean)
    # V[x] ≈ ^V[E[x|z]] + Ê[V[x|z]] (reference :2704-2710)
    p_x_variance = variance_of_p_x_given_z_mean + jnp.mean(
        jnp.mean(p_var, axis=1), axis=0
    )

    return {
        **metrics,
        "p_x_mean": p_x_mean,
        "p_x_stddev": jnp.sqrt(p_x_variance),
        "stddev_of_p_x_given_z_mean": stddev_of_p_x_given_z_mean,
        "q_z_mean": outputs.q_z.mean(),
        "z": outputs.z,
    }


def loss_fn(
    config: VAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    n_iw: int = 1,
    n_mc: int = 1,
    warm_up_weight: jax.Array | float = 1.0,
    mesh=None,
) -> tuple[jax.Array, tuple[dict[str, jax.Array], State]]:
    """Training objective: −lower_bound_weighted (reference ``:2755``)."""
    metrics, outputs = elbo_terms(
        config,
        params,
        state,
        batch,
        rng,
        training=True,
        n_iw=n_iw,
        n_mc=n_mc,
        warm_up_weight=warm_up_weight,
        mesh=mesh,
    )
    return -metrics["lower_bound_weighted"], (metrics, outputs.new_state)
