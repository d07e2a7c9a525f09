"""Gaussian-mixture VAE (M2-style with analytically marginalised discrete y).

TPU-native counterpart of
``scvae/models/gaussian_mixture_variational_autoencoder.py``.  Where the
reference builds K shared-weight subgraphs with ``reuse=True`` loops
(``:2859-2922``), here the cluster axis is a ``vmap`` over one parameter
set: q(z|x,y_k) params come out shaped (K, B, D) from a single vmapped
encoder pass, the K decoders are one vmapped decoder over the z cluster
axis, and the y-marginalised loss is a weighted sum over the leading K
axis — all batched matmuls the MXU tiles cleanly.

Model structure (reference cites):
* q(y|x): categorical encoder MLP (``:3050-3092``)
* q(z|x,y_k): shared encoder on concat(x, onehot_k) (``:2936-3007``)
* p(z|y_k): dense heads on the one-hot y (``:3009-3048``)
* p(x|z_k): shared decoder + reconstruction heads (``:3094-3221``)
* y prior: uniform / learn / custom (``:2796-2825``)
* loss: Σ_k q(y=k|x)·[E log p(x|z_k) − KL_z,k] − KL_y with a free-nats
  floor on KL_y (``:3223-3434``).  Note the GMVAE objective uses plain
  means over the R·L sample axes (no log-mean-exp IW bound), matching the
  reference.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from scvae_tpu.distributions import (
    DISTRIBUTIONS,
    GAUSSIAN_MIXTURE_DISTRIBUTIONS,
    Categorical,
    Categorised,
    parse_distribution,
)
from scvae_tpu.models import networks
from scvae_tpu.models.vae import Batch, Params, State

__all__ = [
    "GMVAEConfig",
    "init",
    "forward",
    "elbo_terms",
    "loss_fn",
    "evaluation_outputs",
]


@dataclasses.dataclass(frozen=True)
class GMVAEConfig:
    """Hyperparameters (reference ``gaussian_mixture_variational_autoencoder.py:91-420``)."""

    feature_size: int
    latent_size: int = 2
    hidden_sizes: tuple[int, ...] = (100,)
    reconstruction_distribution: str = "poisson"
    number_of_reconstruction_classes: int = 0
    latent_distribution: str = "gaussian mixture"
    number_of_latent_clusters: int = 10
    prior_probabilities_method: str = "uniform"  # uniform | learn | custom
    prior_probabilities: tuple[float, ...] | None = None
    proportion_of_free_nats_for_y_kl_divergence: float = 0.0
    minibatch_normalisation: bool = True
    batch_correction: bool = False
    number_of_batches: int = 1
    count_sum: bool = False
    dropout_keep_probabilities: tuple[float, ...] = ()
    number_of_warm_up_epochs: int = 0
    kl_weight: float = 1.0
    learning_rate: float = 1e-4
    # Fused Pallas decoder-head+likelihood kernel for the training loss
    # (same semantics as ``VAEConfig.fused_likelihood``): True = use
    # (compiled kernel on TPU; jnp reference elsewhere), False/None = XLA
    # path.  Pays off here sooner than for the VAE: the XLA path
    # materialises (K, S, B, F) head activations per parameter.
    fused_likelihood: bool | None = None
    # Mixed-precision training matmuls (see ``VAEConfig.precision``).
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
            parse_distribution(self.latent_distribution, model_type="GMVAE"),
        )
        object.__setattr__(self, "hidden_sizes", tuple(self.hidden_sizes))
        if self.prior_probabilities_method == "custom":
            if self.prior_probabilities is None:
                raise ValueError(
                    "Custom prior probabilities require `prior_probabilities`."
                )
            object.__setattr__(
                self,
                "prior_probabilities",
                tuple(float(p) for p in self.prior_probabilities),
            )

    # -- derived -----------------------------------------------------------

    @property
    def k_max(self) -> int:
        return self.number_of_reconstruction_classes

    @property
    def n_clusters(self) -> int:
        return self.number_of_latent_clusters

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
    def z_posterior_name(self) -> str:
        return GAUSSIAN_MIXTURE_DISTRIBUTIONS[self.latent_distribution][
            "z posterior"
        ]

    @property
    def z_prior_name(self) -> str:
        return GAUSSIAN_MIXTURE_DISTRIBUTIONS[self.latent_distribution][
            "z prior"
        ]

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
    def dropout_keep_probability_y(self) -> float:
        ps = self.dropout_keep_probabilities
        return float(ps[3]) if len(ps) >= 4 and ps[3] else 1.0

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
        from scvae_tpu.models.vae import resolve_compute_dtype

        return resolve_compute_dtype(self.precision, training)


# --------------------------------------------------------------------------
# Initialisation
# --------------------------------------------------------------------------


def init(config: GMVAEConfig, rng: jax.Array) -> tuple[Params, State]:
    params: Params = {}
    state: State = {}
    rngs = iter(jax.random.split(rng, 64))
    k = config.n_clusters

    # q(y|x): encoder MLP + logits head
    q_y_encoder, q_y_state = networks.init_mlp(
        next(rngs),
        config.feature_size,
        config.hidden_sizes,
        batch_norm=config.minibatch_normalisation,
    )
    params["q_y"] = {
        "encoder": q_y_encoder,
        "logits": networks.init_dense(next(rngs), config.hidden_sizes[-1], k),
    }
    state["q_y"] = q_y_state

    # q(z|x,y): shared encoder on concat(x, onehot_y)
    q_z_encoder, q_z_state = networks.init_mlp(
        next(rngs),
        config.feature_size + k,
        config.hidden_sizes,
        batch_norm=config.minibatch_normalisation,
    )
    posterior_spec = DISTRIBUTIONS[config.z_posterior_name]
    q_z_heads = {
        pname: networks.init_dense(
            next(rngs),
            config.hidden_sizes[-1],
            pspec.size_fn(config.latent_size),
        )
        for pname, pspec in posterior_spec.parameters.items()
    }
    params["q_z"] = {"encoder": q_z_encoder, "heads": q_z_heads}
    state["q_z"] = q_z_state

    # p(z|y): dense heads straight off the one-hot y (K → width)
    prior_spec = DISTRIBUTIONS[config.z_prior_name]
    params["p_z"] = {
        "heads": {
            pname: networks.init_dense(
                next(rngs), k, pspec.size_fn(config.latent_size)
            )
            for pname, pspec in prior_spec.parameters.items()
        }
    }

    # p(y)
    if config.prior_probabilities_method == "learn":
        params["p_y_logits"] = jnp.zeros((k,), jnp.float32)

    # decoder + reconstruction heads (shared across clusters)
    decoder, decoder_state = networks.init_mlp(
        next(rngs),
        config.decoder_input_size(),
        tuple(reversed(config.hidden_sizes)),
        batch_norm=config.minibatch_normalisation,
    )
    params["decoder"] = decoder
    state["decoder"] = decoder_state
    dec_out = config.hidden_sizes[0]
    params["reconstruction"] = {
        pname: networks.init_dense(next(rngs), dec_out, config.feature_size)
        for pname in config.reconstruction_spec.parameters
    }
    if config.k_max:
        params["categorised_logits"] = networks.init_categorised_head(
            next(rngs), dec_out, config.feature_size, config.k_max
        )

    return params, state


# --------------------------------------------------------------------------
# Forward pass
# --------------------------------------------------------------------------


def _p_y_logits(config: GMVAEConfig, params: Params) -> jax.Array:
    if config.prior_probabilities_method == "custom":
        return jnp.log(jnp.asarray(config.prior_probabilities, jnp.float32))
    if config.prior_probabilities_method == "learn":
        return params["p_y_logits"]
    return jnp.zeros((config.n_clusters,), jnp.float32)  # uniform


def _build_theta(
    spec, heads: Params, h: jax.Array, compute_dtype=None
) -> dict[str, jax.Array]:
    return {
        pname: pspec.constrain(
            networks.apply_dense(heads[pname], h, compute_dtype=compute_dtype)
        )
        for pname, pspec in spec.parameters.items()
    }


@dataclasses.dataclass
class GMVAEOutputs:
    q_y: Categorical  # (B, K)
    p_y: Categorical  # (K,)
    q_z: Any  # posterior per cluster, batch (K, B, D)
    p_z: Any  # prior per cluster, batch (K, D)
    z: jax.Array  # samples (S, K, B, D)
    p_x: Any  # reconstruction distribution, batch (K, S, B, F); None when
    # the caller requested the fused-likelihood path (heads are applied
    # inside the Pallas kernel instead)
    decoder_hidden: jax.Array  # (K, S, B, H) decoder output
    new_state: State


def _mean_over_clusters(tree: Any) -> Any:
    """Average vmapped batch-norm states over the cluster axis — the
    reference's K sequential update ops end up blending the same moving
    averages (``gaussian_mixture_variational_autoencoder.py:2859-2922``)."""
    return jax.tree_util.tree_map(lambda x: jnp.mean(x, axis=0), tree)


def forward(
    config: GMVAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    training: bool,
    n_iw: int = 1,
    n_mc: int = 1,
    build_reconstruction: bool = True,
) -> GMVAEOutputs:
    x = batch["x"]
    b = x.shape[0]
    k = config.n_clusters
    s = n_iw * n_mc
    new_state: State = {}
    compute_dtype = config.compute_dtype(training)

    rng_qy, rng_qz_drop, rng_z, rng_dec = jax.random.split(rng, 4)

    # q(y|x)
    h_y, q_y_state = networks.apply_mlp(
        params["q_y"]["encoder"],
        state.get("q_y", {}),
        x,
        training=training,
        rng=rng_qy,
        input_dropout_keep_prob=config.dropout_keep_probability_x,
        hidden_dropout_keep_prob=config.dropout_keep_probability_h,
        compute_dtype=compute_dtype,
    )
    new_state["q_y"] = q_y_state
    cat_spec = DISTRIBUTIONS["categorical"].parameters["logits"]
    q_y_logits = cat_spec.constrain(
        networks.apply_dense(params["q_y"]["logits"], h_y)
    )
    q_y = Categorical(logits=q_y_logits)
    p_y = Categorical(logits=_p_y_logits(config, params))

    # q(z|x,y_k): vmap the shared encoder over the K one-hot codes
    eye = jnp.eye(k, dtype=x.dtype)
    posterior_spec = DISTRIBUTIONS[config.z_posterior_name]

    input_dropout_active = (
        training and config.dropout_keep_probability_x < 1.0
    )
    if not input_dropout_active:
        # Split the first layer: concat(x, y_k) @ W == x @ W[:F] + W[F+k],
        # so the dominant (B, F)·(F, H) matmul runs once instead of K
        # times (exact; the reference's K reuse=True subgraphs recompute
        # it, ``gaussian_mixture_variational_autoencoder.py:2936-3007``).
        layer0 = params["q_z"]["encoder"]["layers"][0]
        f = x.shape[-1]
        base_pre0 = networks.apply_dense(
            {"kernel": layer0["kernel"][:f], "bias": layer0["bias"]},
            x,
            compute_dtype=compute_dtype,
        )  # (B, H)
        onehot_rows = layer0["kernel"][f:]  # (K, H)

        def encode_cluster(y_row: jax.Array, drop_rng: jax.Array):
            h, enc_state = networks.apply_mlp_from_first_preactivation(
                params["q_z"]["encoder"],
                state.get("q_z", {}),
                base_pre0 + y_row,
                training=training,
                rng=drop_rng,
                hidden_dropout_keep_prob=config.dropout_keep_probability_h,
                compute_dtype=compute_dtype,
            )
            theta = _build_theta(
                posterior_spec, params["q_z"]["heads"], h, compute_dtype
            )
            return theta, enc_state

        q_z_theta, q_z_states = jax.vmap(encode_cluster)(
            onehot_rows, jax.random.split(rng_qz_drop, k)
        )
    else:

        def encode_cluster(onehot_row: jax.Array, drop_rng: jax.Array):
            xy = jnp.concatenate(
                [x, jnp.broadcast_to(onehot_row, (b, k))], axis=-1
            )
            h, enc_state = networks.apply_mlp(
                params["q_z"]["encoder"],
                state.get("q_z", {}),
                xy,
                training=training,
                rng=drop_rng,
                input_dropout_keep_prob=config.dropout_keep_probability_x,
                hidden_dropout_keep_prob=config.dropout_keep_probability_h,
                compute_dtype=compute_dtype,
            )
            theta = _build_theta(
                posterior_spec, params["q_z"]["heads"], h, compute_dtype
            )
            return theta, enc_state

        q_z_theta, q_z_states = jax.vmap(encode_cluster)(
            eye, jax.random.split(rng_qz_drop, k)
        )
    new_state["q_z"] = _mean_over_clusters(q_z_states)
    q_z = posterior_spec.build(q_z_theta)  # batch (K, B, D)

    # p(z|y_k): heads on the one-hot rows — params (K, 1, D) so they
    # broadcast against z samples shaped (S, K, B, D).
    prior_spec = DISTRIBUTIONS[config.z_prior_name]
    p_z_theta = _build_theta(prior_spec, params["p_z"]["heads"], eye[:, None, :])
    p_z = prior_spec.build(p_z_theta)  # batch (K, 1, D)

    # z samples: (S, K, B, D)
    z = q_z.sample(rng_z, (s,))

    # decoder per cluster: vmap over the K axis of z
    extras = []
    if config.batch_correction:
        onehot_b = jax.nn.one_hot(
            batch["batch_indices"][..., 0], config.number_of_batches,
            dtype=x.dtype,
        )
        extras.append(jnp.broadcast_to(onehot_b, (s,) + onehot_b.shape))
    if config.use_count_sum_as_feature:
        feature = batch["count_sum_feature"]
        extras.append(jnp.broadcast_to(feature, (s,) + feature.shape))

    recon_spec = config.reconstruction_spec

    def decode_cluster(z_k: jax.Array, drop_rng: jax.Array):
        # z_k: (S, B, D)
        dec_in = (
            jnp.concatenate([z_k] + extras, axis=-1) if extras else z_k
        )
        dec_h, dec_state = networks.apply_mlp(
            params["decoder"],
            state.get("decoder", {}),
            dec_in,
            training=training,
            rng=drop_rng,
            input_dropout_keep_prob=config.dropout_keep_probability_z,
            hidden_dropout_keep_prob=config.dropout_keep_probability_h,
            compute_dtype=compute_dtype,
        )
        return dec_h, dec_state

    dec_h, dec_states = jax.vmap(
        decode_cluster, in_axes=(1, 0), out_axes=0
    )(z, jax.random.split(rng_dec, k))
    new_state["decoder"] = _mean_over_clusters(dec_states)

    p_x = None
    if build_reconstruction:
        x_theta = _build_theta(
            recon_spec, params["reconstruction"], dec_h, compute_dtype
        )
        count_sum = (
            batch.get("count_sum")
            if config.use_count_sum_as_parameter
            else None
        )
        p_x = recon_spec.build(x_theta, count_sum=count_sum)  # (K, S, B, F)

        if config.k_max:
            logits = networks.apply_categorised_logits(
                params["categorised_logits"], dec_h,
                compute_dtype=compute_dtype,
            )
            p_x = Categorised(dist=p_x, cat=Categorical(logits=logits))

    return GMVAEOutputs(
        q_y=q_y,
        p_y=p_y,
        q_z=q_z,
        p_z=p_z,
        z=z,
        p_x=p_x,
        decoder_hidden=dec_h,
        new_state=new_state,
    )


# --------------------------------------------------------------------------
# Objective
# --------------------------------------------------------------------------


def _lgamma_row_const(batch: Batch, t: jax.Array) -> jax.Array:
    """Per-row Σ_f lgamma(1+t) — gathered from the per-dataset
    precomputed sums when the pipeline staged them
    (``models/api._append_lgamma_rowsum``), else computed here once per
    step (still K·S× cheaper than inside the kernel)."""
    row_const = batch.get("t_lgamma_rowsum")
    if row_const is not None:
        return row_const
    from scvae_tpu.ops.special import lgamma

    return jnp.sum(lgamma(1.0 + t), axis=-1)


def elbo_terms(
    config: GMVAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    training: bool,
    n_iw: int = 1,
    n_mc: int = 1,
    warm_up_weight: jax.Array | float = 1.0,
    mesh=None,
) -> tuple[dict[str, jax.Array], GMVAEOutputs]:
    """y-marginalised ELBO (reference ``:3223-3434``).

    ``mesh``: route the fused Pallas likelihood through the shard_map
    wrappers (:mod:`scvae_tpu.ops.sharded`) so the fast path composes
    with data/tensor parallelism."""
    from scvae_tpu.models.vae import _fused_path_enabled

    use_fused = _fused_path_enabled(config) and training
    outputs = forward(
        config, params, state, batch, rng,
        training=training, n_iw=n_iw, n_mc=n_mc,
        build_reconstruction=not use_fused,
    )
    t = batch["t"]
    b = t.shape[0]
    k = config.n_clusters

    y_probs = outputs.q_y.probs  # (B, K)
    y_probs_k = jnp.swapaxes(y_probs, 0, 1)  # (K, B)

    # KL_y with free-nats floor
    if config.prior_probabilities_method == "uniform":
        p_y_entropy = jnp.log(float(k))
        q_y_entropy = -jnp.sum(
            y_probs * outputs.q_y.log_probs(), axis=-1
        )  # (B,)
        kl_y_per_example = p_y_entropy - q_y_entropy
    else:
        log_q = outputs.q_y.log_probs()  # (B, K)
        log_p = outputs.p_y.log_probs()  # (K,)
        kl_y_per_example = jnp.sum(y_probs * (log_q - log_p), axis=-1)
        p_y_entropy = -jnp.sum(
            outputs.p_y.probs * outputs.p_y.log_probs()
        )
    kl_divergence_y = jnp.mean(kl_y_per_example)
    kl_y_threshold = (
        config.proportion_of_free_nats_for_y_kl_divergence * p_y_entropy
    )
    if config.proportion_of_free_nats_for_y_kl_divergence:
        kl_divergence_y_modified = jnp.maximum(kl_divergence_y, kl_y_threshold)
    else:
        kl_divergence_y_modified = kl_divergence_y

    # z-space terms on samples z (S, K, B, D): posterior params (K, B, D)
    # and prior params (K, 1, D) broadcast directly.
    log_q_z_raw = outputs.q_z.log_prob(outputs.z)  # (S, K, B[, D])
    log_p_z_raw = outputs.p_z.log_prob(outputs.z)
    # Scalar-parameterised (softplus-gaussian) latents give per-dimension
    # log-probs → reduce the trailing D axis; full-covariance latents
    # already return per-event values (reference :3270-3286).
    per_dimension = log_q_z_raw.ndim == 4
    log_q_z = jnp.sum(log_q_z_raw, axis=-1) if per_dimension else log_q_z_raw
    log_p_z = jnp.sum(log_p_z_raw, axis=-1) if per_dimension else log_p_z_raw

    kl_z_pointwise = log_q_z - log_p_z  # (S, K, B)
    kl_z_per_example = jnp.mean(kl_z_pointwise, axis=0) * y_probs_k  # (K, B)
    kl_divergence_z = jnp.mean(jnp.sum(kl_z_per_example, axis=0))

    # reconstruction: log p(x|z_k) summed over features → weighted by q(y|x)
    if use_fused:
        # Fused Pallas path: head matmuls + log_prob + feature sum in one
        # kernel over the (K·S·B, H) flattened decoder output.
        from scvae_tpu import ops

        count_sum = (
            batch.get("count_sum")
            if config.use_count_sum_as_parameter
            else None
        )
        use_pallas = ops.pallas_enabled()
        mesh_ok = mesh is not None and "data" in mesh.axis_names
        n_data = mesh.shape["data"] if mesh_ok else 1
        use_sharded = use_pallas and mesh_ok and b % n_data == 0
        # bf16 hidden states straight into the kernels (identical math —
        # they cast internally — at half the h HBM traffic); the jnp
        # reference fallbacks keep the f32 hidden states
        fused_dtype = config.compute_dtype(training)
        dec_h_k = outputs.decoder_hidden  # (K, S, B, H)
        if use_pallas and fused_dtype is not None:
            dec_h_k = dec_h_k.astype(fused_dtype)
        if config.k_max:
            if use_sharded:
                log_p_x = ops.sharded_fused_categorised_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h_k,
                    params["reconstruction"],
                    params["categorised_logits"]["kernel"],
                    params["categorised_logits"]["bias"],
                    t,
                    mesh=mesh,
                    compute_dtype=config.compute_dtype(training),
                )  # (K, S, B)
            else:
                fused = (
                    ops.fused_categorised_log_likelihood
                    if use_pallas and mesh is None
                    else ops.reference_categorised_log_likelihood
                )
                log_p_x = fused(
                    config.reconstruction_distribution,
                    outputs.decoder_hidden,
                    params["reconstruction"],
                    params["categorised_logits"]["kernel"],
                    params["categorised_logits"]["bias"],
                    t,
                    compute_dtype=config.compute_dtype(training),
                )  # (K, S, B)
        elif use_sharded:
            dec_h = dec_h_k
            if count_sum is None:
                # Shared-t fast path under the mesh: same lgamma-const
                # hoisting as below, with the sharded kernel wrapper.
                log_p_x = ops.sharded_fused_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    t,
                    mesh=mesh,
                    compute_dtype=config.compute_dtype(training),
                    include_lgamma_const=False,
                )  # (K, S, B)
                log_p_x = log_p_x - _lgamma_row_const(batch, t)
            else:
                log_p_x = ops.sharded_fused_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    t,
                    mesh=mesh,
                    count_sum=count_sum,
                    compute_dtype=config.compute_dtype(training),
                )  # (K, S, B)
        else:
            on_tpu = use_pallas and mesh is None
            dec_h = dec_h_k if on_tpu else outputs.decoder_hidden
            if on_tpu and count_sum is None:
                # Shared-t fast path: t stays (B, F) — the kernel's index
                # map cycles over it for the K·S groups instead of
                # broadcasting a (K, S, B, F) target — and the
                # −lgamma(1+t) constant (no gradient) is computed ONCE
                # here (or gathered from the per-dataset row sums) rather
                # than K·S times inside the kernel.
                log_p_x = ops.fused_log_likelihood(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    t,
                    compute_dtype=config.compute_dtype(training),
                    include_lgamma_const=False,
                )  # (K, S, B)
                log_p_x = log_p_x - _lgamma_row_const(batch, t)
            else:
                fused = (
                    ops.fused_log_likelihood
                    if on_tpu
                    else ops.reference_log_likelihood
                )
                log_p_x = fused(
                    config.reconstruction_distribution,
                    dec_h,
                    params["reconstruction"],
                    t,
                    count_sum=count_sum,
                    compute_dtype=config.compute_dtype(training),
                )  # (K, S, B)
    else:
        log_p_x = jnp.sum(outputs.p_x.log_prob(t), axis=-1)  # (K, S, B)
    recon_per_example = jnp.mean(log_p_x, axis=1) * y_probs_k  # (K, B)
    reconstruction_error = jnp.mean(jnp.sum(recon_per_example, axis=0))

    kl_divergence = kl_divergence_z + kl_divergence_y
    lower_bound = reconstruction_error - kl_divergence
    lower_bound_weighted = reconstruction_error - (
        warm_up_weight
        * config.kl_weight
        * (kl_divergence_z + kl_divergence_y_modified)
    )

    # per-dimension z KL (reference :3413-3434)
    if per_dimension:
        kl_divergence_z_neurons = jnp.mean(
            jnp.sum(
                jnp.mean(log_q_z_raw - log_p_z_raw, axis=0)  # (K, B, D)
                * y_probs_k[..., None],
                axis=0,
            ),
            axis=0,
        )  # (D,)
    else:
        kl_divergence_z_neurons = jnp.expand_dims(kl_divergence_z, -1)

    metrics = {
        "lower_bound": lower_bound,
        "lower_bound_weighted": lower_bound_weighted,
        "reconstruction_error": reconstruction_error,
        "kl_divergence": kl_divergence,
        "kl_divergence_z": kl_divergence_z,
        "kl_divergence_y": kl_divergence_y,
        "kl_divergence_neurons": kl_divergence_z_neurons,
    }
    return metrics, outputs


def loss_fn(
    config: GMVAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    n_iw: int = 1,
    n_mc: int = 1,
    warm_up_weight: jax.Array | float = 1.0,
    mesh=None,
):
    metrics, outputs = elbo_terms(
        config, params, state, batch, rng,
        training=True, n_iw=n_iw, n_mc=n_mc, warm_up_weight=warm_up_weight,
        mesh=mesh,
    )
    return -metrics["lower_bound_weighted"], (metrics, outputs.new_state)


def prior_centroids(
    config: GMVAEConfig, params: Params
) -> dict[str, "np.ndarray"]:
    """Mixture probabilities and per-cluster prior z mean/covariance from
    the current parameters — the quantities the reference logs per epoch
    as centroid summaries (``:2871-2900``)."""
    import numpy as np

    eye = jnp.eye(config.n_clusters, dtype=jnp.float32)
    prior_spec = DISTRIBUTIONS[config.z_prior_name]
    theta = _build_theta(prior_spec, params["p_z"]["heads"], eye)
    p_z = prior_spec.build(theta)
    probabilities = jax.nn.softmax(_p_y_logits(config, params))
    means = np.asarray(p_z.mean())  # (K, D)
    if hasattr(p_z, "covariance"):
        covariances = np.asarray(p_z.covariance())
    else:
        var = np.asarray(p_z.variance())
        covariances = var[..., :, None] * np.eye(var.shape[-1])
    return {
        "probabilities": np.asarray(probabilities),
        "means": means,
        "covariance_matrices": covariances,
    }


def latent_means(
    config: GMVAEConfig, params: Params, state: State, x: jax.Array
) -> jax.Array:
    """y-marginalised E[z|x] without the decoder (cheap latent path)."""
    b = x.shape[0]
    k = config.n_clusters
    h_y, _ = networks.apply_mlp(
        params["q_y"]["encoder"], state.get("q_y", {}), x, training=False
    )
    cat_spec = DISTRIBUTIONS["categorical"].parameters["logits"]
    q_y_logits = cat_spec.constrain(
        networks.apply_dense(params["q_y"]["logits"], h_y)
    )
    y_probs = jax.nn.softmax(q_y_logits, axis=-1)  # (B, K)

    eye = jnp.eye(k, dtype=x.dtype)
    posterior_spec = DISTRIBUTIONS[config.z_posterior_name]

    def encode_cluster(onehot_row):
        xy = jnp.concatenate([x, jnp.broadcast_to(onehot_row, (b, k))], -1)
        h, _ = networks.apply_mlp(
            params["q_z"]["encoder"], state.get("q_z", {}), xy,
            training=False,
        )
        return _build_theta(posterior_spec, params["q_z"]["heads"], h)

    theta = jax.vmap(encode_cluster)(eye)
    q_z = posterior_spec.build(theta)  # (K, B, D)
    weights = jnp.swapaxes(y_probs, 0, 1)[..., None]
    return jnp.sum(q_z.mean() * weights, axis=0)


def evaluation_outputs(
    config: GMVAEConfig,
    params: Params,
    state: State,
    batch: Batch,
    rng: jax.Array,
    *,
    n_iw: int = 1,
    n_mc: int = 1,
) -> dict[str, jax.Array]:
    """Metrics + marginalised reconstruction/latent outputs and cluster
    responsibilities for one batch (reference evaluate loop ``:2336-2786``)."""
    metrics, outputs = elbo_terms(
        config, params, state, batch, rng,
        training=False, n_iw=n_iw, n_mc=n_mc,
    )
    b = batch["t"].shape[0]
    k = config.n_clusters
    y_probs = outputs.q_y.probs  # (B, K)

    shape = (k, n_iw, n_mc, b, config.feature_size)
    p_mean = jnp.reshape(outputs.p_x.mean(), shape)
    p_var = jnp.reshape(outputs.p_x.variance(), shape)
    # per-cluster sample means, marginalised over y (reference :3311-3386)
    p_mean_k = jnp.mean(jnp.mean(p_mean, axis=2), axis=1)  # (K, B, F)
    weights = jnp.swapaxes(y_probs, 0, 1)[..., None]  # (K, B, 1)
    p_x_mean = jnp.sum(p_mean_k * weights, axis=0)  # (B, F)
    variance_of_means = jnp.sum(
        jnp.mean(
            jnp.mean(jnp.square(p_mean - p_x_mean[None, None, None]), axis=2),
            axis=1,
        )
        * weights,
        axis=0,
    )
    mean_of_variances = jnp.sum(
        jnp.mean(jnp.mean(p_var, axis=2), axis=1) * weights, axis=0
    )

    # marginalised latent mean: Σ_k q(y=k|x)·E[z|x,y_k] (reference :2896-2900)
    q_z_mean_k = outputs.q_z.mean()  # (K, B, D)
    z_mean = jnp.sum(q_z_mean_k * weights, axis=0)  # (B, D)

    return {
        **metrics,
        "p_x_mean": p_x_mean,
        "p_x_stddev": jnp.sqrt(variance_of_means + mean_of_variances),
        "stddev_of_p_x_given_z_mean": jnp.sqrt(variance_of_means),
        "q_z_mean": z_mean,
        "q_y_probabilities": jnp.mean(y_probs, axis=0),  # (K,)
        "y_probs": y_probs,
        "cluster_ids": jnp.argmax(y_probs, axis=-1),
        "z": outputs.z,
    }
