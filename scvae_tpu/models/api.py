"""High-level model API: ``VariationalAutoencoder`` with the reference's
``train`` / ``evaluate`` / ``sample`` surface.

Counterpart of the class at ``scvae/models/variational_autoencoder.py:47``
— but where the reference eagerly builds a TF1 graph in ``__init__``, this
wraps the pure-functional core (:mod:`scvae_tpu.models.vae`), a jitted
train step, the host batch pipeline, and the checkpoint/naming machinery.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from scvae_tpu.data.dataset import DataSet
from scvae_tpu.data.pipeline import BatchPipeline, build_model_arrays
from scvae_tpu.data.processing import build_preprocessor
from scvae_tpu.data.utilities import indices_for_evaluation_subset
from scvae_tpu.defaults import get_default
from scvae_tpu.models import checkpoints, naming, step, training, vae
from scvae_tpu.models.utilities import (
    parse_numbers_of_samples,
    validate_model_parameters,
)


def _append_lgamma_rowsum(data: dict, config, sharding=None) -> dict:
    """Stage the per-row Σ_f lgamma(1+t) constants once per dataset.

    The fused likelihood kernels spend ~half their forward VPU work on
    the −lgamma(1+t) term, which is constant in the parameters and
    additive per row — so it is precomputed here as an (N,) vector,
    gathered per batch (``models.step.gather_batch``) and subtracted
    outside the kernel (``vae.elbo_terms`` / ``gmvae._lgamma_row_const``).
    Only staged when the fused fast path will actually run: categorised
    (k_max>0) and constrained-Poisson likelihoods keep their in-kernel
    lgamma (piecewise/softmax structure is not row-separable)."""
    from scvae_tpu import ops
    from scvae_tpu.ops.gather import FieldAlias, PackedRows, logical_slice
    from scvae_tpu.ops.special import lgamma

    name = config.reconstruction_distribution
    if (
        config.k_max
        or name == "constrained poisson"
        or config.fused_likelihood is False
        or not ops.pallas_enabled()
        or not ops.supports_fused_likelihood(name)
    ):
        return data
    t = data.get("t")
    if isinstance(t, FieldAlias):
        t = data[t.target]
    if t is None:
        return data
    packed = isinstance(t, PackedRows)
    n = t.n_rows if packed else int(t.shape[0])

    @jax.jit
    def chunk_rowsum(rows):
        return jnp.sum(lgamma(1.0 + rows.astype(jnp.float32)), axis=-1)

    chunk = 8192
    pieces = []
    for start in range(0, n, chunk):
        stop = min(start + chunk, n)
        rows = logical_slice(t, start, stop) if packed else t[start:stop]
        if stop - start < chunk and n > chunk:
            # pad the tail so one compiled program serves every chunk
            # (lgamma(1+0) = 0, so padded rows contribute exact zeros)
            pad = jnp.zeros((chunk - (stop - start),) + rows.shape[1:],
                            rows.dtype)
            rows = jnp.concatenate([rows, pad], axis=0)
            pieces.append(chunk_rowsum(rows)[: stop - start])
        else:
            pieces.append(chunk_rowsum(rows))
    rowsum = pieces[0] if len(pieces) == 1 else jnp.concatenate(pieces)
    from scvae_tpu.ops.gather import sharding_row_axis

    row_axis = sharding_row_axis(sharding)
    if row_axis is not None:
        from jax.sharding import NamedSharding, PartitionSpec

        rowsum = jax.device_put(
            rowsum, NamedSharding(sharding.mesh, PartitionSpec(row_axis))
        )
    out = dict(data)
    out["t_lgamma_rowsum"] = rowsum
    return out


def _bf16_batch_dtypes(arrays: dict, config) -> dict | None:
    """Gather-output dtype overrides for mixed-precision training.

    When the trunk computes in bf16, the (B, F) count fields can come out
    of the row gather as bf16 DIRECTLY — halving the gather's HBM write
    and the kernels' target reads — provided that is value-exact:
    integral data with max ≤ 256 (bf16 has an 8-bit mantissa, so all
    integers up to 256 are representable).  The likelihood math itself
    still runs f32 (jnp promotes bf16 × f32), so results are identical
    to the f32-gather path.  Returns None when inapplicable (f32
    training, non-integral data, counts > 256, or a likelihood whose
    kernel contains t-ONLY subexpressions — the categorised piecewise
    lgamma chains and the constrained-Poisson −lgamma(1+t) would compute
    in bf16 instead of f32; the base likelihoods avoid this because the
    −lgamma(1+t) constant is hoisted per dataset
    (:func:`_append_lgamma_rowsum`) and every remaining term mixes t
    with an f32 activation)."""
    import scipy.sparse

    from scvae_tpu import ops

    name = config.reconstruction_distribution
    if (
        config.compute_dtype(training=True) is None
        or config.k_max
        or name == "constrained poisson"
        or not ops.pallas_enabled()
        or not ops.supports_fused_likelihood(name)
        or config.fused_likelihood is False
    ):
        return None
    from scvae_tpu.data.pipeline import narrowest_count_dtype

    overrides: dict[str, Any] = {}
    checked: dict[int, bool] = {}
    for field in ("x", "t"):
        arr = arrays.get(field)
        if arr is None:
            continue
        key = id(arr)
        if key not in checked:
            integral = narrowest_count_dtype(
                arr, (np.int16, np.int32)
            ) is not None
            if integral:
                data = arr.data if scipy.sparse.issparse(arr) else arr
                checked[key] = data.size == 0 or (
                    float(np.max(data)) <= 256 and float(np.min(data)) >= 0
                )
            else:
                checked[key] = False
        if checked[key]:
            overrides[field] = jnp.bfloat16
    return overrides or None


def _packed_stratification(data: dict) -> tuple[int, int | None]:
    """(shards, padded_rows) when the device data dict holds mesh-sharded
    ``PackedRows`` — the training/eval index batches must then be
    shard-stratified so every device's row-DMA gather stays local
    (``step.epoch_permutation`` / ``step.stratified_sequential_batches``).
    Plain (unsharded or unpacked) data returns (1, None): global
    permutations, identical to the single-device path."""
    from scvae_tpu.ops.gather import PackedRows

    for value in data.values():
        if isinstance(value, PackedRows) and value.mesh is not None:
            return value.mesh.shape[value.data_axis], value.n_rows
    return 1, None


class VariationalAutoencoder:
    """VAE with train/evaluate/sample (reference API parity)."""

    type = "VAE"
    early_stopping_rounds = training.EARLY_STOPPING_ROUNDS

    def __init__(
        self,
        feature_size: int,
        latent_size: int | None = None,
        hidden_sizes=None,
        reconstruction_distribution: str | None = None,
        number_of_reconstruction_classes: int | None = None,
        latent_distribution: str | None = None,
        minibatch_normalisation: bool | None = None,
        batch_correction: bool | None = None,
        number_of_batches: int | None = None,
        number_of_warm_up_epochs: int | None = None,
        log_directory: str | None = None,
        **kwargs: Any,
    ):
        if latent_size is None:
            latent_size = get_default("models", "latent_size")
        if hidden_sizes is None:
            hidden_sizes = get_default("models", "hidden_sizes")
        if reconstruction_distribution is None:
            reconstruction_distribution = get_default(
                "models", "reconstruction_distribution"
            )
        if number_of_reconstruction_classes is None:
            number_of_reconstruction_classes = get_default(
                "models", "number_of_reconstruction_classes"
            )
        if latent_distribution is None:
            latent_distribution = get_default(
                "models", "latent_distribution"
            )[self.type]
        if minibatch_normalisation is None:
            minibatch_normalisation = get_default(
                "models", "minibatch_normalisation"
            )
        if batch_correction is None:
            batch_correction = get_default("models", "batch_correction")
        if number_of_warm_up_epochs is None:
            number_of_warm_up_epochs = get_default(
                "models", "number_of_warm_up_epochs"
            )
        if log_directory is None:
            log_directory = get_default("models", "directory")

        number_of_samples = kwargs.get("number_of_monte_carlo_samples")
        if number_of_samples is None:
            number_of_samples = get_default("models", "number_of_samples")
        self.number_of_monte_carlo_samples = parse_numbers_of_samples(
            number_of_samples
        )
        number_of_iw = kwargs.get("number_of_importance_samples")
        if number_of_iw is None:
            number_of_iw = get_default("models", "number_of_samples")
        self.number_of_importance_samples = parse_numbers_of_samples(
            number_of_iw
        )

        self.config = vae.VAEConfig(
            feature_size=feature_size,
            latent_size=latent_size,
            hidden_sizes=tuple(hidden_sizes),
            reconstruction_distribution=reconstruction_distribution,
            number_of_reconstruction_classes=number_of_reconstruction_classes,
            latent_distribution=latent_distribution,
            parameterise_latent_posterior=kwargs.get(
                "parameterise_latent_posterior",
                get_default("models", "parameterise_latent_posterior"),
            ),
            analytical_kl_term=kwargs.get("analytical_kl_term"),
            inference_architecture=kwargs.get(
                "inference_architecture",
                get_default("models", "inference_architecture"),
            ),
            generative_architecture=kwargs.get(
                "generative_architecture",
                get_default("models", "generative_architecture"),
            ),
            minibatch_normalisation=minibatch_normalisation,
            batch_correction=batch_correction,
            number_of_batches=number_of_batches or 1,
            count_sum=kwargs.get(
                "count_sum", get_default("models", "count_sum")
            ),
            dropout_keep_probabilities=tuple(
                kwargs.get(
                    "dropout_keep_probabilities",
                    get_default("models", "dropout_keep_probabilities"),
                )
                or ()
            ),
            number_of_warm_up_epochs=number_of_warm_up_epochs,
            kl_weight=kwargs.get(
                "kl_weight", get_default("models", "kl_weight")
            ),
            learning_rate=kwargs.get(
                "learning_rate", get_default("models", "learning_rate")
            ),
            fused_likelihood=kwargs.get("fused_likelihood"),
            precision=kwargs.get("precision"),
        )

        validate_model_parameters(
            reconstruction_distribution=self.config.reconstruction_distribution,
            number_of_reconstruction_classes=number_of_reconstruction_classes,
            model_type=self.type,
            latent_distribution=self.config.latent_distribution,
            parameterise_latent_posterior=(
                self.config.parameterise_latent_posterior
            ),
        )

        self.feature_size = feature_size
        self.latent_size = latent_size
        self.hidden_sizes = tuple(hidden_sizes)
        self.base_log_directory = log_directory
        self.stopped_early = None
        # Default device mesh for train/evaluate (overridable per call).
        self.mesh = kwargs.get("mesh")
        self._active_mesh = None

    # -- identity ----------------------------------------------------------

    @property
    def reconstruction_distribution_name(self) -> str:
        return self.config.reconstruction_distribution

    @property
    def latent_distribution_name(self) -> str:
        return self.config.latent_distribution

    @property
    def number_of_latent_clusters(self) -> int:
        return 1

    @property
    def dropout_parts(self) -> list[str]:
        return [
            str(p)
            for p in self.config.dropout_keep_probabilities
            if p and p != 1
        ]

    @property
    def name(self) -> str:
        return naming.model_name(
            self.type,
            latent_distribution=self.config.latent_distribution,
            number_of_latent_clusters=self.number_of_latent_clusters,
            parameterise_latent_posterior=(
                self.config.parameterise_latent_posterior
            ),
            inference_architecture=self.config.inference_architecture,
            generative_architecture=self.config.generative_architecture,
            reconstruction_distribution=(
                self.config.reconstruction_distribution
            ),
            k_max=self.config.k_max,
            use_count_sum_as_feature=self.config.use_count_sum_as_feature,
            latent_size=self.config.latent_size,
            hidden_sizes=self.config.hidden_sizes,
            number_of_monte_carlo_samples=(
                self.number_of_monte_carlo_samples["training"]
            ),
            number_of_importance_samples=(
                self.number_of_importance_samples["training"]
            ),
            analytical_kl_term=self.config.analytical_kl,
            minibatch_normalisation=self.config.minibatch_normalisation,
            batch_correction=self.config.batch_correction,
            dropout_parts=self.dropout_parts,
            kl_weight=self.config.kl_weight,
            number_of_warm_up_epochs=self.config.number_of_warm_up_epochs,
        )

    def log_directory(
        self,
        base: str | None = None,
        run_id: str | None = None,
        early_stopping: bool = False,
        best_model: bool = False,
    ) -> str:
        return naming.log_directory(
            base or self.base_log_directory,
            self.name,
            run_id=run_id,
            early_stopping=early_stopping,
            best_model=best_model,
        )

    # -- status ------------------------------------------------------------

    def has_been_trained(self, run_id: str | None = None) -> bool:
        return checkpoints.checkpoint_exists(self.log_directory(run_id=run_id))

    def better_model_exists(self, run_id: str | None = None) -> bool:
        return checkpoints.checkpoint_exists(
            self.log_directory(run_id=run_id, best_model=True)
        )

    def model_stopped_early(self, run_id: str | None = None) -> bool:
        return checkpoints.checkpoint_exists(
            self.log_directory(run_id=run_id, early_stopping=True)
        )

    def number_of_epochs_trained(
        self,
        run_id: str | None = None,
        early_stopping: bool = False,
        best_model: bool = False,
    ) -> int:
        return training.resume_start_epoch(
            self.log_directory(
                run_id=run_id,
                early_stopping=early_stopping,
                best_model=best_model,
            )
        )

    def learning_curves(
        self, run_id: str | None = None
    ) -> dict[str, dict[str, list[float]]]:
        """Per-epoch training/validation metric curves for a run — the
        durable metrics record (counterpart of the reference's
        ``load_learning_curves`` event-file reader,
        ``models/utilities.py:243``)."""
        return checkpoints.load_learning_curves(
            self.log_directory(run_id=run_id)
        )

    # -- internals ---------------------------------------------------------

    def _init_state(self, rng: jax.Array) -> step.TrainState:
        params, model_state = vae.init(self.config, rng)
        optimizer = step.make_optimizer(self.config.learning_rate)
        return step.create_train_state(params, model_state, optimizer)

    def _loss_fn(self, n_iw: int, n_mc: int, mesh=None):
        config = self.config

        def loss(params, model_state, batch, rng, warm_up_weight):
            return vae.loss_fn(
                config,
                params,
                model_state,
                batch,
                rng,
                n_iw=n_iw,
                n_mc=n_mc,
                warm_up_weight=warm_up_weight,
                mesh=mesh,
            )

        return loss

    def _eval_fn(self, n_iw: int, n_mc: int):
        config = self.config

        def evaluate(params, model_state, batch, rng):
            metrics, _ = vae.elbo_terms(
                config,
                params,
                model_state,
                batch,
                rng,
                training=False,
                n_iw=n_iw,
                n_mc=n_mc,
            )
            return metrics

        return evaluate

    def _model_arrays(self, data_set: DataSet, noisy_preprocess=None):
        return build_model_arrays(
            data_set,
            use_binarised=(
                self.config.reconstruction_distribution == "bernoulli"
            ),
            use_count_sum_as_parameter=self.config.use_count_sum_as_parameter,
            use_count_sum_as_feature=self.config.use_count_sum_as_feature,
            include_batch_indices=self.config.batch_correction,
            noisy_preprocess=noisy_preprocess,
        )

    def _scaled_minibatch_size(self, minibatch_size: int, scenario: str) -> int:
        """Keep the flattened sample×batch constant (reference :807-811)."""
        scale = (
            self.number_of_importance_samples[scenario]
            * self.number_of_monte_carlo_samples[scenario]
        )
        return max(1, int(np.floor(minibatch_size / scale)))

    # -- train -------------------------------------------------------------

    # Datasets whose dense device form fits under this budget are staged in
    # device memory once and trained with the whole-epoch scan fast path
    # (v5e HBM is 16 GiB; model/optimizer/activations for these MLP sizes
    # are well under 1 GiB, so half the HBM is a safe data budget).
    DEVICE_DATA_BUDGET_BYTES = 8 << 30
    # Candidate storage dtypes for device-resident count matrices,
    # narrowest first.
    DEVICE_COUNT_DTYPES = (np.int16, np.int32)

    def _choose_device_placement(
        self, training_set: DataSet, data_placement: str
    ) -> bool:
        if data_placement == "device":
            return True
        if data_placement == "streaming":
            return False
        if data_placement != "auto":
            raise ValueError(
                "data_placement must be auto, device, or streaming"
            )
        n = training_set.number_of_examples or 0
        f = training_set.number_of_features or 0
        # Integral counts are staged at the narrowest integer width
        # (pipeline.narrowest_count_dtype), so size the estimate the same
        # way instead of assuming 4-byte floats.
        from scvae_tpu.data.pipeline import narrowest_count_dtype

        itemsize = 4
        values = getattr(training_set, "preprocessed_values", None)
        if values is None:
            values = training_set.values
        if values is not None:
            dtype = narrowest_count_dtype(values, self.DEVICE_COUNT_DTYPES)
            if dtype is not None:
                itemsize = np.dtype(dtype).itemsize
        return n * f * itemsize <= self.DEVICE_DATA_BUDGET_BYTES

    def _device_evaluator(
        self, eval_epoch, eval_step, data, n: int, batch_size: int,
        mesh=None, stratify_shards: int = 1,
    ):
        """Scan-based full-pass evaluation with a remainder batch.

        ``n`` is the real row count; under a mesh the device arrays may
        carry zero-padded rows (sharding divisibility), which the
        remainder slice must exclude — and the remainder batch is placed
        replicated so every chip computes it identically.

        ``stratify_shards > 1`` (mesh-sharded packed data): sequential
        batches are shard-stratified so each device's row-DMA gather
        stays local; the uncovered per-shard tails merge into one
        remainder batch, weighted exactly like the single-device tail.
        """
        if stratify_shards > 1:
            _, n_padded = _packed_stratification(data)
            idx, tail_ranges = step.stratified_sequential_batches(
                n_padded, n, batch_size, stratify_shards
            )
        else:
            idx = step.sequential_batches(n, batch_size)
            tail_ranges = [(int(idx.size), n)] if n - int(idx.size) else []
        n_full = int(idx.size)
        scalar_keys = step.EVAL_METRIC_KEYS

        def evaluate(train_state, rng):
            if n_full:
                out = eval_epoch(
                    train_state.params, train_state.model_state, data, idx, rng
                )
                out = {k: np.asarray(v, np.float64) for k, v in out.items()}
            else:
                out = {k: 0.0 for k in scalar_keys}
            remainder = n - n_full
            if remainder:
                from scvae_tpu.ops.gather import (
                    FieldAlias,
                    PackedRows,
                    logical_slice,
                )

                def tail_rows(v):
                    if isinstance(v, FieldAlias):
                        return tail_rows(data[v.target])
                    pieces = [
                        (
                            logical_slice(v, start, stop)
                            if isinstance(v, PackedRows)
                            else v[start:stop]
                        )
                        for start, stop in tail_ranges
                    ]
                    if len(pieces) == 1:
                        return pieces[0]
                    # jnp (not np): slicing/concat on mesh-sharded global
                    # arrays must stay SPMD computations — host fetches
                    # would touch non-addressable shards on a multi-host
                    # mesh
                    return jnp.concatenate(pieces, axis=0)

                batch = step.cast_batch_to_f32(
                    {k: tail_rows(v) for k, v in data.items()}
                )
                if mesh is not None:
                    from scvae_tpu.parallel import replicated

                    sharding = replicated(mesh)
                    batch = {
                        k: jax.device_put(jnp.asarray(v), sharding)
                        for k, v in batch.items()
                    }
                rng, sub = jax.random.split(rng)
                m2 = eval_step(
                    train_state.params, train_state.model_state, batch, sub
                )
                out = {
                    k: (
                        out[k] * n_full
                        + np.asarray(m2[k], np.float64) * remainder
                    ) / n
                    for k in scalar_keys
                }
            return {
                k: (float(v) if np.ndim(v) == 0 else np.asarray(v))
                for k, v in out.items()
            }

        return evaluate

    def _latent_values_fn(self):
        """Jitted (params, model_state, x) → latent means for intermediate
        analyses."""
        config = self.config

        @jax.jit
        def latents(params, model_state, x):
            return vae.latent_means(config, params, model_state, x)

        return latents

    def _make_intermediate_callback(
        self,
        intermediate_analyser,
        training_set: DataSet,
        number_of_epochs: int,
        run_id: str | None,
        analyses_directory: str | None,
    ):
        """Latent-space snapshots at log-spaced epochs (reference
        ``variational_autoencoder.py:1479-1547``)."""
        import jax.numpy as jnp
        import scipy.sparse

        from scvae_tpu.utils.profiling import log_spaced_indices

        epochs = set(log_spaced_indices(number_of_epochs).tolist())
        latents_fn = self._latent_values_fn()
        values = (
            training_set.preprocessed_values
            if training_set.preprocessed_values is not None
            else training_set.values
        )
        subset = min(training_set.number_of_examples, 2000)
        rows = values[:subset]
        if scipy.sparse.issparse(rows):
            rows = rows.toarray()
        x = np.asarray(rows, np.float32)

        def callback(epoch, train_state, epoch_metrics):
            if epoch not in epochs:
                return
            if self._active_mesh is not None:
                from scvae_tpu.parallel import replicate_to_mesh

                x_dev = replicate_to_mesh(x, self._active_mesh)
            else:
                x_dev = jnp.asarray(x)
            latent_values = np.asarray(
                latents_fn(train_state.params, train_state.model_state, x_dev)
            )
            intermediate_analyser(
                epoch=epoch,
                latent_values=latent_values,
                data_set=training_set,
                model_name=self.name,
                model_type=self.type,
                run_id=run_id,
                analyses_directory=analyses_directory,
            )

        return callback

    def train(
        self,
        training_set: DataSet,
        validation_set: DataSet | None = None,
        number_of_epochs: int | None = None,
        minibatch_size: int | None = None,
        learning_rate: float | None = None,
        run_id: str | None = None,
        new_run: bool = False,
        reset_training: bool = False,
        full_train_evaluation: bool = True,
        data_placement: str = "auto",
        metrics_fetch: str = "sync",
        intermediate_analyser=None,
        analyses_directory: str | None = None,
        caches_directory: str | None = None,
        seed: int = 0,
        verbose: bool = True,
        epoch_callback=None,
        mesh=None,
        devices=None,
        number_of_devices: int | None = None,
        model_parallelism: int | None = None,
    ) -> training.TrainingResult:
        if metrics_fetch not in ("sync", "deferred"):
            raise ValueError(
                "metrics_fetch must be 'sync' or 'deferred'"
            )
        if number_of_epochs is None:
            number_of_epochs = get_default("models", "number_of_epochs")
        if minibatch_size is None:
            minibatch_size = get_default("models", "minibatch_size")
        if learning_rate is None:
            learning_rate = self.config.learning_rate
        if new_run and not run_id:
            run_id = naming.generate_run_id()
        log_dir = self.log_directory(run_id=run_id)

        # Multi-device: resolve the (data, model) mesh from the arguments
        # (or the constructor-level default) — DP shards cells, TP shards
        # the gene-axis reconstruction heads (SURVEY.md §2.9, §7 Phase 4).
        from scvae_tpu import parallel

        mesh = parallel.resolve_mesh(
            mesh if mesh is not None else self.mesh,
            devices=devices,
            number_of_devices=number_of_devices,
            model_parallelism=model_parallelism,
        )
        self._active_mesh = mesh
        data_shards = mesh.shape["data"] if mesh is not None else 1

        # Temporary/scratch log directory (reference's flaky-filesystem
        # dance, ``variational_autoencoder.py:722-802, 1562-1576``): train
        # against a scratch copy, move results back afterwards.
        permanent_log_dir = None
        if caches_directory:
            import shutil

            permanent_log_dir = log_dir
            log_dir = naming.log_directory(
                caches_directory, self.name, run_id=run_id
            )
            if os.path.exists(permanent_log_dir) and not os.path.exists(
                log_dir
            ):
                shutil.copytree(permanent_log_dir, log_dir)

        self._active_log_directory = log_dir

        if intermediate_analyser is not None:
            intermediate_callback = self._make_intermediate_callback(
                intermediate_analyser,
                training_set,
                number_of_epochs,
                run_id,
                analyses_directory,
            )
            user_callback = epoch_callback

            def epoch_callback(epoch, train_state, epoch_metrics):  # noqa: F811
                intermediate_callback(epoch, train_state, epoch_metrics)
                if user_callback is not None:
                    user_callback(epoch, train_state, epoch_metrics)

        if reset_training and os.path.exists(log_dir):
            import shutil

            shutil.rmtree(log_dir)

        n_iw = self.number_of_importance_samples["training"]
        n_mc = self.number_of_monte_carlo_samples["training"]
        scaled_batch = self._scaled_minibatch_size(minibatch_size, "training")
        if data_shards > 1:
            # Batch rows must divide the data axis to be row-sharded.
            scaled_batch = max(
                data_shards, (scaled_batch // data_shards) * data_shards
            )

        rng = jax.random.PRNGKey(seed)
        rng, init_rng = jax.random.split(rng)
        train_state = self._init_state(init_rng)
        optimizer = step.make_optimizer(learning_rate)
        train_state = step.create_train_state(
            train_state.params, train_state.model_state, optimizer
        )

        start_epoch = training.resume_start_epoch(log_dir)
        if start_epoch:
            train_state, _ = checkpoints.restore_checkpoint(
                log_dir, train_state
            )
            checkpoints.truncate_learning_curves(log_dir, start_epoch)
            checkpoints.truncate_centroids(log_dir, start_epoch)
            checkpoints.truncate_array_series(log_dir, start_epoch)
            if verbose:
                print(f"Resuming training from epoch {start_epoch}.")

        batch_constraint = None
        if mesh is not None:
            train_state = parallel.shard_train_state(train_state, mesh)
            batch_constraint = parallel.batch_sharding(mesh)

        loss_fn = self._loss_fn(n_iw, n_mc, mesh=mesh)
        eval_step = step.make_eval_step(self._eval_fn(n_iw, n_mc))

        noisy = None
        if training_set.noisy_preprocessing_methods:
            noisy = build_preprocessor(
                training_set.noisy_preprocessing_methods, noisy=True
            )

        use_device_data = noisy is None and self._choose_device_placement(
            training_set, data_placement
        )

        if use_device_data:
            from scvae_tpu.data.pipeline import device_resident_data

            data_sharding = (
                parallel.batch_sharding(mesh) if mesh is not None else None
            )
            train_arrays = self._model_arrays(training_set)
            train_epoch = step.make_train_epoch(
                loss_fn, optimizer, batch_constraint=batch_constraint,
                # deferred mode keeps a one-epoch-old reference to the
                # train state for delayed processing, so the input buffers
                # must not be donated
                donate=metrics_fetch != "deferred",
                batch_dtypes=_bf16_batch_dtypes(train_arrays, self.config),
            )
            eval_epoch = step.make_eval_epoch(
                self._eval_fn(n_iw, n_mc), batch_constraint=batch_constraint
            )
            n_train = training_set.number_of_examples
            train_data = device_resident_data(
                train_arrays,
                count_dtype=self.DEVICE_COUNT_DTYPES,
                sharding=data_sharding,
                pad_rows_to_multiple_of=data_shards,
            )
            train_data = _append_lgamma_rowsum(
                train_data, self.config, sharding=data_sharding
            )
            strat_shards, n_train_padded = _packed_stratification(train_data)
            run_epoch = training.device_epoch_runner(
                train_epoch, train_data, n_train, scaled_batch, seed,
                lazy=metrics_fetch == "deferred",
                stratify_shards=strat_shards,
                n_padded=n_train_padded,
            )
            evaluate_training = (
                self._device_evaluator(
                    eval_epoch, eval_step, train_data, n_train, scaled_batch,
                    mesh=mesh, stratify_shards=strat_shards,
                )
                if full_train_evaluation
                else None
            )
            evaluate_validation = None
            if validation_set is not None:
                validation_data = device_resident_data(
                    self._model_arrays(validation_set),
                    count_dtype=self.DEVICE_COUNT_DTYPES,
                    sharding=data_sharding,
                    pad_rows_to_multiple_of=data_shards,
                )
                valid_strat, _ = _packed_stratification(validation_data)
                evaluate_validation = self._device_evaluator(
                    eval_epoch,
                    eval_step,
                    validation_data,
                    validation_set.number_of_examples,
                    scaled_batch,
                    mesh=mesh, stratify_shards=valid_strat,
                )
        else:
            train_step = step.make_train_step(loss_fn, optimizer, donate=False)
            pipeline_sharding = (
                parallel.batch_sharding(mesh) if mesh is not None else None
            )

            def make_training_pipeline(epoch: int):
                arrays = self._model_arrays(
                    training_set, noisy_preprocess=noisy
                )
                return BatchPipeline(
                    arrays, scaled_batch, shuffle=True, seed=seed + epoch,
                    sharding=pipeline_sharding,
                    count_dtype=(
                        None if noisy is not None
                        else self.DEVICE_COUNT_DTYPES
                    ),
                )

            run_epoch = training.streaming_epoch_runner(
                train_step, make_training_pipeline
            )
            evaluate_training = None
            if full_train_evaluation:
                def evaluate_training(train_state, rng):
                    return training.evaluate_on_pipeline(
                        eval_step,
                        train_state,
                        make_training_pipeline(0),
                        rng,
                    )

            evaluate_validation = None
            if validation_set is not None:
                validation_arrays = self._model_arrays(validation_set)

                def evaluate_validation(train_state, rng):
                    return training.evaluate_on_pipeline(
                        eval_step,
                        train_state,
                        BatchPipeline(
                            validation_arrays, scaled_batch, shuffle=False,
                            sharding=pipeline_sharding,
                            count_dtype=self.DEVICE_COUNT_DTYPES,
                        ),
                        rng,
                    )

        if metrics_fetch == "deferred" and not use_device_data:
            # Streaming feeds fetch per step by construction; deferred
            # fetching only applies to the device-resident scan path.
            metrics_fetch = "sync"

        result = training.run_training_loop(
            train_state=train_state,
            run_epoch=run_epoch,
            fetch_mode=metrics_fetch,
            evaluate_training=evaluate_training,
            evaluate_validation=evaluate_validation,
            number_of_epochs=number_of_epochs,
            number_of_warm_up_epochs=self.config.number_of_warm_up_epochs,
            rng=rng,
            log_directory=log_dir,
            early_stopping_rounds=self.early_stopping_rounds,
            start_epoch=start_epoch,
            verbose=verbose,
            epoch_callback=epoch_callback,
        )
        self.stopped_early = result.stopped_early

        if permanent_log_dir is not None:
            import shutil

            checkpoints.wait_for_pending_writes()
            if os.path.exists(permanent_log_dir):
                shutil.rmtree(permanent_log_dir)
            shutil.copytree(log_dir, permanent_log_dir)
            shutil.rmtree(log_dir)

        return result

    # -- evaluate ----------------------------------------------------------

    def _restore(
        self,
        run_id: str | None,
        use_early_stopping_model: bool,
        use_best_model: bool,
        rng: jax.Array,
    ) -> tuple[step.TrainState, str]:
        directory = self.log_directory(
            run_id=run_id,
            early_stopping=use_early_stopping_model,
            best_model=use_best_model,
        )
        if not checkpoints.checkpoint_exists(directory):
            raise FileNotFoundError(
                f"No checkpoint found in {directory}; train the model first."
            )
        template = self._init_state(rng)
        train_state, _ = checkpoints.restore_checkpoint(directory, template)
        return train_state, directory

    def evaluate(
        self,
        evaluation_set: DataSet,
        minibatch_size: int | None = None,
        run_id: str | None = None,
        use_early_stopping_model: bool = False,
        use_best_model: bool = False,
        output_versions: str | list[str] = "all",
        evaluation_subset_indices=None,
        seed: int = 0,
        verbose: bool = True,
        mesh=None,
        devices=None,
        number_of_devices: int | None = None,
        model_parallelism: int | None = None,
    ):
        """Batched evaluation; returns (transformed, reconstructed, latent)
        ``DataSet`` objects per ``output_versions``
        (reference ``variational_autoencoder.py:1781-2217``)."""
        if minibatch_size is None:
            minibatch_size = get_default("models", "minibatch_size")
        if output_versions == "all":
            output_versions = ["transformed", "reconstructed", "latent"]
        elif isinstance(output_versions, str):
            output_versions = [output_versions]

        n_iw = self.number_of_importance_samples["evaluation"]
        n_mc = self.number_of_monte_carlo_samples["evaluation"]
        scaled_batch = self._scaled_minibatch_size(minibatch_size, "evaluation")

        from scvae_tpu import parallel

        mesh = parallel.resolve_mesh(
            mesh if mesh is not None else self.mesh,
            devices=devices,
            number_of_devices=number_of_devices,
            model_parallelism=model_parallelism,
        )
        eval_sharding = None
        if mesh is not None:
            data_shards = mesh.shape["data"]
            scaled_batch = max(
                data_shards, (scaled_batch // data_shards) * data_shards
            )
            eval_sharding = parallel.batch_sharding(mesh)

        rng = jax.random.PRNGKey(seed)
        rng, restore_rng = jax.random.split(rng)
        train_state, _ = self._restore(
            run_id, use_early_stopping_model, use_best_model, restore_rng
        )
        if mesh is not None:
            train_state = parallel.shard_train_state(train_state, mesh)

        if evaluation_subset_indices is None:
            evaluation_subset_indices = indices_for_evaluation_subset(
                evaluation_set
            )

        config = self.config

        @jax.jit
        def eval_batch(params, model_state, batch, rng):
            batch = step.cast_batch_to_f32(step.materialize_batch(batch))
            return vae.evaluation_outputs(
                config, params, model_state, batch, rng, n_iw=n_iw, n_mc=n_mc
            )

        arrays = self._model_arrays(evaluation_set)
        pipeline = BatchPipeline(
            arrays, scaled_batch, shuffle=False, prefetch=2,
            sharding=eval_sharding,
            # narrow integral counts + CSR wire for the host→device leg
            # (the device output transfers dominate; this halves-to-
            # fifths the input side for free)
            count_dtype=self.DEVICE_COUNT_DTYPES,
        )

        n = evaluation_set.number_of_examples
        f = config.feature_size
        d = config.latent_size
        p_x_mean = np.empty((n, f), np.float32)
        # Reconstruction stddevs are only kept for the stratified
        # evaluation subset (≤25 cells) — sparse rows, like the
        # reference's lil_matrix trick for large sets
        # (``variational_autoencoder.py:1969-2049``).
        import scipy.sparse as _sparse

        p_x_stddev = _sparse.lil_matrix((n, f), dtype=np.float32)
        stddev_of_mean = _sparse.lil_matrix((n, f), dtype=np.float32)
        subset_mask = np.zeros(n, bool)
        subset_mask[np.asarray(evaluation_subset_indices, np.int64)] = True
        q_z_mean = np.empty((n, d), np.float32)
        totals = {"lower_bound": 0.0, "reconstruction_error": 0.0,
                  "kl_divergence": 0.0}

        offset = 0
        for batch in pipeline.epoch():
            rng, sub = jax.random.split(rng)
            out = eval_batch(
                train_state.params, train_state.model_state, batch, sub
            )
            b = int(np.shape(batch["t"])[0])
            p_x_mean[offset:offset + b] = np.asarray(out["p_x_mean"])
            rows = np.nonzero(subset_mask[offset:offset + b])[0]
            if rows.size:
                p_x_stddev[offset + rows] = np.asarray(out["p_x_stddev"])[rows]
                stddev_of_mean[offset + rows] = np.asarray(
                    out["stddev_of_p_x_given_z_mean"]
                )[rows]
            q_z_mean[offset:offset + b] = np.asarray(out["q_z_mean"])
            for k in totals:
                totals[k] += float(out[k]) * b
            offset += b

        metrics = {k: v / max(n, 1) for k, v in totals.items()}
        if verbose:
            print(
                "Evaluation: ELBO {lower_bound:.6g}  ENRE "
                "{reconstruction_error:.6g}  KL {kl_divergence:.6g}".format(
                    **metrics
                )
            )

        output_sets: list[DataSet | None] = []
        if "transformed" in output_versions:
            output_sets.append(evaluation_set)
        if "reconstructed" in output_versions:
            reconstructed = DataSet(
                evaluation_set.name,
                title=evaluation_set.title,
                specifications=evaluation_set.specifications,
                values=p_x_mean,
                total_standard_deviations=p_x_stddev,
                explained_standard_deviations=stddev_of_mean,
                labels=evaluation_set.labels,
                example_names=evaluation_set.example_names,
                feature_names=evaluation_set.feature_names,
                batch_indices=evaluation_set.batch_indices,
                kind=evaluation_set.kind,
                version="reconstructed",
                directory=evaluation_set.directory,
            )
            output_sets.append(reconstructed)
        if "latent" in output_versions:
            latent = DataSet(
                evaluation_set.name,
                title=evaluation_set.title,
                specifications={},
                values=q_z_mean,
                labels=evaluation_set.labels,
                example_names=evaluation_set.example_names,
                feature_names=np.array(
                    [f"latent variable {i + 1}" for i in range(d)]
                ),
                kind=evaluation_set.kind,
                version="z",
                directory=evaluation_set.directory,
            )
            output_sets.append(latent)

        self._last_evaluation_metrics = metrics
        if len(output_sets) == 1:
            return output_sets[0]
        return tuple(output_sets)

    # -- sample ------------------------------------------------------------

    def sample(
        self,
        sample_size: int | None = None,
        minibatch_size: int | None = None,
        run_id: str | None = None,
        use_early_stopping_model: bool = False,
        use_best_model: bool = False,
        seed: int = 0,
    ) -> DataSet:
        """Ancestral sampling z ~ p(z) → E[x|z]
        (reference ``variational_autoencoder.py:1601-1779``)."""
        if self.config.use_count_sum_as_parameter or (
            self.config.use_count_sum_as_feature
            or self.config.batch_correction
        ):
            raise NotImplementedError(
                "Sampling is not implemented with batch correction or count-"
                "sum models (matches the reference restriction)."
            )
        if sample_size is None:
            sample_size = get_default("models", "sample_size") or 100
        if minibatch_size is None:
            minibatch_size = get_default("models", "minibatch_size")

        rng = jax.random.PRNGKey(seed)
        rng, restore_rng = jax.random.split(rng)
        train_state, _ = self._restore(
            run_id, use_early_stopping_model, use_best_model, restore_rng
        )

        config = self.config
        params = train_state.params
        model_state = train_state.model_state

        @jax.jit
        def decode(z):
            batch = {"x": z}  # unused by decoder path
            dec_in = z[None]  # (1, B, D) sample axis
            if config.generative_architecture == "MLP":
                from scvae_tpu.models import networks

                dec_h, _ = networks.apply_mlp(
                    params["decoder"],
                    model_state.get("decoder", {}),
                    dec_in,
                    training=False,
                )
            else:
                dec_h = dec_in
            p_x = vae._build_reconstruction(config, params, dec_h, batch)
            return p_x.mean()[0]

        rng, z_rng = jax.random.split(rng)
        p_z = vae._build_prior(config, params)
        z = p_z.sample(z_rng, (sample_size, config.latent_size))
        z = jnp.reshape(z, (sample_size, config.latent_size))

        means = []
        for i in range(0, sample_size, minibatch_size):
            means.append(np.asarray(decode(z[i:i + minibatch_size])))
        values = np.concatenate(means, axis=0)

        return DataSet(
            "samples",
            title="Model samples",
            specifications={},
            values=values,
            example_names=np.array(
                [f"sample {i + 1}" for i in range(sample_size)]
            ),
            feature_names=np.array(
                [f"feature {j + 1}" for j in range(config.feature_size)]
            ),
            kind="sample",
            version="original",
        )
