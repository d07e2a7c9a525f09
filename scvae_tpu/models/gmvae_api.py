"""High-level GMVAE API with the reference's surface.

Counterpart of the class at
``scvae/models/gaussian_mixture_variational_autoencoder.py:51``; extends the
VAE API with cluster-aware evaluation (cluster ids = argmax q(y|x),
majority-vote label predictions, y latent outputs) and ancestral
y → z → x sampling.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from scvae_tpu.data.dataset import DataSet
from scvae_tpu.data.pipeline import BatchPipeline
from scvae_tpu.data.utilities import indices_for_evaluation_subset
from scvae_tpu.defaults import get_default
from scvae_tpu.distributions import DISTRIBUTIONS
from scvae_tpu.models import gmvae, naming, networks, step
from scvae_tpu.models.api import VariationalAutoencoder
from scvae_tpu.analyses.prediction import map_cluster_ids_to_label_ids


class GaussianMixtureVariationalAutoencoder(VariationalAutoencoder):
    """GMVAE with train/evaluate/sample (reference API parity)."""

    type = "GMVAE"

    def __init__(
        self,
        feature_size: int,
        latent_size: int | None = None,
        hidden_sizes=None,
        reconstruction_distribution: str | None = None,
        number_of_reconstruction_classes: int | None = None,
        latent_distribution: str | None = None,
        number_of_latent_clusters: int | None = None,
        prior_probabilities_method: str | None = None,
        prior_probabilities=None,
        minibatch_normalisation: bool | None = None,
        batch_correction: bool | None = None,
        number_of_batches: int | None = None,
        number_of_warm_up_epochs: int | None = None,
        proportion_of_free_nats_for_y_kl_divergence: float | None = None,
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
            latent_distribution = get_default("models", "latent_distribution")[
                self.type
            ]
        if number_of_latent_clusters is None:
            number_of_latent_clusters = get_default(
                "models", "number_of_classes"
            )
        if prior_probabilities_method is None:
            prior_probabilities_method = get_default(
                "models", "prior_probabilities_method"
            )
        if prior_probabilities_method == "infer":
            prior_probabilities_method = "custom"
        if proportion_of_free_nats_for_y_kl_divergence is None:
            proportion_of_free_nats_for_y_kl_divergence = get_default(
                "models", "proportion_of_free_nats_for_y_kl_divergence"
            )
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

        from scvae_tpu.models.utilities import parse_numbers_of_samples

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

        self.config = gmvae.GMVAEConfig(
            feature_size=feature_size,
            latent_size=latent_size,
            hidden_sizes=tuple(hidden_sizes),
            reconstruction_distribution=reconstruction_distribution,
            number_of_reconstruction_classes=number_of_reconstruction_classes,
            latent_distribution=latent_distribution,
            number_of_latent_clusters=number_of_latent_clusters,
            prior_probabilities_method=prior_probabilities_method,
            prior_probabilities=(
                tuple(prior_probabilities) if prior_probabilities else None
            ),
            proportion_of_free_nats_for_y_kl_divergence=(
                proportion_of_free_nats_for_y_kl_divergence
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

        self.feature_size = feature_size
        self.latent_size = latent_size
        self.hidden_sizes = tuple(hidden_sizes)
        self.base_log_directory = log_directory
        self.stopped_early = None
        self.mesh = kwargs.get("mesh")
        self._active_mesh = None

    # -- identity ----------------------------------------------------------

    @property
    def number_of_latent_clusters(self) -> int:
        return self.config.number_of_latent_clusters

    @property
    def name(self) -> str:
        return naming.model_name(
            self.type,
            latent_distribution=self.config.latent_distribution,
            number_of_latent_clusters=self.config.number_of_latent_clusters,
            prior_probabilities_method=self.config.prior_probabilities_method,
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
            analytical_kl_term=False,
            minibatch_normalisation=self.config.minibatch_normalisation,
            batch_correction=self.config.batch_correction,
            dropout_parts=self.dropout_parts,
            kl_weight=self.config.kl_weight,
            number_of_warm_up_epochs=self.config.number_of_warm_up_epochs,
        )

    # -- functional hooks --------------------------------------------------

    def _init_state(self, rng: jax.Array) -> step.TrainState:
        params, model_state = gmvae.init(self.config, rng)
        optimizer = step.make_optimizer(self.config.learning_rate)
        return step.create_train_state(params, model_state, optimizer)

    def _loss_fn(self, n_iw: int, n_mc: int, mesh=None):
        config = self.config

        def loss(params, model_state, batch, rng, warm_up_weight):
            return gmvae.loss_fn(
                config, params, model_state, batch, rng,
                n_iw=n_iw, n_mc=n_mc, warm_up_weight=warm_up_weight,
                mesh=mesh,
            )

        return loss

    def _eval_fn(self, n_iw: int, n_mc: int):
        config = self.config

        def evaluate(params, model_state, batch, rng):
            metrics, _ = gmvae.elbo_terms(
                config, params, model_state, batch, rng,
                training=False, n_iw=n_iw, n_mc=n_mc,
            )
            return metrics

        return evaluate

    def _latent_values_fn(self):
        config = self.config

        @jax.jit
        def latents(params, model_state, x):
            return gmvae.latent_means(config, params, model_state, x)

        return latents

    # -- per-epoch cluster accuracy (reference GMVAE train loop tracks
    # accuracy/superset accuracy every epoch, ``:1299-1333``) ------------

    def _make_accuracy_callback(self, data_sets: dict[str, Any]):
        """Returns an epoch_callback computing argmax-q(y|x) cluster ids →
        majority-vote labels → accuracy for each labelled subset, appended
        to the run's learning curves by the harness caller."""
        import jax.numpy as jnp

        config = self.config

        del config

        @jax.jit
        def cluster_ids_fn(params, model_state, x):
            # Only the q(y|x) head is needed for cluster ids.
            h_y, _ = networks.apply_mlp(
                params["q_y"]["encoder"],
                model_state.get("q_y", {}),
                x,
                training=False,
            )
            logits = networks.apply_dense(params["q_y"]["logits"], h_y)
            return jnp.argmax(logits, axis=-1)

        import scipy.sparse

        prepared = {}
        for kind, data_set in data_sets.items():
            if data_set is None or not data_set.has_labels:
                continue
            values = data_set.preprocessed_values
            if values is None:
                values = data_set.values
            if scipy.sparse.issparse(values):
                values = values.toarray()
            to_id = data_set.class_name_to_class_id
            label_ids = np.array([to_id[n] for n in data_set.labels])
            excluded = [
                to_id[n]
                for n in (data_set.excluded_classes or [])
                if n in to_id
            ]
            prepared[kind] = (
                np.asarray(values, np.float32),
                label_ids,
                excluded,
            )

        def callback(epoch, train_state, epoch_metrics):
            for kind, (x, label_ids, excluded) in prepared.items():
                if self._active_mesh is not None:
                    from scvae_tpu.parallel import replicate_to_mesh

                    x_dev = replicate_to_mesh(x, self._active_mesh)
                else:
                    x_dev = jnp.asarray(x)
                ids = np.asarray(
                    cluster_ids_fn(
                        train_state.params, train_state.model_state, x_dev
                    )
                )
                predicted = map_cluster_ids_to_label_ids(
                    label_ids, ids, excluded
                )
                keep = ~np.isin(label_ids, excluded)
                accuracy = (
                    float((predicted[keep] == label_ids[keep]).mean())
                    if keep.any()
                    else float("nan")
                )
                epoch_metrics.setdefault(kind, {})["accuracy"] = accuracy

        return callback

    def train(
        self,
        training_set,
        validation_set=None,
        *,
        track_accuracy: bool = True,
        epoch_callback=None,
        **kwargs,
    ):
        """GMVAE training additionally tracks per-epoch cluster accuracy
        against labels when available (reference ``:1299-1333``)."""
        accuracy_callback = None
        if track_accuracy and (
            training_set.has_labels
            or (validation_set is not None and validation_set.has_labels)
        ):
            accuracy_callback = self._make_accuracy_callback(
                {"training": training_set, "validation": validation_set}
            )

        user_callback = epoch_callback
        config = self.config

        def epoch_callback(epoch, train_state, epoch_metrics):
            if accuracy_callback is not None:
                accuracy_callback(epoch, train_state, epoch_metrics)
            # per-epoch prior-centroid snapshot (probabilities, means,
            # covariances) for the centroid-evolution analyses
            log_directory = getattr(self, "_active_log_directory", None)
            if log_directory:
                from scvae_tpu.models import checkpoints as _checkpoints

                _checkpoints.append_centroids(
                    log_directory,
                    gmvae.prior_centroids(config, train_state.params),
                )
            if user_callback is not None:
                user_callback(epoch, train_state, epoch_metrics)

        return super().train(
            training_set,
            validation_set,
            epoch_callback=epoch_callback,
            **kwargs,
        )

    # -- evaluate ----------------------------------------------------------

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
        """Batched evaluation; returns DataSets per ``output_versions``
        (``transformed``/``reconstructed``/``latent``), where ``latent``
        yields both z and y sets, and every output set carries model
        cluster/label predictions (reference ``:2164-2786``)."""
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
            return gmvae.evaluation_outputs(
                config, params, model_state, batch, rng, n_iw=n_iw, n_mc=n_mc
            )

        arrays = self._model_arrays(evaluation_set)
        pipeline = BatchPipeline(
            arrays, scaled_batch, shuffle=False, sharding=eval_sharding,
            count_dtype=self.DEVICE_COUNT_DTYPES,
        )

        n = evaluation_set.number_of_examples
        f = config.feature_size
        d = config.latent_size
        k = config.n_clusters
        p_x_mean = np.empty((n, f), np.float32)
        # stddevs only for the stratified evaluation subset (sparse rows,
        # reference's lil_matrix memory trick)
        import scipy.sparse as _sparse

        p_x_stddev = _sparse.lil_matrix((n, f), dtype=np.float32)
        stddev_of_mean = _sparse.lil_matrix((n, f), dtype=np.float32)
        subset_mask = np.zeros(n, bool)
        subset_mask[np.asarray(evaluation_subset_indices, np.int64)] = True
        q_z_mean = np.empty((n, d), np.float32)
        y_probs = np.empty((n, k), np.float32)
        cluster_ids = np.empty((n,), np.int32)
        totals = {
            "lower_bound": 0.0,
            "reconstruction_error": 0.0,
            "kl_divergence": 0.0,
            "kl_divergence_z": 0.0,
            "kl_divergence_y": 0.0,
        }

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
            y_probs[offset:offset + b] = np.asarray(out["y_probs"])
            cluster_ids[offset:offset + b] = np.asarray(out["cluster_ids"])
            for key in totals:
                totals[key] += float(out[key]) * b
            offset += b

        metrics = {key: value / max(n, 1) for key, value in totals.items()}
        if verbose:
            print(
                "Evaluation: ELBO {lower_bound:.6g}  ENRE "
                "{reconstruction_error:.6g}  KL_z {kl_divergence_z:.6g}  "
                "KL_y {kl_divergence_y:.6g}".format(**metrics)
            )
        self._last_evaluation_metrics = metrics

        # model predictions: majority-vote labels from cluster ids
        predicted_labels = None
        predicted_superset_labels = None
        if evaluation_set.has_labels:
            to_id = evaluation_set.class_name_to_class_id
            to_name = evaluation_set.class_id_to_class_name
            label_ids = np.array(
                [to_id[name] for name in evaluation_set.labels]
            )
            excluded = [
                to_id[name]
                for name in (evaluation_set.excluded_classes or [])
                if name in to_id
            ]
            predicted_label_ids = map_cluster_ids_to_label_ids(
                label_ids, cluster_ids, excluded
            )
            predicted_labels = np.array(
                [to_name[i] for i in predicted_label_ids]
            )
        if evaluation_set.has_superset_labels:
            to_id = evaluation_set.superset_class_name_to_superset_class_id
            to_name = evaluation_set.superset_class_id_to_superset_class_name
            label_ids = np.array(
                [to_id[name] for name in evaluation_set.superset_labels]
            )
            excluded = [
                to_id[name]
                for name in (evaluation_set.excluded_superset_classes or [])
                if name in to_id
            ]
            predicted_ids = map_cluster_ids_to_label_ids(
                label_ids, cluster_ids, excluded
            )
            predicted_superset_labels = np.array(
                [to_name[i] for i in predicted_ids]
            )

        def attach_predictions(data_set: DataSet) -> DataSet:
            data_set.update_predictions(
                predicted_cluster_ids=cluster_ids,
                predicted_labels=predicted_labels,
                predicted_superset_labels=predicted_superset_labels,
            )
            return data_set

        output_sets: list[Any] = []
        if "transformed" in output_versions:
            output_sets.append(attach_predictions(evaluation_set))
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
            output_sets.append(attach_predictions(reconstructed))
        if "latent" in output_versions:
            latent_z = DataSet(
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
            latent_y = DataSet(
                evaluation_set.name,
                title=evaluation_set.title,
                specifications={},
                values=y_probs,
                labels=evaluation_set.labels,
                example_names=evaluation_set.example_names,
                feature_names=np.array(
                    [f"cluster {k_i + 1}" for k_i in range(k)]
                ),
                kind=evaluation_set.kind,
                version="y",
                directory=evaluation_set.directory,
            )
            output_sets.append(
                {
                    "z": attach_predictions(latent_z),
                    "y": attach_predictions(latent_y),
                }
            )
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
        """Ancestral sampling y ~ p(y) → z ~ p(z|y) → E[x|z]
        (reference ``:1949-2160``)."""
        if self.config.use_count_sum_as_parameter or (
            self.config.use_count_sum_as_feature
            or self.config.batch_correction
        ):
            raise NotImplementedError(
                "Sampling is not implemented with batch correction or "
                "count-sum models (matches the reference restriction)."
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
        k = config.n_clusters

        rng, y_rng, z_rng = jax.random.split(rng, 3)
        p_y_logits = gmvae._p_y_logits(config, params)
        ys = jax.random.categorical(y_rng, p_y_logits, shape=(sample_size,))

        eye = jnp.eye(k, dtype=jnp.float32)
        prior_spec = DISTRIBUTIONS[config.z_prior_name]
        p_z_theta = gmvae._build_theta(
            prior_spec, params["p_z"]["heads"], eye
        )  # leaves (K, D)
        p_z = prior_spec.build(p_z_theta)
        z_all = p_z.sample(z_rng, (sample_size,))  # (N, K, D)
        z = jnp.take_along_axis(z_all, ys[:, None, None], axis=1)[:, 0, :]

        @jax.jit
        def decode(z_batch):
            dec_in = z_batch[None]
            dec_h, _ = networks.apply_mlp(
                params["decoder"],
                model_state.get("decoder", {}),
                dec_in,
                training=False,
            )
            theta = gmvae._build_theta(
                config.reconstruction_spec, params["reconstruction"], dec_h
            )
            p_x = config.reconstruction_spec.build(theta)
            if config.k_max:
                from scvae_tpu.distributions import Categorical, Categorised

                logits = networks.apply_dense(
                    params["categorised_logits"], dec_h
                )
                logits = jnp.reshape(
                    logits,
                    logits.shape[:-1]
                    + (config.feature_size, config.k_max + 1),
                )
                p_x = Categorised(dist=p_x, cat=Categorical(logits=logits))
            return p_x.mean()[0]

        means = []
        for i in range(0, sample_size, minibatch_size):
            means.append(np.asarray(decode(z[i:i + minibatch_size])))
        values = np.concatenate(means, axis=0)

        sample_set = DataSet(
            "samples",
            title="Model samples",
            specifications={},
            values=values,
            labels=np.asarray(ys).astype(str),
            example_names=np.array(
                [f"sample {i + 1}" for i in range(sample_size)]
            ),
            feature_names=np.array(
                [f"feature {j + 1}" for j in range(config.feature_size)]
            ),
            kind="sample",
            version="original",
        )
        return sample_set
