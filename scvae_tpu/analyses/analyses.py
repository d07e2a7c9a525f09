"""Analysis orchestrators.

Counterpart of ``scvae/analyses/analyses.py`` (1655 LoC): the
``simple ⊂ standard ⊂ all`` analysis groups, data-set analyses, model
analyses (learning curves from the run's persisted JSON curves instead of
re-parsed TF event files), intermediate per-epoch latent plots, and result
analyses producing the metric/prediction logs + pickles that
cross-analysis consumes (``<kind>-metrics.pkl.gz``,
``<kind>-prediction-<spec>.pkl.gz``) and TSV exports.
"""

from __future__ import annotations

import gzip
import os
import pickle
import time
from typing import Any, Sequence

import numpy as np
import scipy.sparse

from scvae_tpu.analyses import figures, metrics
from scvae_tpu.analyses.decomposition import decompose
from scvae_tpu.data.utilities import save_values
from scvae_tpu.defaults import get_default
from scvae_tpu.models import checkpoints
from scvae_tpu.utils.strings import capitalise_string, format_time, normalise_string

ANALYSIS_GROUPS: dict[str, list[str]] = {
    "simple": [
        "metrics",
        "images",
        "learning_curves",
        "latent_values",
        "predictions",
    ],
    "standard": [
        "profile_comparisons",
        "distributions",
        "decompositions",
        "latent_space",
    ],
    "all": [
        "heat_maps",
        "distances",
        "feature_value_standard_deviations",
        "latent_distributions",
        "latent_correlations",
        "latent_features",
        "kl_heat_maps",
        "accuracies",
    ],
}
ANALYSIS_GROUPS["standard"] = (
    ANALYSIS_GROUPS["simple"] + ANALYSIS_GROUPS["standard"]
)
ANALYSIS_GROUPS["all"] = ANALYSIS_GROUPS["standard"] + ANALYSIS_GROUPS["all"]


def _resolve_included(included_analyses) -> list[str]:
    if included_analyses is None:
        included_analyses = get_default("analyses", "included_analyses")
    if isinstance(included_analyses, str):
        if included_analyses in ANALYSIS_GROUPS:
            return list(ANALYSIS_GROUPS[included_analyses])
        return [included_analyses]
    resolved: list[str] = []
    for item in included_analyses:
        if item in ANALYSIS_GROUPS:
            resolved.extend(ANALYSIS_GROUPS[item])
        else:
            resolved.append(item)
    return resolved


def _subdirectory(base: str, *parts: str) -> str:
    path = os.path.join(base, *parts)
    os.makedirs(path, exist_ok=True)
    return path


# --------------------------------------------------------------------------
# Data analyses (reference analyses.py:60-301)
# --------------------------------------------------------------------------


def analyse_data(
    data_sets: Sequence,
    decomposition_methods: Sequence[str] | None = None,
    highlight_feature_indices=None,
    included_analyses=None,
    analysis_level: str | None = None,
    export_options=None,
    analyses_directory: str | None = None,
) -> dict[str, Any]:
    """Summary statistics, class/count histograms, and decomposition
    scatters for one or more data subsets."""
    if analyses_directory is None:
        analyses_directory = get_default("analyses", "directory")
    if decomposition_methods is None:
        decomposition_methods = [
            get_default("analyses", "decomposition_method")
        ]
    included = _resolve_included(included_analyses)
    if not isinstance(data_sets, (list, tuple)):
        data_sets = [data_sets]

    directory = _subdirectory(analyses_directory, "data")
    results: dict[str, Any] = {"statistics": [], "figures": []}

    if "metrics" in included:
        stats = [
            metrics.summary_statistics(
                ds.values, name=f"{ds.kind} set", tolerance=0.5
            )
            for ds in data_sets
            if ds.has_values
        ]
        results["statistics"] = stats
        table = metrics.format_summary_statistics(stats)
        print(table)
        with open(os.path.join(directory, "statistics.log"), "w") as f:
            f.write(table + "\n")

    for data_set in data_sets:
        if not data_set.has_values:
            continue
        set_directory = _subdirectory(directory, data_set.kind)

        if "distributions" in included:
            results["figures"].append(
                figures.plot_cutoff_count_histogram(
                    data_set.values,
                    name=f"count_histogram-{data_set.kind}",
                    directory=set_directory,
                )
            )
            if data_set.has_labels:
                results["figures"].append(
                    figures.plot_class_histogram(
                        data_set.labels,
                        class_names=data_set.class_names,
                        name=f"class_histogram-{data_set.kind}",
                        directory=set_directory,
                    )
                )
            results["figures"].append(
                figures.plot_histogram(
                    np.asarray(data_set.count_sum),
                    name=f"count_sum-{data_set.kind}",
                    directory=set_directory,
                    label="total counts per cell",
                )
            )

        if "distributions" in included and data_set.example_type == "images":
            results["figures"].append(
                figures.combine_images_from_data_set(
                    data_set,
                    name=f"image_examples-{data_set.kind}",
                    directory=set_directory,
                )
            )

        if "decompositions" in included:
            for method in decomposition_methods:
                if method.lower() in ("none",):
                    continue
                try:
                    decomposed = decompose(
                        data_set.values, method=method, number_of_components=2
                    )
                except Exception as error:  # t-SNE on tiny sets etc.
                    print(f"Decomposition {method} failed: {error}")
                    continue
                results["figures"].append(
                    figures.plot_values(
                        decomposed,
                        colour_coding=(
                            data_set.labels if data_set.has_labels else None
                        ),
                        name=f"{normalise_string(method)}-{data_set.kind}",
                        directory=set_directory,
                        axis_labels=(
                            f"{method} component 1",
                            f"{method} component 2",
                        ),
                    )
                )
                if export_options and "decomposition" in export_options:
                    save_values(
                        decomposed,
                        name=f"{normalise_string(method)}-{data_set.kind}",
                        row_names=data_set.example_names,
                        directory=set_directory,
                    )

    return results


# --------------------------------------------------------------------------
# Model analyses (reference analyses.py:304-569)
# --------------------------------------------------------------------------


def analyse_model(
    model,
    run_id: str | None = None,
    included_analyses=None,
    analysis_level: str | None = None,
    export_options=None,
    analyses_directory: str | None = None,
) -> dict[str, Any]:
    """Learning-curve (and KL/accuracy evolution) plots from the run's
    persisted curves."""
    if analyses_directory is None:
        analyses_directory = get_default("analyses", "directory")
    included = _resolve_included(included_analyses)
    directory = _subdirectory(
        analyses_directory, "model", normalise_string(model.name)
    )
    results: dict[str, Any] = {"figures": []}

    curves = checkpoints.load_learning_curves(
        model.log_directory(run_id=run_id)
    )
    if curves and "learning_curves" in included:
        results["figures"].append(
            figures.plot_learning_curves(
                curves, model_type=model.type, directory=directory
            )
        )
        for kind, kind_curves in curves.items():
            if "accuracy" in kind_curves and "accuracies" in included:
                results["figures"].append(
                    figures.plot_accuracy_evolution(
                        {kind: kind_curves["accuracy"]},
                        name=f"accuracy_evolution-{kind}",
                        directory=directory,
                    )
                )
    results["learning_curves"] = curves

    # GMVAE centroid evolution (probabilities + PCA-projected mean paths)
    centroid_history = checkpoints.load_centroids(
        model.log_directory(run_id=run_id)
    )
    if centroid_history is not None and "learning_curves" in included:
        results["figures"].append(
            figures.plot_centroid_probabilities_evolution(
                centroid_history["probabilities"],
                directory=directory,
            )
        )
        means = np.asarray(centroid_history["means"])  # (E, K, D)
        e, k, d = means.shape
        flat = means.reshape(-1, d)
        if d > 2:
            flat = decompose(flat, method="PCA", number_of_components=2)
        paths = flat.reshape(e, k, 2)
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        for cluster in range(k):
            ax.plot(
                paths[:, cluster, 0], paths[:, cluster, 1],
                marker=".", markersize=3, linewidth=1,
                label=f"cluster {cluster + 1}",
            )
            ax.scatter(
                paths[-1, cluster, 0], paths[-1, cluster, 1],
                marker="x", s=60,
            )
        ax.set_xlabel("component 1")
        ax.set_ylabel("component 2")
        ax.legend(frameon=False, fontsize="x-small")
        results["figures"].append(
            figures._save(fig, "centroid_mean_evolution", directory)
        )
    results["centroids"] = centroid_history
    return results


# --------------------------------------------------------------------------
# Intermediate analyses (reference analyses.py:572-747)
# --------------------------------------------------------------------------


def analyse_intermediate_results(
    epoch: int,
    learning_curves: dict | None = None,
    epoch_start=None,
    model_type: str = "VAE",
    latent_values=None,
    data_set=None,
    centroids: dict | None = None,
    model_name: str = "model",
    run_id: str | None = None,
    analyses_directory: str | None = None,
) -> list[str]:
    """Latent scatter (+ centroids) and curves at a training epoch."""
    if analyses_directory is None:
        analyses_directory = get_default("analyses", "directory")
    directory = _subdirectory(
        analyses_directory,
        "intermediate",
        normalise_string(model_name),
        f"epoch_{epoch + 1}",
    )
    saved = []
    if learning_curves:
        saved.append(
            figures.plot_learning_curves(
                learning_curves, model_type=model_type, directory=directory
            )
        )
    if latent_values is not None:
        values = np.asarray(latent_values)
        if values.shape[1] == 2:
            decomposed = values
            centroids_decomposed = centroids
            labels = ("latent dimension 1", "latent dimension 2")
        else:
            if centroids:
                decomposed, centroids_decomposed = decompose(
                    values, centroids=centroids, method="PCA",
                    number_of_components=2,
                )
            else:
                decomposed = decompose(
                    values, method="PCA", number_of_components=2
                )
                centroids_decomposed = None
            labels = ("PC 1", "PC 2")
        saved.append(
            figures.plot_values(
                decomposed,
                colour_coding=(
                    data_set.labels
                    if data_set is not None and data_set.has_labels
                    else None
                ),
                centroids=centroids_decomposed,
                name="latent_space",
                directory=directory,
                axis_labels=labels,
            )
        )
    return saved


# --------------------------------------------------------------------------
# Result analyses (reference analyses.py:750-1607)
# --------------------------------------------------------------------------


def analyse_results(
    evaluation_set,
    reconstructed_evaluation_set,
    latent_evaluation_sets: dict | None,
    model,
    run_id: str | None = None,
    decomposition_methods: Sequence[str] | None = None,
    evaluation_subset_indices=None,
    highlight_feature_indices=None,
    best_model: bool = False,
    early_stopping: bool = False,
    included_analyses=None,
    analysis_level: str | None = None,
    export_options=None,
    analyses_directory: str | None = None,
) -> dict[str, Any]:
    """Metrics logs + pickles, reconstruction statistics, latent scatters,
    profile comparisons, heat maps."""
    if analyses_directory is None:
        analyses_directory = get_default("analyses", "directory")
    if analysis_level is None:
        analysis_level = get_default("analyses", "analysis_level")
    if decomposition_methods is None:
        decomposition_methods = [
            get_default("analyses", "decomposition_method")
        ]
    included = _resolve_included(included_analyses)

    version = "end_of_training"
    if best_model:
        version = "best_model"
    elif early_stopping:
        version = "early_stopping"
    directory = _subdirectory(
        analyses_directory,
        normalise_string(model.name),
        run_id and f"run_{run_id}" or "",
        version,
    )

    results: dict[str, Any] = {"figures": [], "directory": directory}
    number_of_epochs_trained = model.number_of_epochs_trained(run_id=run_id)

    if "metrics" in included:
        evaluation_metrics = getattr(model, "_last_evaluation_metrics", {})
        statistics = [
            metrics.summary_statistics(
                ds.values, name=ds.version, tolerance=0.5
            )
            for ds in (evaluation_set, reconstructed_evaluation_set)
            if ds is not None and ds.has_values
        ]
        clustering_metric_values = metrics.compute_clustering_metrics(
            evaluation_set
        )
        results["statistics"] = statistics
        results["clustering_metrics"] = clustering_metric_values

        now = time.time()
        metrics_name = f"{evaluation_set.kind}-metrics"
        string_parts = [
            f"Timestamp: {format_time(now)}",
            f"Number of epochs trained: {number_of_epochs_trained}",
            "\nEvaluation:",
        ]
        for key, label in (
            ("lower_bound", "ELBO"),
            ("reconstruction_error", "ENRE"),
            ("kl_divergence", "KL"),
            ("kl_divergence_z", "KL_z"),
            ("kl_divergence_y", "KL_y"),
        ):
            if key in evaluation_metrics:
                string_parts.append(
                    "    {}: {:.5g}.".format(label, evaluation_metrics[key])
                )
        accuracies = clustering_metric_values.get("accuracies", {})
        if accuracies.get("accuracy") is not None:
            string_parts.append(
                "    Accuracy: {:6.2f} %.".format(
                    100 * accuracies["accuracy"]
                )
            )
        if accuracies.get("superset_accuracy") is not None:
            string_parts.append(
                "    Accuracy (superset): {:6.2f} %.".format(
                    100 * accuracies["superset_accuracy"]
                )
            )
        string_parts.append(
            "\n" + metrics.format_summary_statistics(statistics)
        )
        metrics_string = "\n".join(string_parts) + "\n"
        with open(os.path.join(directory, metrics_name + ".log"), "w") as f:
            f.write(metrics_string)
        print(metrics_string)

        # evaluation curves in the reference pickle shape: name → list
        evaluation_eval = {
            key: [value] for key, value in evaluation_metrics.items()
        }
        metrics_dictionary = {
            "timestamp": now,
            "number of epochs trained": number_of_epochs_trained,
            "evaluation": evaluation_eval,
            "accuracy": (
                [accuracies["accuracy"]]
                if accuracies.get("accuracy") is not None
                else None
            ),
            "superset_accuracy": (
                [accuracies["superset_accuracy"]]
                if accuracies.get("superset_accuracy") is not None
                else None
            ),
            "statistics": statistics,
        }
        with gzip.open(
            os.path.join(directory, metrics_name + ".pkl.gz"), "w"
        ) as f:
            pickle.dump(metrics_dictionary, f)

        if evaluation_set.prediction_specifications:
            spec = evaluation_set.prediction_specifications
            prediction_name = "{}-prediction-{}".format(
                evaluation_set.kind, spec.name
            )
            prediction_dictionary = {
                "timestamp": now,
                "number of epochs trained": number_of_epochs_trained,
                "prediction method": spec.method,
                "number of classes": spec.number_of_clusters,
                "training set": spec.training_set_kind,
                "clustering metric values": clustering_metric_values,
            }
            with gzip.open(
                os.path.join(directory, prediction_name + ".pkl.gz"), "w"
            ) as f:
                pickle.dump(prediction_dictionary, f)
            prediction_lines = [
                f"Timestamp: {format_time(now)}",
                f"Number of epochs trained: {number_of_epochs_trained}",
                f"Prediction method: {spec.method}",
                f"Number of classes: {spec.number_of_clusters}",
                "\nClustering metrics:",
            ]
            for metric_name, metric_set in clustering_metric_values.items():
                if metric_name == "accuracies":
                    continue
                for set_name, value in metric_set.items():
                    if value is not None:
                        prediction_lines.append(
                            "    {} ({}): {:.5g}.".format(
                                capitalise_string(metric_name),
                                set_name,
                                value,
                            )
                        )
            with open(
                os.path.join(directory, prediction_name + ".log"), "w"
            ) as f:
                f.write("\n".join(prediction_lines) + "\n")

    # latent space scatters
    if (
        "latent_space" in included
        and latent_evaluation_sets
        and "z" in latent_evaluation_sets
    ):
        latent_set = latent_evaluation_sets["z"]
        values = np.asarray(latent_set.values)
        if values.shape[1] == 2:
            decomposed = values
            axis_labels = ("z1", "z2")
        else:
            decomposed = decompose(values, method="PCA", number_of_components=2)
            axis_labels = ("PC 1", "PC 2")
        for colour_values, suffix, title in (
            (
                latent_set.labels if latent_set.has_labels else None,
                "labels",
                "class",
            ),
            (
                latent_set.predicted_cluster_ids
                if latent_set.has_predicted_cluster_ids
                else None,
                "clusters",
                "cluster",
            ),
        ):
            if colour_values is not None:
                results["figures"].append(
                    figures.plot_values(
                        decomposed,
                        colour_coding=colour_values,
                        colour_coding_title=title,
                        name=f"latent_space-{suffix}",
                        directory=directory,
                        axis_labels=axis_labels,
                    )
                )
        if export_options and "latent" in export_options or (
            "latent_values" in included
        ):
            save_values(
                values,
                name=f"latent_values-{latent_set.kind}",
                row_names=latent_set.example_names,
                column_names=latent_set.feature_names,
                directory=directory,
            )

    # profile comparisons on the evaluation subset
    if (
        "profile_comparisons" in included
        and reconstructed_evaluation_set is not None
        and evaluation_subset_indices is not None
    ):
        profile_directory = _subdirectory(directory, "profile_comparisons")
        obs = evaluation_set.values
        rec = reconstructed_evaluation_set.values
        total_std = reconstructed_evaluation_set.total_standard_deviations
        explained_std = (
            reconstructed_evaluation_set.explained_standard_deviations
        )
        for i in np.asarray(evaluation_subset_indices)[:8]:
            results["figures"].append(
                figures.plot_profile_comparison(
                    obs[int(i)],
                    rec[int(i)],
                    expected_total_standard_deviations=(
                        total_std[int(i)] if total_std is not None else None
                    ),
                    expected_explained_standard_deviations=(
                        explained_std[int(i)]
                        if explained_std is not None
                        else None
                    ),
                    name="profile_comparison-{}".format(
                        normalise_string(str(evaluation_set.example_names[int(i)]))
                    ),
                    directory=profile_directory,
                )
            )

    if "heat_maps" in included and evaluation_set.has_values:
        n_plot = min(evaluation_set.number_of_examples, 500)
        results["figures"].append(
            figures.plot_heat_map(
                evaluation_set.values[:n_plot],
                labels=(
                    evaluation_set.labels[:n_plot]
                    if evaluation_set.has_labels
                    else None
                ),
                name=f"heat_map-{evaluation_set.kind}",
                directory=directory,
            )
        )

    if "latent_correlations" in included and latent_evaluation_sets:
        latent_set = latent_evaluation_sets.get("z")
        if latent_set is not None and latent_set.values.shape[1] > 1:
            corr = metrics.correlation_matrix(latent_set.values)
            results["figures"].append(
                figures.plot_heat_map(
                    corr,
                    name="latent_correlations",
                    directory=directory,
                    x_label="latent dimension",
                    y_label="latent dimension",
                    z_label="correlation",
                    center=0.0,
                )
            )

    return results
