"""Clustering metrics: ARI, AMI, accuracy (supervised); silhouette
(unsupervised, sampled above 20k cells).

Counterpart of ``scvae/analyses/metrics/clustering.py`` with the same
metric registry, class-exclusion semantics, and silhouette sampling cap.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse

CLUSTERING_METRICS: dict[str, dict] = {}

MAXIMUM_NUMBER_OF_EXAMPLES_BEFORE_SAMPLING_SILHOUETTE_SCORE = 20_000


def _register_clustering_metric(name: str, kind: str):
    def decorator(function):
        CLUSTERING_METRICS[name] = {"kind": kind, "function": function}
        return function

    return decorator


def _exclude_classes_from_label_set(*label_sets, excluded_classes=None):
    if excluded_classes is None:
        excluded_classes = []
    labels = np.asarray(label_sets[0])
    others = [np.asarray(s) for s in label_sets[1:]]
    for excluded in excluded_classes:
        included = labels != excluded
        labels = labels[included]
        others = [s[included] for s in others]
    if others:
        return [labels] + others
    return labels


@_register_clustering_metric(name="adjusted Rand index", kind="supervised")
def adjusted_rand_index(labels, predicted_labels, excluded_classes=None):
    import sklearn.metrics.cluster

    labels, predicted_labels = _exclude_classes_from_label_set(
        labels, predicted_labels, excluded_classes=excluded_classes
    )
    return sklearn.metrics.cluster.adjusted_rand_score(
        labels, predicted_labels
    )


@_register_clustering_metric(
    name="adjusted mutual information", kind="supervised"
)
def adjusted_mutual_information(labels, predicted_labels, excluded_classes=None):
    import sklearn.metrics.cluster

    labels, predicted_labels = _exclude_classes_from_label_set(
        labels, predicted_labels, excluded_classes=excluded_classes
    )
    return sklearn.metrics.cluster.adjusted_mutual_info_score(
        labels, predicted_labels, average_method="arithmetic"
    )


@_register_clustering_metric(name="silhouette score", kind="unsupervised")
def silhouette_score(values, predicted_labels):
    import sklearn.metrics

    predicted_labels = np.asarray(predicted_labels)
    n_classes = np.unique(predicted_labels).shape[0]
    n_examples = values.shape[0]
    if n_classes < 2 or n_classes > n_examples - 1:
        return np.nan
    sample_size = None
    if n_examples > MAXIMUM_NUMBER_OF_EXAMPLES_BEFORE_SAMPLING_SILHOUETTE_SCORE:
        sample_size = MAXIMUM_NUMBER_OF_EXAMPLES_BEFORE_SAMPLING_SILHOUETTE_SCORE
    if scipy.sparse.issparse(values):
        values = np.asarray(values.todense())
    return sklearn.metrics.silhouette_score(
        X=values, labels=predicted_labels, sample_size=sample_size
    )


def accuracy(labels, predicted_labels, excluded_classes=None):
    labels, predicted_labels = _exclude_classes_from_label_set(
        labels, predicted_labels, excluded_classes=excluded_classes
    )
    return float(np.mean(predicted_labels == labels))


def compute_clustering_metrics(evaluation_set) -> dict[str, dict]:
    """Evaluate every registered metric over clusters/labels/supersets
    (reference ``clustering.py:27-89``), plus accuracies."""
    values = {
        metric: {
            "clusters": None,
            "clusters; superset": None,
            "labels": None,
            "labels; superset": None,
        }
        for metric in CLUSTERING_METRICS
    }

    for metric_name, attributes in CLUSTERING_METRICS.items():
        metric_values = values[metric_name]
        function = attributes["function"]
        if attributes["kind"] == "supervised":
            if evaluation_set.has_labels:
                if evaluation_set.has_predicted_cluster_ids:
                    metric_values["clusters"] = function(
                        evaluation_set.labels,
                        evaluation_set.predicted_cluster_ids,
                        evaluation_set.excluded_classes,
                    )
                if evaluation_set.has_predicted_labels:
                    metric_values["labels"] = function(
                        evaluation_set.labels,
                        evaluation_set.predicted_labels,
                        evaluation_set.excluded_classes,
                    )
            if evaluation_set.has_superset_labels:
                if evaluation_set.has_predicted_cluster_ids:
                    metric_values["clusters; superset"] = function(
                        evaluation_set.superset_labels,
                        evaluation_set.predicted_cluster_ids,
                        evaluation_set.excluded_superset_classes,
                    )
                if evaluation_set.has_predicted_superset_labels:
                    metric_values["labels; superset"] = function(
                        evaluation_set.superset_labels,
                        evaluation_set.predicted_superset_labels,
                        evaluation_set.excluded_superset_classes,
                    )
        else:  # unsupervised
            if evaluation_set.has_predicted_cluster_ids:
                metric_values["clusters"] = function(
                    evaluation_set.values,
                    evaluation_set.predicted_cluster_ids,
                )
            if evaluation_set.has_predicted_labels:
                metric_values["labels"] = function(
                    evaluation_set.values, evaluation_set.predicted_labels
                )
            if evaluation_set.has_predicted_superset_labels:
                metric_values["labels; superset"] = function(
                    evaluation_set.values,
                    evaluation_set.predicted_superset_labels,
                )

    # accuracies (tracked separately by the reference's GMVAE loop)
    accuracies = {"accuracy": None, "superset_accuracy": None}
    if evaluation_set.has_labels and evaluation_set.has_predicted_labels:
        accuracies["accuracy"] = accuracy(
            evaluation_set.labels,
            evaluation_set.predicted_labels,
            evaluation_set.excluded_classes,
        )
    if (
        evaluation_set.has_superset_labels
        and evaluation_set.has_predicted_superset_labels
    ):
        accuracies["superset_accuracy"] = accuracy(
            evaluation_set.superset_labels,
            evaluation_set.predicted_superset_labels,
            evaluation_set.excluded_superset_classes,
        )
    values["accuracies"] = accuracies
    return values
