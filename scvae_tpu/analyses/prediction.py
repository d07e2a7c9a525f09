"""Label prediction: clustering methods and majority-vote cluster→label
mapping.

Counterpart of ``scvae/analyses/prediction.py`` (k-means with a mini-batch
fallback above 10k cells, model-based GMVAE clusters, the
``PredictionSpecifications`` naming, and the cluster→label majority vote).
"""

from __future__ import annotations

from typing import Callable

import numpy as np
import scipy.sparse
import scipy.stats

from scvae_tpu.defaults import get_default
from scvae_tpu.utils.strings import normalise_string, proper_string

PREDICTION_METHODS: dict[str, dict] = {}

MAXIMUM_SAMPLE_SIZE_FOR_NORMAL_KMEANS = 10000


def _register_prediction_method(name: str):
    def decorator(function: Callable):
        aliases = {normalise_string(name)}
        aliases.add(normalise_string(name).replace("_", ""))
        PREDICTION_METHODS[name] = {"aliases": aliases, "function": function}
        return function

    return decorator


def map_cluster_ids_to_label_ids(
    label_ids: np.ndarray,
    cluster_ids: np.ndarray,
    excluded_class_ids=(),
) -> np.ndarray:
    """Majority-vote label per cluster, ignoring excluded classes
    (reference ``prediction.py:134-146``)."""
    predicted = np.zeros_like(cluster_ids)
    for unique_cluster_id in np.unique(cluster_ids):
        indices = cluster_ids == unique_cluster_id
        index_labels = label_ids[indices]
        for excluded in excluded_class_ids:
            index_labels = index_labels[index_labels != excluded]
        if len(index_labels) == 0:
            continue
        predicted[indices] = scipy.stats.mode(index_labels, keepdims=False)[0]
    return predicted


class PredictionSpecifications:
    """Prediction-method spec with a normalised name for artifact paths
    (reference ``prediction.py:149-183``)."""

    def __init__(self, method, number_of_clusters=None, training_set_kind=None):
        names = {
            name: spec["aliases"] for name, spec in PREDICTION_METHODS.items()
        }
        method = proper_string(method, names)
        if method not in PREDICTION_METHODS:
            raise ValueError(f"Prediction method `{method}` not found.")
        if number_of_clusters is None:
            raise TypeError("Number of clusters not set.")
        self.method = method
        self.number_of_clusters = number_of_clusters
        self.training_set_kind = (
            normalise_string(training_set_kind) if training_set_kind else None
        )

    @property
    def name(self) -> str:
        parts = [self.method, self.number_of_clusters]
        if self.training_set_kind and self.training_set_kind != "training":
            parts.append(self.training_set_kind)
        return "_".join(
            normalise_string(str(p)).replace("_", "") for p in parts
        )


@_register_prediction_method("k-means")
def _predict_using_kmeans(training_set, evaluation_set, number_of_clusters):
    from sklearn.cluster import KMeans, MiniBatchKMeans

    if (
        training_set.number_of_examples
        <= MAXIMUM_SAMPLE_SIZE_FOR_NORMAL_KMEANS
    ):
        model = KMeans(n_clusters=number_of_clusters, n_init=10)
    else:
        model = MiniBatchKMeans(
            n_clusters=number_of_clusters, batch_size=100, n_init=3
        )

    def dense(values):
        if scipy.sparse.issparse(values):
            return np.asarray(values.todense())
        return np.asarray(values)

    model.fit(dense(training_set.values))
    cluster_ids = model.predict(dense(evaluation_set.values))
    return cluster_ids, None, None


@_register_prediction_method("model")
def _predict_using_model(training_set, evaluation_set, number_of_clusters):
    return (
        evaluation_set.predicted_cluster_ids,
        evaluation_set.predicted_labels,
        evaluation_set.predicted_superset_labels,
    )


def predict_labels(
    training_set,
    evaluation_set,
    specifications: PredictionSpecifications | None = None,
    method: str | None = None,
    number_of_clusters: int | None = None,
):
    """Cluster the evaluation set and majority-vote labels
    (reference ``prediction.py:33-131``)."""
    if specifications is None:
        if method is None:
            method = get_default("evaluation", "prediction_method") or "k-means"
        specifications = PredictionSpecifications(
            method=method,
            number_of_clusters=number_of_clusters,
            training_set_kind=training_set.kind,
        )

    predict = PREDICTION_METHODS[specifications.method]["function"]
    cluster_ids, predicted_labels, predicted_superset_labels = predict(
        training_set=training_set,
        evaluation_set=evaluation_set,
        number_of_clusters=specifications.number_of_clusters,
    )

    if cluster_ids is not None:
        if predicted_labels is None and evaluation_set.has_labels:
            to_id = evaluation_set.class_name_to_class_id
            to_name = evaluation_set.class_id_to_class_name
            label_ids = np.array(
                [to_id[name] for name in evaluation_set.labels]
            )
            excluded_ids = [
                to_id[name]
                for name in (evaluation_set.excluded_classes or [])
                if name in to_id
            ]
            predicted_label_ids = map_cluster_ids_to_label_ids(
                label_ids, np.asarray(cluster_ids), excluded_ids
            )
            predicted_labels = np.array(
                [to_name[i] for i in predicted_label_ids]
            )
        if (
            predicted_superset_labels is None
            and evaluation_set.has_superset_labels
        ):
            to_id = evaluation_set.superset_class_name_to_superset_class_id
            to_name = evaluation_set.superset_class_id_to_superset_class_name
            label_ids = np.array(
                [to_id[name] for name in evaluation_set.superset_labels]
            )
            excluded_ids = [
                to_id[name]
                for name in (evaluation_set.excluded_superset_classes or [])
                if name in to_id
            ]
            predicted_ids = map_cluster_ids_to_label_ids(
                label_ids, np.asarray(cluster_ids), excluded_ids
            )
            predicted_superset_labels = np.array(
                [to_name[i] for i in predicted_ids]
            )

    return cluster_ids, predicted_labels, predicted_superset_labels
