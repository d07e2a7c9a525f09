"""Analyses layer: metrics, prediction, decomposition, figures, and
cross-analysis.

TPU-native counterpart of ``scvae/analyses/``.
"""

from scvae_tpu.analyses.prediction import (
    PREDICTION_METHODS,
    PredictionSpecifications,
    map_cluster_ids_to_label_ids,
    predict_labels,
)

__all__ = [
    "PREDICTION_METHODS",
    "PredictionSpecifications",
    "map_cluster_ids_to_label_ids",
    "predict_labels",
]
