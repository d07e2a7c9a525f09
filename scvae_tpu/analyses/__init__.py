"""Analyses layer: metrics, prediction, decomposition, figures, and
cross-analysis.

TPU-native counterpart of ``scvae/analyses/``.
"""

from scvae_tpu.analyses.analyses import (
    ANALYSIS_GROUPS,
    analyse_data,
    analyse_intermediate_results,
    analyse_model,
    analyse_results,
)
from scvae_tpu.analyses.cross_analysis import cross_analyse
from scvae_tpu.analyses.decomposition import decompose
from scvae_tpu.analyses.prediction import (
    PREDICTION_METHODS,
    PredictionSpecifications,
    map_cluster_ids_to_label_ids,
    predict_labels,
)

__all__ = [
    "ANALYSIS_GROUPS",
    "PREDICTION_METHODS",
    "PredictionSpecifications",
    "analyse_data",
    "analyse_intermediate_results",
    "analyse_model",
    "analyse_results",
    "cross_analyse",
    "decompose",
    "map_cluster_ids_to_label_ids",
    "predict_labels",
]
