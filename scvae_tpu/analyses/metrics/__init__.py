"""Evaluation metrics: clustering quality, summary statistics, correlations.

TPU-native counterpart of ``scvae/analyses/metrics/``.
"""

from scvae_tpu.analyses.metrics.clustering import (
    CLUSTERING_METRICS,
    accuracy,
    adjusted_mutual_information,
    adjusted_rand_index,
    compute_clustering_metrics,
    silhouette_score,
)
from scvae_tpu.analyses.metrics.correlations import (
    correlation_matrix,
    most_correlated_feature_pairs,
)
from scvae_tpu.analyses.metrics.summary import (
    format_summary_statistics,
    summary_statistics,
)

__all__ = [
    "CLUSTERING_METRICS",
    "accuracy",
    "adjusted_mutual_information",
    "adjusted_rand_index",
    "compute_clustering_metrics",
    "correlation_matrix",
    "format_summary_statistics",
    "most_correlated_feature_pairs",
    "silhouette_score",
    "summary_statistics",
]
