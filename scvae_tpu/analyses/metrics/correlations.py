"""Correlation matrix + most-correlated feature pairs.

Counterpart of ``scvae/analyses/metrics/correlations.py``.
"""

from __future__ import annotations

import numpy as np
import scipy.sparse


def correlation_matrix(data_matrix, axis=None) -> np.ndarray:
    if scipy.sparse.issparse(data_matrix):
        data_matrix = np.asarray(data_matrix.todense())
    data_matrix = np.asarray(data_matrix)
    if axis in (1, "features", "columns"):
        data_matrix = data_matrix.T
    import sklearn.metrics

    return 1 - sklearn.metrics.pairwise_distances(
        data_matrix, metric="correlation"
    )


def most_correlated_feature_pairs(
    correlations: np.ndarray, n_limit: int | None = None
) -> list[tuple[int, int]]:
    """Upper-triangle pairs sorted by |correlation| ascending; returns the
    ``n_limit`` largest (reference ``correlations.py:20-60``)."""
    n_features = correlations.shape[0]
    n_pairs = n_features * (n_features - 1) // 2
    masked = np.ma.masked_array(
        np.absolute(correlations), mask=np.tri(n_features)
    )
    order = np.unravel_index(
        masked.argsort(axis=None, endwith=False), correlations.shape
    )
    pairs = [tuple(p) for p in np.array(order).T]
    if n_limit is None:
        n_limit = n_pairs
    else:
        n_limit = min(n_limit, n_pairs)
    return pairs[-n_limit:]
