"""Data engine: loaders, preprocessing, splitting, caching, and the
``DataSet`` container.

TPU-native counterpart of ``scvae/data/``.
"""

from scvae_tpu.data.dataset import DataSet
from scvae_tpu.data.loaders import LOADERS, create_development_data_set
from scvae_tpu.data.sparse import SparseRowMatrix, sparsity
from scvae_tpu.data.utilities import (
    build_directory_path,
    indices_for_evaluation_subset,
    save_values,
)

__all__ = [
    "DataSet",
    "LOADERS",
    "SparseRowMatrix",
    "build_directory_path",
    "create_development_data_set",
    "indices_for_evaluation_subset",
    "save_values",
    "sparsity",
]
