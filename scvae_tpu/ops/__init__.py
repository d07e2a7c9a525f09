"""Pallas TPU kernels for the compute hot path."""

from scvae_tpu.ops.fused_likelihood import (
    FUSED_LIKELIHOODS,
    fused_log_likelihood,
    reference_log_likelihood,
    supports_fused_likelihood,
)
from scvae_tpu.ops.special import digamma, lgamma

__all__ = [
    "FUSED_LIKELIHOODS",
    "digamma",
    "fused_log_likelihood",
    "lgamma",
    "reference_log_likelihood",
    "supports_fused_likelihood",
]
