"""Pallas TPU kernels for the compute hot path."""

from scvae_tpu.ops.fused_likelihood import (
    CATEGORISED_BASES,
    FUSED_LIKELIHOODS,
    fused_categorised_log_likelihood,
    fused_grouped_log_likelihood,
    fused_log_likelihood,
    reference_categorised_log_likelihood,
    reference_log_likelihood,
    supports_fused_likelihood,
    supports_grouped_likelihood,
)
from scvae_tpu.ops.runtime import (
    force_pallas,
    pallas_enabled,
    reference_gather_enabled,
    use_reference_gather,
)
from scvae_tpu.ops.sharded import (
    sharded_fused_categorised_log_likelihood,
    sharded_fused_log_likelihood,
)
from scvae_tpu.ops.special import digamma, lgamma

__all__ = [
    "CATEGORISED_BASES",
    "FUSED_LIKELIHOODS",
    "digamma",
    "force_pallas",
    "fused_categorised_log_likelihood",
    "fused_grouped_log_likelihood",
    "fused_log_likelihood",
    "lgamma",
    "pallas_enabled",
    "reference_gather_enabled",
    "use_reference_gather",
    "reference_categorised_log_likelihood",
    "reference_log_likelihood",
    "sharded_fused_categorised_log_likelihood",
    "sharded_fused_log_likelihood",
    "supports_fused_likelihood",
    "supports_grouped_likelihood",
]
