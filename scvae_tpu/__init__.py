"""scvae_tpu — TPU-native single-cell generative-modelling engine.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of scVAE
(reference: /root/reference, Grønbech et al. 2020): variational
auto-encoders (VAE) and Gaussian-mixture VAEs (GMVAE) over sparse
single-cell transcript-count matrices, with a full count-likelihood
library, KL warm-up, importance-weighted ELBO, early stopping,
checkpointing, dataset acquisition/caching, and an analysis suite.

Unlike the reference's TF1 graph/session architecture, everything here is
pure-functional JAX: one jit/pjit-compiled ``train_step`` over an explicit
device mesh, Pallas TPU kernels for the fused decoder-head + likelihood hot
loop, and a host-side sparse input pipeline.
"""

__version__ = "0.1.0"

from scvae_tpu import defaults as defaults  # noqa: F401

__all__ = ["defaults", "__version__"]
