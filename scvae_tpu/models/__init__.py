"""Model layer: VAE and GMVAE as pure-functional JAX models plus the
high-level training/evaluation API classes.

TPU-native counterpart of ``scvae/models/``.
"""

from scvae_tpu.models.api import VariationalAutoencoder
from scvae_tpu.models.gmvae import GMVAEConfig
from scvae_tpu.models.gmvae_api import GaussianMixtureVariationalAutoencoder
from scvae_tpu.models.objectives import EarlyStopping, log_reduce_exp, warm_up_weight
from scvae_tpu.models.step import (
    TrainState,
    create_train_state,
    make_eval_step,
    make_optimizer,
    make_train_step,
    tree_finite,
)
from scvae_tpu.models.vae import VAEConfig

__all__ = [
    "EarlyStopping",
    "GMVAEConfig",
    "GaussianMixtureVariationalAutoencoder",
    "VariationalAutoencoder",
    "TrainState",
    "VAEConfig",
    "create_train_state",
    "log_reduce_exp",
    "make_eval_step",
    "make_optimizer",
    "make_train_step",
    "tree_finite",
    "warm_up_weight",
]
