"""Distribution layer: device meshes, sharding rules, and multi-host init.

Greenfield relative to the reference (single ``tf.Session``, no
multi-device support anywhere — SURVEY.md §2.9): cells are data-parallel
across chips, the widest layers (reconstruction heads over the gene axis)
can be tensor-sharded on a ``model`` axis, and gradients/metrics reduce
over ICI via XLA collectives inserted by GSPMD.
"""

from scvae_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    distributed_initialize,
    param_shardings,
    replicate_to_mesh,
    replicated,
    resolve_mesh,
    shard_batch,
    shard_train_state,
)

__all__ = [
    "batch_sharding",
    "create_mesh",
    "distributed_initialize",
    "param_shardings",
    "replicate_to_mesh",
    "replicated",
    "resolve_mesh",
    "shard_batch",
    "shard_train_state",
]
