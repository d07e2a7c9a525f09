"""Device mesh construction and sharding rules.

The mesh has two logical axes:

* ``data`` — cells (examples).  Every batch array is sharded on its
  leading axis; gradient reduction and batch-norm statistics become psums
  over ICI inserted automatically by GSPMD.
* ``model`` — genes (features), optional.  The widest parameters — the
  per-gene reconstruction-head kernels ``(H, F)`` and the categorised
  logits head ``(H, F·(K+1))`` — are sharded column-wise, so each chip
  holds and computes only its slice of the gene axis (SURVEY.md §5.7: the
  reference's scaling axes are cells and genes; there is no sequence axis,
  so DP+TP is the complete parallelism story for this model family, with
  PP/SP/EP structurally inapplicable).

Everything else (encoder/decoder trunks, latent heads, optimizer state)
is replicated.  Multi-host: ``jax.distributed.initialize`` +
per-process data feeding via the host pipeline.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    devices=None,
    n_devices: int | None = None,
    model_parallelism: int = 1,
) -> Mesh:
    """Build a ``(data, model)`` mesh from the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    n = len(devices)
    if n % model_parallelism != 0:
        raise ValueError(
            f"{n} devices not divisible by model parallelism "
            f"{model_parallelism}"
        )
    grid = np.asarray(devices).reshape(n // model_parallelism, model_parallelism)
    return Mesh(grid, axis_names=("data", "model"))


def distributed_initialize(**kwargs: Any) -> None:
    """Multi-host bring-up (``jax.distributed.initialize``); no-op if the
    process is already initialised."""
    try:
        jax.distributed.initialize(**kwargs)
    except RuntimeError:
        pass  # already initialised


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def resolve_mesh(
    mesh: Mesh | None = None,
    devices=None,
    number_of_devices: int | None = None,
    model_parallelism: int | None = None,
) -> Mesh | None:
    """Resolve the user-facing parallelism arguments to a mesh (or None).

    ``mesh`` wins if given; otherwise a mesh is built when any of
    ``devices`` / ``number_of_devices`` / ``model_parallelism`` asks for
    one.  This is the single entry point the model API and CLI share.
    """
    if mesh is not None:
        return mesh
    if devices is None and number_of_devices is None and (
        model_parallelism is None or model_parallelism == 1
    ):
        return None
    return create_mesh(
        devices=devices,
        n_devices=number_of_devices,
        model_parallelism=model_parallelism or 1,
    )


def replicate_to_mesh(tree: Any, mesh: Mesh) -> Any:
    """Place every leaf replicated over the mesh (host → all chips)."""
    return jax.device_put(tree, replicated(mesh))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading (cell) axis over the data axis, replicated over model."""
    return NamedSharding(mesh, P("data"))


def _is_gene_axis_param(path_str: str) -> bool:
    return "reconstruction" in path_str or "categorised_logits" in path_str


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """Sharding pytree for a parameter pytree.

    Reconstruction-head kernels/biases are sharded on their trailing
    (gene) axis over ``model``; everything else is replicated.
    """
    use_model_axis = mesh.shape["model"] > 1

    def rule(path, leaf):
        path_str = jax.tree_util.keystr(path)
        if use_model_axis and _is_gene_axis_param(path_str):
            ndim = np.ndim(leaf)
            if ndim >= 1 and leaf.shape[-1] % mesh.shape["model"] == 0:
                spec = [None] * (ndim - 1) + ["model"]
                return NamedSharding(mesh, P(*spec))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map_with_path(rule, params)


def shard_train_state(train_state: Any, mesh: Mesh) -> Any:
    """Place a TrainState on the mesh: params (and matching optimizer
    moments) per the param rules, everything else replicated."""
    from scvae_tpu.models.step import TrainState

    p_shardings = param_shardings(train_state.params, mesh)

    def place_like_params(tree):
        # optax states mirror the param tree structure inside their fields;
        # map where structures match, otherwise replicate.
        try:
            return jax.tree_util.tree_map(
                lambda leaf, s: jax.device_put(leaf, s), tree, p_shardings
            )
        except ValueError:
            return jax.device_put(tree, replicated(mesh))

    def place_opt_state(opt_state):
        placed = []
        for element in opt_state:
            if hasattr(element, "mu") and hasattr(element, "nu"):
                placed.append(
                    element._replace(
                        mu=place_like_params(element.mu),
                        nu=place_like_params(element.nu),
                    )
                )
            else:
                placed.append(jax.device_put(element, replicated(mesh)))
        return tuple(placed)

    return TrainState(
        params=place_like_params(train_state.params),
        model_state=jax.device_put(train_state.model_state, replicated(mesh)),
        opt_state=place_opt_state(train_state.opt_state),
        step=jax.device_put(train_state.step, replicated(mesh)),
    )


def shard_batch(batch: dict[str, Any], mesh: Mesh) -> dict[str, Any]:
    sharding = batch_sharding(mesh)
    return {k: jax.device_put(v, sharding) for k, v in batch.items()}
