"""Minimal pytree-dataclass helper.

Distributions and model states are frozen dataclasses whose array fields are
pytree leaves, so they can flow through ``jit`` / ``vmap`` / ``grad``
boundaries.  Fields marked with ``static_field()`` become auxiliary (hashed)
data instead of leaves.
"""

from __future__ import annotations

import dataclasses
from typing import Any, TypeVar

import jax

T = TypeVar("T")


def static_field(**kwargs: Any) -> Any:
    """A dataclass field treated as static (non-traced) pytree aux data."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type[T]) -> type[T]:
    """Decorator: freeze the dataclass and register it as a JAX pytree."""
    cls = dataclasses.dataclass(frozen=True)(cls)

    data_names = [
        f.name for f in dataclasses.fields(cls) if not f.metadata.get("static")
    ]
    static_names = [
        f.name for f in dataclasses.fields(cls) if f.metadata.get("static")
    ]

    def flatten(obj):
        children = tuple(getattr(obj, n) for n in data_names)
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def flatten_with_keys(obj):
        children = tuple(
            (jax.tree_util.GetAttrKey(n), getattr(obj, n)) for n in data_names
        )
        aux = tuple(getattr(obj, n) for n in static_names)
        return children, aux

    def unflatten(aux, children):
        kwargs = dict(zip(data_names, children))
        kwargs.update(dict(zip(static_names, aux)))
        return cls(**kwargs)

    jax.tree_util.register_pytree_with_keys(
        cls, flatten_with_keys, unflatten, flatten_func=flatten
    )
    return cls


def replace(obj: T, **changes: Any) -> T:
    return dataclasses.replace(obj, **changes)
