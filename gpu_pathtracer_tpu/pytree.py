"""Tiny pytree-dataclass helper (no flax dependency in the core)."""

from __future__ import annotations

import dataclasses

import jax


def pytree_dataclass(cls=None, *, meta: tuple[str, ...] = ()):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields named in `meta` are static (hashed into the jit cache key);
    everything else is a traced leaf/subtree.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = [f.name for f in dataclasses.fields(c) if f.name not in meta]
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=list(meta)
        )
        return c

    return wrap if cls is None else wrap(cls)
