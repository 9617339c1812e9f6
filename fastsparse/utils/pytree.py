"""Pytree-dataclass helper.

All sparse-format containers in fastsparse are frozen dataclasses registered
as JAX pytrees: array fields are leaves (traced / sharded / donated like any
`jax.Array`), while structural metadata (shapes, bucket widths, dtypes) is
static so `jax.jit` specializes on it — the TPU analog of the reference
library's plain C structs (SURVEY.md §1.3: "malloc'd C structs → sharded
jax.Arrays; formats as pytree dataclasses").
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax


def static_field(**kwargs: Any) -> dataclasses.Field:
    """A dataclass field treated as static pytree metadata (hashed by jit)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata["static"] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls=None, /, **kwargs):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with :func:`static_field` become static metadata; all
    other fields are pytree leaves.
    """

    def wrap(c):
        c = dataclasses.dataclass(frozen=True, **kwargs)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get("static", False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        return jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )

    if cls is None:
        return wrap
    return wrap(cls)
