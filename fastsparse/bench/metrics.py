"""Structured format/kernel metrics (SURVEY.md §5.5).

Padding overhead is the key new metric the C library never needed: the
bucketed formats trade padded slots for static shapes, and every padded
slot is HBM bytes. `format_stats` reports, per execution format:

* ``nnz``             — real nonzeros
* ``padding_ratio``   — padded slots / real slots (>= 1)
* ``occupancy``       — how full the real tiles are (BSR only)
* ``a_bytes``         — HBM bytes the format's operand arrays occupy
* ``a_bytes_per_nnz`` — amortized A-side traffic per nonzero
* ``programs``        — compiled-program count (buckets — BASELINE.json:5)
"""
from __future__ import annotations

from typing import Any, Dict

import jax

from ..formats.bsr import BsrMatrix
from ..formats.coo import BinaryCOO, COO
from ..formats.csr import CSR, BinaryCSR
from ..formats.ell import EllMatrix

__all__ = ["format_stats", "tree_nbytes"]


def tree_nbytes(tree) -> int:
    """Total bytes of every array leaf in a pytree."""
    return sum(
        leaf.size * leaf.dtype.itemsize
        for leaf in jax.tree.leaves(tree)
        if hasattr(leaf, "dtype")
    )


def active_nbytes(
    A, n_rhs: int = 128, x_dtype=None, precision: str = "highest"
) -> int:
    """Bytes a single ``A @ X`` product actually moves from the stored
    format — the honest numerator for format-bound models when a matrix
    carries MORE than one execution layout (a BsrMatrix with the narrow
    halo engine stores both; each product reads exactly one of them).
    Uses the REAL dispatch predicate (`ops.bsr_ops.halo_nq`) so the
    metric tracks the engine a product with these parameters actually
    runs on (ADVICE r4: an ``n_rhs <= 8`` guess here disagreed with the
    dispatch for N in 9..40 and for non-parity narrow products).
    """
    import dataclasses as _dc

    import jax.numpy as jnp

    if x_dtype is None:
        x_dtype = jnp.float32
    if isinstance(A, BsrMatrix):
        narrow = getattr(A, "narrow", None)
        if narrow is not None:
            from ..ops.bsr_ops import halo_nq

            if halo_nq(A, n_rhs, x_dtype, precision):
                return tree_nbytes(narrow)
            return tree_nbytes(_dc.replace(A, narrow=None))
    return tree_nbytes(A)


def format_stats(A) -> Dict[str, Any]:
    nbytes = tree_nbytes(A)
    if isinstance(A, BsrMatrix):
        kind = "bsr-binary" if A.binary else "bsr"
        if A.is_mono:
            kind += "-mono"
        return {
            "format": kind,
            "nnz": A.nnz,
            "padding_ratio": A.padding_ratio,
            "occupancy": A.tile_occupancy,
            "tiles": A.n_tiles,
            "padded_tiles": A.padded_tiles,
            "a_bytes": nbytes,
            "a_bytes_per_nnz": nbytes / max(A.nnz, 1),
            "programs": len(A.buckets),
        }
    if isinstance(A, EllMatrix):
        return {
            "format": "ell",
            "nnz": A.nnz,
            "padding_ratio": A.padding_ratio,
            "a_bytes": nbytes,
            "a_bytes_per_nnz": nbytes / max(A.nnz, 1),
            "programs": len(A.buckets),
        }
    if isinstance(A, (COO, BinaryCOO, CSR, BinaryCSR)):
        return {
            "format": type(A).__name__.lower(),
            "nnz": A.nnz,
            "padding_ratio": A.nnz_cap / max(A.nnz, 1),
            "a_bytes": nbytes,
            "a_bytes_per_nnz": nbytes / max(A.nnz, 1),
            "programs": 1,
        }
    raise TypeError(f"unsupported format {type(A).__name__}")
