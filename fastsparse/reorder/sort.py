"""On-device co-sorting of sparse-matrix entries.

TPU-native replacement for the reference's host quicksort on Hilbert keys
(SURVEY.md §2 R2; BASELINE.json:5 "Hilbert sort → on-device radix/sort
primitives"): `jax.lax.sort` with ``num_keys`` performs a lexicographic
key sort co-sorting the payload arrays, compiled by XLA to its on-device
sort network. 64-bit orderings are expressed as (hi, lo) uint32 key pairs
so x64 mode is never required.

Padding entries (``k >= n_valid``) always sort to the tail: every ordering
prepends a validity key so live entries stay a contiguous prefix.
"""
from __future__ import annotations

from functools import partial
from typing import Sequence

import jax
import jax.numpy as jnp

from ..formats.coo import COO, BinaryCOO
from .hilbert import hilbert_key64
from .morton import morton_key64

__all__ = ["cosort", "sort_coo", "ORDERINGS"]


def cosort(keys: Sequence[jax.Array], payloads: Sequence[jax.Array]):
    """Stable lexicographic sort by ``keys``; returns co-sorted ``payloads``."""
    keys = list(keys)
    operands = keys + list(payloads)
    out = jax.lax.sort(operands, num_keys=len(keys), is_stable=True)
    return tuple(out[len(keys):])


def _keys_for(order: str, rows, cols, shape):
    if order == "hilbert":
        return list(hilbert_key64(rows, cols))
    if order == "morton":
        return list(morton_key64(rows, cols))
    if order == "row":  # row-major: the order CSR conversion wants
        return [rows.astype(jnp.uint32), cols.astype(jnp.uint32)]
    if order == "col":  # column-major: used when building transpose tilings
        return [cols.astype(jnp.uint32), rows.astype(jnp.uint32)]
    raise ValueError(f"unknown ordering {order!r}")


ORDERINGS = ("hilbert", "morton", "row", "col")


@partial(jax.jit, static_argnames=("order",))
def sort_coo(coo, order: str = "hilbert"):
    """Return ``coo`` with entries reordered on device.

    The analog of the reference's ``sort_sbm`` (SURVEY.md §3.1) — but where
    the C library sorted for cache locality, the TPU build sorts for *tile
    density*: clustered nonzeros fill (TM × TK) tiles, cutting padding bytes
    in the bucketed formats (SURVEY.md §7.1).
    """
    invalid = (~coo.valid_mask()).astype(jnp.uint32)
    keys = [invalid] + _keys_for(order, coo.rows, coo.cols, coo.shape)
    if isinstance(coo, BinaryCOO):
        rows, cols = cosort(keys, (coo.rows, coo.cols))
        return BinaryCOO(rows=rows, cols=cols, shape=coo.shape, n_valid=coo.n_valid)
    rows, cols, vals = cosort(keys, (coo.rows, coo.cols, coo.vals))
    return COO(
        rows=rows, cols=cols, vals=vals, shape=coo.shape, n_valid=coo.n_valid
    )
