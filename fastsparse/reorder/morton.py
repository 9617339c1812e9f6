"""Morton (Z-order) keys, computed vectorized on device.

TPU-native replacement for the reference's host-side Hilbert index math
(SURVEY.md §2 R1): instead of a scalar per-entry ``xy2d`` call feeding a
host quicksort, keys for every nonzero are computed in one vectorized pass
of shift/mask ops and sorted with `jax.lax.sort` (see `reorder.sort`).

Keys are returned as a (hi, lo) pair of uint32 words — a 64-bit Morton code
split in two so the library never relies on x64 mode (TPU default is 32-bit).
Purpose on TPU is tile density rather than cache locality: clustering
nonzeros into fewer, fuller (TM × TK) tiles reduces padding bytes
(SURVEY.md §7.1).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["part1by1", "morton_key", "morton_key64"]


def part1by1(v: jax.Array) -> jax.Array:
    """Spread the low 16 bits of ``v`` (uint32) into even bit positions."""
    v = v.astype(jnp.uint32) & jnp.uint32(0x0000FFFF)
    v = (v | (v << 8)) & jnp.uint32(0x00FF00FF)
    v = (v | (v << 4)) & jnp.uint32(0x0F0F0F0F)
    v = (v | (v << 2)) & jnp.uint32(0x33333333)
    v = (v | (v << 1)) & jnp.uint32(0x55555555)
    return v


def morton_key(rows: jax.Array, cols: jax.Array) -> jax.Array:
    """32-bit Morton key from the low 16 bits of each coordinate.

    Sufficient alone for matrices up to 65536 on a side; larger matrices use
    :func:`morton_key64`.
    """
    r = jnp.asarray(rows).astype(jnp.uint32)
    c = jnp.asarray(cols).astype(jnp.uint32)
    return (part1by1(r) << 1) | part1by1(c)


def morton_key64(rows: jax.Array, cols: jax.Array):
    """64-bit Morton key as a ``(hi, lo)`` uint32 pair.

    ``hi`` interleaves bits 16..31 of (row, col); ``lo`` interleaves bits
    0..15. Sorting lexicographically by (hi, lo) is a full 64-bit Z-order
    sort for matrices up to 2^32 on a side.
    """
    r = jnp.asarray(rows).astype(jnp.uint32)
    c = jnp.asarray(cols).astype(jnp.uint32)
    lo = (part1by1(r) << 1) | part1by1(c)
    hi = (part1by1(r >> 16) << 1) | part1by1(c >> 16)
    return hi, lo
