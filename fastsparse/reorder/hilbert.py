"""Hilbert-curve keys, computed vectorized on device.

TPU-native re-design of the reference's Hilbert index math (SURVEY.md §2 R1:
classic ``xy2d``/``d2xy`` with quadrant rotation, ~60 LoC of scalar C).
Here the quadrant-rotation recurrence runs as a *vectorized* bit-sweep over
whole index arrays — a statically unrolled loop of shift/mask/select ops the
VPU chews through — instead of one scalar call per nonzero.

``hilbert_key`` produces a 32-bit key (matrices ≤ 2^16 per side);
``hilbert_key64`` produces a (hi, lo) uint32 pair (≤ 2^32 per side) so the
library never needs x64 mode. ``hilbert_d2xy`` is the inverse, kept for
parity with the reference's ``d2xy`` and used in round-trip tests.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

__all__ = ["hilbert_key", "hilbert_key64", "hilbert_d2xy"]

_ONE = jnp.uint32(1)


def _hilbert_bits(rows, cols, order: int):
    """Yield the 2-bit Hilbert quadrant digits, most significant first.

    Internal helper implementing the top-down quadrant-rotation sweep: at bit
    level ``i`` the quadrant is ``(3*rx) XOR ry``; the lower ``i`` bits of
    (x, y) are then rotated/reflected into that quadrant's frame.
    """
    x = jnp.asarray(cols).astype(jnp.uint32)
    y = jnp.asarray(rows).astype(jnp.uint32)
    digits = []
    for i in range(order - 1, -1, -1):
        rx = (x >> jnp.uint32(i)) & _ONE
        ry = (y >> jnp.uint32(i)) & _ONE
        digits.append((jnp.uint32(3) * rx) ^ ry)
        # Rotate the low i bits into the subquadrant frame (ry == 0 branch of
        # the classic xy2d; vectorized with selects).
        low_mask = (_ONE << jnp.uint32(i)) - _ONE
        flip = (ry == 0) & (rx == 1)
        xf = jnp.where(flip, low_mask - (x & low_mask), x & low_mask)
        yf = jnp.where(flip, low_mask - (y & low_mask), y & low_mask)
        swap = ry == 0
        x, y = jnp.where(swap, yf, xf), jnp.where(swap, xf, yf)
    return digits


def hilbert_key(rows: jax.Array, cols: jax.Array, order: int = 16) -> jax.Array:
    """32-bit Hilbert key (``order`` ≤ 16 coordinate bits per axis)."""
    if order > 16:
        raise ValueError("order > 16 needs hilbert_key64")
    d = jnp.zeros(jnp.shape(rows), jnp.uint32)
    for q in _hilbert_bits(rows, cols, order):
        d = (d << jnp.uint32(2)) | q
    return d


def hilbert_key64(rows: jax.Array, cols: jax.Array, order: int = 32):
    """64-bit Hilbert key as a ``(hi, lo)`` uint32 pair (``order`` ≤ 32)."""
    if order > 32:
        raise ValueError("order > 32 unsupported")
    hi = jnp.zeros(jnp.shape(rows), jnp.uint32)
    lo = jnp.zeros(jnp.shape(rows), jnp.uint32)
    for q in _hilbert_bits(rows, cols, order):
        hi = (hi << jnp.uint32(2)) | (lo >> jnp.uint32(30))
        lo = (lo << jnp.uint32(2)) | q
    return hi, lo


def hilbert_d2xy(d: jax.Array, order: int = 16):
    """Inverse map: 32-bit Hilbert index -> (rows, cols).

    Parity with the reference's ``d2xy`` (SURVEY.md §2 R1); used in
    round-trip tests. Bottom-up sweep of the same rotation recurrence.
    """
    d = jnp.asarray(d).astype(jnp.uint32)
    x = jnp.zeros(d.shape, jnp.uint32)
    y = jnp.zeros(d.shape, jnp.uint32)
    t = d
    for i in range(order):
        s = jnp.uint32(i)
        rx = (t >> _ONE) & _ONE
        ry = (t ^ rx) & _ONE
        # Inverse rotation of the low i bits.
        low_mask = (_ONE << s) - _ONE
        flip = (ry == 0) & (rx == 1)
        xs = jnp.where(flip, low_mask - (x & low_mask), x & low_mask)
        ys = jnp.where(flip, low_mask - (y & low_mask), y & low_mask)
        swap = ry == 0
        x, y = jnp.where(swap, ys, xs), jnp.where(swap, xs, ys)
        x = x | (rx << s)
        y = y | (ry << s)
        t = t >> jnp.uint32(2)
    return y, x  # (rows, cols)
