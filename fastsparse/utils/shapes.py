"""Shared shape/rounding helpers."""
from __future__ import annotations

__all__ = ["round_up", "ceil_pow2"]


def round_up(x: int, m: int) -> int:
    """Smallest multiple of ``m`` that is >= ``x``."""
    return ((x + m - 1) // m) * m


def ceil_pow2(x: int) -> int:
    """Smallest power of two >= ``x`` (min 1)."""
    return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()
