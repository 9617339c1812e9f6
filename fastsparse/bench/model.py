"""Shared engine cost model (measured on v5e — CLAUDE.md).

One place for the per-tile / per-slot constants used by ordering selection
(`reorder.cluster.best_perms`), the hybrid dense/sparse split
(`formats.hybrid.auto_threshold`), and engine auto-selection. Constants are
fetch-based measurements, not datasheet numbers.
"""
from __future__ import annotations

import numpy as np

__all__ = [
    "DENSE_TILE_S",
    "GATHER_SLOT_S",
    "GATHER_PAD",
    "modeled_product_seconds",
    "auto_threshold",
]

# Effective BSR tile cost on the MXU path for *scattered* dense tiles —
# calibrated from the 2026-08-17 hybrid threshold sweep (v5e, ECFP):
# raw batched tile compute is ~32-56 ns, but scattered tiles pay bucket
# padding (pow2 ns, width rounding) and extra per-bucket launches; the
# sweep shows thresholds below ~32 nnz/tile always lose.
DENSE_TILE_S = 150e-9
# Gather-engine cost per raw nonzero, bucket padding folded in (measured:
# 1.28M-nnz ECFP in 3.27 ms through the single-segment gather engine).
GATHER_SLOT_S = 2.5e-9
# Padding is folded into GATHER_SLOT_S (kept for API compatibility).
GATHER_PAD = 1.0


def _tile_counts(rows, cols, shape, tm, tk):
    n_slabs = max(-(-shape[1] // tk), 1)
    pair = (np.asarray(rows) // tm) * n_slabs + np.asarray(cols) // tk
    _, cnt = np.unique(pair, return_counts=True)
    return cnt


def modeled_product_seconds(rows, cols, shape, tm=8, tk=128, threshold=None):
    """Modeled seconds per product under the hybrid split."""
    cnt = _tile_counts(rows, cols, shape, tm, tk)
    if threshold is None:
        threshold, cost = auto_threshold_from_counts(cnt)
        return cost
    dense = cnt >= threshold
    return DENSE_TILE_S * int(dense.sum()) + GATHER_SLOT_S * GATHER_PAD * int(
        cnt[~dense].sum()
    )


def auto_threshold_from_counts(cnt) -> tuple:
    """(threshold, cost): occupancy cutoff minimizing the modeled cost.

    A tile with ``c`` entries costs ``DENSE_TILE_S`` on the MXU path or
    ``c · GATHER_SLOT_S · GATHER_PAD`` on the gather engine, so the
    breakeven is ``DENSE_TILE_S / (GATHER_SLOT_S·GATHER_PAD)`` ≈ 60
    entries/tile with the calibrated constants (the 2026-08-17 sweep shows
    thresholds below ~32 always lose on real structure). Computed exactly
    via suffix sums over sorted counts.
    """
    cnt = np.sort(np.asarray(cnt, np.int64))
    if cnt.size == 0:
        return 2, 0.0
    # candidate thresholds: distinct counts (tiles with cnt >= th are dense)
    uniq = np.unique(cnt)
    # suffix position of first tile >= u
    idx = np.searchsorted(cnt, uniq, side="left")
    total = cnt.sum()
    suffix_tiles = cnt.size - idx
    prefix_nnz = np.concatenate([[0], np.cumsum(cnt)])[idx]
    costs = DENSE_TILE_S * suffix_tiles + GATHER_SLOT_S * GATHER_PAD * prefix_nnz
    # also allow "no dense tiles at all"
    all_sparse = GATHER_SLOT_S * GATHER_PAD * total
    k = int(np.argmin(costs))
    if all_sparse < costs[k]:
        return int(cnt.max()) + 1, float(all_sparse)
    return max(int(uniq[k]), 2), float(costs[k])


def auto_threshold(rows, cols, shape, tm=8, tk=128) -> int:
    """Best hybrid dense/sparse occupancy threshold for this matrix."""
    return auto_threshold_from_counts(_tile_counts(rows, cols, shape, tm, tk))[0]
