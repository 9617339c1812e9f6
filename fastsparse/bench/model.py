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
    "dense_col_select",
    "modeled_product_seconds",
    "auto_threshold",
]

# Effective BSR tile cost on the MXU path for *scattered* dense tiles —
# calibrated from the 2026-08-17 hybrid threshold sweeps (v5e, ECFP +
# rmat s18): raw batched tile compute is ~32-56 ns, but scattered tiles
# pay bucket padding (pow2 ns, width rounding) and extra per-bucket
# launches. Bitmask-era sweeps put breakeven at ~60 nnz/tile (150 ns);
# with bf16-valued tiles (no mask expansion, session 3) the measured
# optimum moved to th≈16-32 (ecfp: th=32 4.66 ms vs th=64 5.01; rmat:
# 13.4 vs 14.2) → 100 ns, breakeven ≈ 40.
DENSE_TILE_S = 100e-9
# Gather-engine cost per raw nonzero, bucket padding folded in (measured:
# 1.28M-nnz ECFP in 3.27 ms through the single-segment gather engine).
GATHER_SLOT_S = 2.5e-9
# Padding is folded into GATHER_SLOT_S (kept for API compatibility).
GATHER_PAD = 1.0
# Reporting-only engine FLOOR (a lower bound, distinct from the
# format-selection cost constant above). Round 5 re-set (VERDICT r4
# #2): the packed full-unroll body measured 0.91 ns/padded-slot and
# production sweep/full chunks run 1.0-1.15 ns incl. their X-panel DMA
# (probe_gather6 + hyper traces, v5e 2026-08-21); at ~1.15x stored
# padding that is ~1.1 ns per RAW nonzero. Rows print measured/floor as
# `engine_frac` — values well under 1 now mean assembly/boundary
# passes, not kernel slack (the traces in docs/ROUND5.md decompose
# them).
GATHER_FLOOR_S = 1.1e-9

# Dense-column extraction (round 5): power-law/R-MAT structure puts a
# large nnz fraction into few high-degree columns; storing those columns
# as ONE dense (nrow, D) int8 0/1 block turns their slots into MXU
# matmul cells. Cost per (row, col) CELL of the block at N=128 parity
# (3 s8 passes + int8 DMA, overlapped) — calibrated on v5e
# (scripts/probe_densecols_tpu.py). A column of degree d is worth
# extracting when nrow · DENSE_COL_CELL_S < d · GATHER_SLOT_S.
DENSE_COL_CELL_S = 5.0e-12
DENSE_COL_MEM_MAX = 256 * 2**20  # dense block byte budget (int8 cells)
DENSE_COL_MIN_D = 64  # below this many columns the launch isn't worth it
# Below this many rows the per-column model constants aren't calibrated
# (launch overheads dominate) and the other engines handle the matrix
# fine — extraction targets large hypersparse structure.
DENSE_COL_MIN_ROWS = 16384


def dense_col_select(coldeg, nrow: int):
    """Column ids worth moving to the dense block (descending degree),
    or an empty array. ``coldeg``: per-column nonzero counts."""
    coldeg = np.asarray(coldeg)
    if nrow < DENSE_COL_MIN_ROWS:
        return np.zeros(0, np.int64)
    d_star = max(nrow * DENSE_COL_CELL_S / GATHER_SLOT_S, 8.0)
    sel = np.nonzero(coldeg >= d_star)[0]
    if sel.size < DENSE_COL_MIN_D:
        return np.zeros(0, np.int64)
    d_max = max(int(DENSE_COL_MEM_MAX // max(nrow, 1)), 0)
    if sel.size > d_max:
        order = np.argsort(-coldeg[sel], kind="stable")
        sel = sel[order[:d_max]]
    return np.sort(sel.astype(np.int64))


# BSR tile cost as a function of tile height (2026-08-17 tile_m sweep,
# banded 50k bw512 binary N=128: 147/457/1816 ns per tile at tm=8/32/128):
# cost(tm) ≈ TILE_BASE_S + tm · TILE_ROW_S. Fixed overheads (DMA
# descriptors, slab index reads, loop issue) amortize over taller tiles,
# so merging vertically-adjacent tiles pays whenever the merged tiling
# has sufficiently fewer tiles.
TILE_BASE_S = 45e-9
TILE_ROW_S = 13.5e-9


def best_tile_m(rows, cols, shape, tk=128, candidates=(8, 32, 128)):
    """Tile height minimizing modeled BSR sweep cost for this structure.

    Banded/blocked structure merges vertically (fewer, taller tiles →
    fewer fixed overheads, fuller MXU rows: measured 1.3× on the blocked
    binary headline); scattered structure doesn't merge and stays at 8.
    """
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    n_slabs = max(-(-shape[1] // tk), 1)
    best, best_cost = candidates[0], None
    for tm in candidates:
        pair = (rows // tm) * n_slabs + cols // tk
        nt = np.unique(pair).size
        cost = nt * (TILE_BASE_S + tm * TILE_ROW_S)
        if best_cost is None or cost < best_cost:
            best, best_cost = tm, cost
    return best


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
