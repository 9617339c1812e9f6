"""Per-matrix bucket tuning: optimal ELL widths / BSR tile counts.

The default `Config` uses power-of-two bucket edges so compiled program
shapes are shared across matrices (remote TPU compiles cost ~30 s each —
CLAUDE.md). For a matrix that will be used many times, per-matrix *optimal*
bucket edges cut the gather engine's padding ratio (the ~1.5–2× slot
overhead is pure wasted instruction issue at ~2.2 ns/slot —
docs/ROADMAP.md item 3): with row/strip populations known, choosing the
``K`` bucket edges that minimize total padded slots is a small interval
dynamic program over the length histogram.

`tuned_config(mat)` returns a `Config` whose ``ell_bucket_widths`` /
``bsr_bucket_tiles`` are optimal for that matrix (opt-in:
``operator(..., tune=True)``).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np

from .config import DEFAULT, Config

__all__ = ["optimal_buckets", "tuned_config", "padded_slots", "allocated_slots"]


def optimal_buckets(
    counts: Sequence[int],
    max_buckets: int = 8,
    round_to: int = 1,
    max_classes: int = 2048,
) -> tuple:
    """Bucket edges minimizing total padded slots.

    ``counts``: per-row nnz (or per-strip tile counts). Every row is padded
    to the smallest chosen edge ≥ its count; the result always contains the
    max count, uses at most ``max_buckets`` edges, and minimizes
    ``sum(edge(row) for rows)``. Interval DP, O(K·m²) over ``m`` distinct
    counts (quantized to ``max_classes`` classes if needed).
    """
    counts = np.asarray(counts, np.int64)
    counts = counts[counts > 0]
    if counts.size == 0:
        return (1,)
    if round_to > 1:
        counts = -(-counts // round_to) * round_to
    lens, hist = np.unique(counts, return_counts=True)
    m = lens.size
    if m > max_classes:
        # quantize: keep every class's rows but merge onto ~max_classes edges
        q = np.linspace(0, m - 1, max_classes).astype(np.int64)
        q = np.unique(q)
        # rows in (lens[q[i-1]], lens[q[i]]] pad to lens[q[i]]
        new_hist = np.zeros(q.size, np.int64)
        idx = np.searchsorted(lens[q], lens, side="left")
        np.add.at(new_hist, idx, hist)
        lens, hist = lens[q], new_hist
        m = lens.size
    return _dp(lens, hist, min(max_buckets, m))


def _cp2_rows(x):
    """True bucket size for ``x`` rows: `build_ell` rounds each bucket's
    row count up to a power of two (min 8); empty buckets cost nothing."""
    x = np.asarray(x, np.float64)
    xc = np.maximum(x, 8)
    p = np.power(2.0, np.ceil(np.log2(np.maximum(xc, 1))))
    return np.where(x > 0, p, 0.0)


def _dp(lens, hist, K):
    """Interval DP with parent backtrack: O(K·m²), m = distinct classes.
    Objective = sum over buckets of ceil_pow2(rows)·width — the storage
    `build_ell` actually allocates (plain rows·width under-credits the
    pow2 bucket-height rounding and mis-tunes)."""
    m = lens.size
    pre = np.concatenate([[0], np.cumsum(hist)]).astype(np.float64)
    lensf = lens.astype(np.float64)
    INF = np.inf
    f = np.full((K, m), INF)
    parent = np.full((K, m), -1, np.int64)
    f[0] = lensf * _cp2_rows(pre[1:])
    for k in range(1, K):
        fp = f[k - 1]
        # cand[i, j] = fp[i] + lens[j] * cp2(pre[j+1] - pre[i+1]) for i < j
        cand = fp[:, None] + lensf[None, :] * _cp2_rows(
            pre[None, 1:] - pre[1:, None]
        )
        ii, jj = np.meshgrid(np.arange(m), np.arange(m), indexing="ij")
        cand[ii >= jj] = INF
        best_i = np.argmin(cand, axis=0)
        f[k] = cand[best_i, np.arange(m)]
        parent[k] = best_i
    ks = int(np.argmin(f[:, m - 1]))
    edges = []
    j = m - 1
    k = ks
    while j >= 0 and k >= 0:
        edges.append(int(lens[j]))
        j = int(parent[k, j])
        k -= 1
    return tuple(sorted(edges))


def padded_slots(counts: Sequence[int], edges: Sequence[int]) -> int:
    """Total slots when each count pads to the smallest edge ≥ it."""
    counts = np.asarray(counts, np.int64)
    counts = counts[counts > 0]
    edges = np.sort(np.asarray(edges, np.int64))
    idx = np.searchsorted(edges, counts, side="left")
    if (idx >= edges.size).any():
        raise ValueError("max count exceeds largest edge")
    return int(edges[idx].sum())


def allocated_slots(counts: Sequence[int], edges: Sequence[int]) -> int:
    """`padded_slots` with `build_ell`'s pow2 bucket-height rounding —
    the storage the format really allocates."""
    counts = np.asarray(counts, np.int64)
    counts = counts[counts > 0]
    edges = np.sort(np.asarray(edges, np.int64))
    idx = np.searchsorted(edges, counts, side="left")
    if (idx >= edges.size).any():
        raise ValueError("max count exceeds largest edge")
    rows = np.bincount(idx, minlength=edges.size)
    return int((_cp2_rows(rows) * edges).sum())


def tuned_config(
    mat,
    config: Config = DEFAULT,
    max_ell_buckets: int = 8,
    max_bsr_buckets: int = 8,
) -> Config:
    """A `Config` with per-matrix optimal bucket edges.

    Trades compile-shape reuse for minimum padding — worth it for matrices
    used across many products (the persistent compile cache still reuses
    programs across *runs* of the same matrix).
    """
    from .formats.convert import to_coo

    if hasattr(mat, "tocoo") and not hasattr(mat, "rows"):
        m = mat.tocoo()
        rows = m.row.astype(np.int64)
        cols = m.col.astype(np.int64)
        shape = m.shape
    else:
        coo = to_coo(mat)
        rows = np.asarray(coo.rows)[: coo.n_valid].astype(np.int64)
        cols = np.asarray(coo.cols)[: coo.n_valid].astype(np.int64)
        shape = coo.shape

    from .config import SEG_COLS

    if shape[1] > SEG_COLS:
        # Column-segmented gather formats bucket each row PER SEGMENT —
        # rows split into much shorter per-segment pieces, so the DP must
        # see those lengths, not global row nnz (global edges measured
        # pad 2.15 -> 2.52 on segmented powerlaw 65k^2).
        from .linops import _balanced_seg_cols

        seg_w = _balanced_seg_cols(shape[1])
        nseg = -(-shape[1] // seg_w)
        pair = rows * nseg + cols // seg_w
        upair_r, row_counts = np.unique(pair, return_counts=True)
        seg_of_count = upair_r % nseg
    else:
        row_counts = np.bincount(rows, minlength=shape[0])
        seg_of_count = np.zeros(row_counts.size, np.int64)
    # Gather-kernel feasibility: widths > 16 run K//KB grid steps with KB
    # the largest divisor of K <= 16 (`pallas.ell_spmm._pick_kb`) — odd
    # widths would degrade to KB of 1-8. Quantize the COUNTS onto the
    # allowed width lattice (<=16 exact, else multiples of 16) so the DP
    # optimizes within it, then never return a set worse than the
    # default pow2 edges.
    live = row_counts > 0
    rc = row_counts[live].astype(np.int64)
    segs = seg_of_count[live]
    rc_q = np.where(rc <= 16, rc, -(-rc // 16) * 16)
    ell_widths = optimal_buckets(rc_q, max_buckets=max_ell_buckets)
    if rc.size:
        default_w = sorted(set(config.ell_bucket_widths))
        if rc_q.max() > default_w[-1]:
            from .utils.shapes import ceil_pow2

            default_w.append(ceil_pow2(int(rc_q.max())))

        def _alloc(edges):
            # bucket heights pow2-round PER SEGMENT (each segment builds
            # its own EllMatrix) — pooling under-counts that loss
            return sum(
                allocated_slots(rc_q[segs == s], edges)
                for s in np.unique(segs)
            )

        if _alloc(default_w) < _alloc(ell_widths):
            ell_widths = tuple(default_w)

    # resolved view for the strip histogram only — the returned config
    # keeps the caller's tile_m (incl. the None auto sentinel, which
    # operator() resolves after tuning)
    tm = config.resolve().tile_m
    n_slabs = max(-(-shape[1] // config.tile_k), 1)
    pair = (rows // tm) * n_slabs + cols // config.tile_k
    upair = np.unique(pair)
    strip_counts = np.bincount(
        (upair // n_slabs).astype(np.int64),
        minlength=-(-shape[0] // tm),
    )
    bsr_tiles = optimal_buckets(strip_counts, max_buckets=max_bsr_buckets)

    return dataclasses.replace(
        config,
        ell_bucket_widths=tuple(int(w) for w in ell_widths),
        bsr_bucket_tiles=tuple(int(t) for t in bsr_tiles),
    )
