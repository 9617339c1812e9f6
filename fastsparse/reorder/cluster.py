"""Degree-clustering permutations for tile density.

The reference sorts nonzeros along a Hilbert curve for cache locality
(SURVEY.md §2 R1-R2). On TPU the analogous lever is *tile density*
(SURVEY.md §7.1): the tiled-BSR format moves whole (TM × TK) tiles, so the
win comes from packing nonzeros into few, full tiles. For power-law
(scale-free) matrices — the Macau/ECFP workload, BASELINE.json:8 — sorting
rows and columns by degree concentrates the hot rows/columns into the
top-left tile block, collapsing the tile count by orders of magnitude.

`degree_perms` computes the permutations on device (masked histogram +
`argsort`, jittable — BASELINE.json:5 "reordering done as jittable device
code"). `permute_coo` relabels entries; consumers un-permute operands with
the inverse permutations (see `linops.SparseOperator`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.coo import COO, BinaryCOO

__all__ = [
    "degree_perms",
    "minhash_perms",
    "tilepack_perms",
    "hilbert_perms",
    "best_perms",
    "invert_perm",
    "permute_coo",
]


@jax.jit
def invert_perm(perm: jax.Array) -> jax.Array:
    """inv with inv[perm[k]] = k."""
    n = perm.shape[0]
    return jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype)
    )


def degree_perms(coo):
    """(row_perm, col_perm): old index of the k-th densest row/column.

    Stable descending-degree order, so the permuted matrix has its heavy
    rows/columns first — power-law structure becomes a dense top-left core.
    Concrete inputs take a host fast path (device argsort compiles cost
    ~a minute per shape through the remote tunnel — CLAUDE.md); traced
    inputs run the jitted device version.
    """
    if not isinstance(coo.rows, jax.core.Tracer):
        import numpy as np

        rows = np.asarray(coo.rows)[: coo.n_valid]
        cols = np.asarray(coo.cols)[: coo.n_valid]
        rdeg = np.bincount(rows, minlength=coo.shape[0])
        cdeg = np.bincount(cols, minlength=coo.shape[1])
        row_perm = np.argsort(-rdeg, kind="stable").astype(np.int32)
        col_perm = np.argsort(-cdeg, kind="stable").astype(np.int32)
        return jnp.asarray(row_perm), jnp.asarray(col_perm)
    return _degree_perms_device(coo)


def _mix(x, salt):
    import numpy as np

    x = (x.astype(np.uint64) + np.uint64(salt)) * np.uint64(
        0x9E3779B97F4A7C15
    )
    x ^= x >> np.uint64(29)
    x *= np.uint64(0xBF58476D1CE4E5B9)
    x ^= x >> np.uint64(32)
    return x


def minhash_perms(coo, iters: int = 2, seed: int = 0):
    """Similarity co-clustering: rows ordered by a 2-hash MinHash of their
    column sets, columns by their minimum relabeled row — alternated.
    Groups rows with overlapping supports (communities, shared scaffolds)
    so their common columns land in the same tiles. Host-side.
    """
    import numpy as np

    nrow, ncol = coo.shape
    rows = np.asarray(coo.rows)[: coo.n_valid]
    cols = np.asarray(coo.cols)[: coo.n_valid]
    U64 = np.uint64(0xFFFFFFFFFFFFFFFF)
    rinv = np.arange(nrow)
    cinv = np.arange(ncol)
    rp = rinv
    cp = cinv
    for it in range(iters):
        h1 = _mix(cols, seed + 101 + it)
        h2 = _mix(cols, seed + 202 + it)
        s1 = np.full(nrow, U64)
        s2 = np.full(nrow, U64)
        np.minimum.at(s1, rows, h1)
        np.minimum.at(s2, rows, h2)
        rp = np.lexsort((s2, s1))
        rinv = np.empty(nrow, np.int64)
        rinv[rp] = np.arange(nrow)
        sc = np.full(ncol, np.int64(nrow))
        np.minimum.at(sc, cols, rinv[rows])
        cp = np.argsort(sc, kind="stable")
        cinv = np.empty(ncol, np.int64)
        cinv[cp] = np.arange(ncol)
    return jnp.asarray(rp.astype(np.int32)), jnp.asarray(cp.astype(np.int32))


def _colpack(rows, cols, ncol, new_rows, group_rows, min_freq):
    """Column order from greedy per-row-group packing.

    Walk groups of ``group_rows`` consecutive (permuted) rows in order; each
    group appends its frequent not-yet-placed columns (≥ ``min_freq`` uses
    within the group, most-used first) to the column order. A row cluster's
    popular columns thereby land in contiguous 128-lane slabs — dense tiles
    for that cluster's row strips. Leftover columns follow by global degree.
    """
    import numpy as np

    g = new_rows // group_rows
    order = np.lexsort((cols, g))
    gs, cs = g[order], cols[order]
    key = gs * np.int64(ncol) + cs
    bnd = np.flatnonzero(np.r_[True, key[1:] != key[:-1]])
    freq = np.diff(np.r_[bnd, key.size])
    ug, uc = gs[bnd], cs[bnd]
    keep = freq >= min_freq
    oo = np.lexsort((-freq[keep], ug[keep]))
    cand = uc[keep][oo]
    if cand.size:
        _, first = np.unique(cand, return_index=True)
        head = cand[np.sort(first)]
    else:
        head = np.empty(0, np.int64)
    placed = np.zeros(ncol, bool)
    placed[head] = True
    rest = np.flatnonzero(~placed)
    cdeg = np.bincount(cols, minlength=ncol)
    rest = rest[np.argsort(-cdeg[rest], kind="stable")]
    return np.concatenate([head, rest])


def _slab_regroup(rows, cols, nrow, ncol, cinv, tk):
    """Row order aligning rows to the packed column slabs: rows sorted by
    (dominant tk-slab, count desc, second slab) so rows feeding the same
    slab share row strips — the tile-density dual of `_colpack`."""
    import numpy as np

    slab = cinv[cols] // tk
    nsl = max(-(-ncol // tk), 1)
    key = rows * np.int64(nsl) + slab
    order = np.argsort(key, kind="stable")
    ks = key[order]
    bnd = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
    cnt = np.diff(np.r_[bnd, ks.size])
    urow, uslab = ks[bnd] // nsl, ks[bnd] % nsl
    oo = np.lexsort((-cnt, urow))
    ur, us, uct = urow[oo], uslab[oo], cnt[oo]
    firsts = np.flatnonzero(np.r_[True, ur[1:] != ur[:-1]])
    s1 = np.full(nrow, nsl, np.int64)
    c1 = np.zeros(nrow, np.int64)
    s2 = np.full(nrow, nsl, np.int64)
    s1[ur[firsts]] = us[firsts]
    c1[ur[firsts]] = uct[firsts]
    sec = firsts + 1
    sec = sec[sec < ur.size]
    sec = sec[ur[sec] == ur[sec - 1]]
    s2[ur[sec]] = us[sec]
    return np.lexsort((s2, -c1, s1))


def tilepack_perms(
    coo,
    base: str = "minhash",
    rounds: int = 2,
    group_rows: int = 32,
    min_freq: int = 6,
    tm: int = 8,
    tk: int = 128,
    seed: int = 0,
):
    """Tile-density mining: similarity row clustering + greedy column
    packing + slab-aligned row regrouping, iterated to convergence.

    The strongest ordering for community-structured sparsity (measured on
    the ECFP/Macau workload: 13 % → 50 % of nnz in dense 8×128 tiles vs
    plain MinHash; R-MAT ~30 %). ``base`` seeds the row order ('minhash'
    or 'degree'); each round then (a) packs every row-group's frequent
    columns into contiguous slabs and (b) regroups rows by dominant slab.
    Host-side (setup path; cache the built format — `io.npz_cache`).
    """
    import numpy as np

    nrow, ncol = coo.shape
    rows = np.asarray(coo.rows)[: coo.n_valid].astype(np.int64)
    cols = np.asarray(coo.cols)[: coo.n_valid].astype(np.int64)
    if rows.size == 0:
        ident_r = jnp.arange(nrow, dtype=jnp.int32)
        ident_c = jnp.arange(ncol, dtype=jnp.int32)
        return ident_r, ident_c
    if base == "degree":
        rp = np.asarray(degree_perms(coo)[0]).astype(np.int64)
    else:
        rp = np.asarray(minhash_perms(coo, seed=seed)[0]).astype(np.int64)
    cp = np.arange(ncol, dtype=np.int64)
    for _ in range(rounds):
        rinv = np.empty(nrow, np.int64)
        rinv[rp] = np.arange(nrow)
        cp = _colpack(rows, cols, ncol, rinv[rows], group_rows, min_freq)
        cinv = np.empty(ncol, np.int64)
        cinv[cp] = np.arange(ncol)
        rp = _slab_regroup(rows, cols, nrow, ncol, cinv, tk)
    return jnp.asarray(rp.astype(np.int32)), jnp.asarray(cp.astype(np.int32))


def hilbert_perms(coo):
    """Row/col permutations along the Hilbert curve (SURVEY.md §2 R1;
    BASELINE.json:8 "COO SpMV with Hilbert-curve reordering").

    The reference sorts COO *entries* by Hilbert key for cache locality
    (``sort_sbm``, SURVEY.md §3.1); the bucketed TPU formats are
    entry-order invariant, so the curve enters as a renumbering instead:
    entries are walked in Hilbert order and rows/columns are renumbered
    by first appearance. Curve-adjacent rows/columns — which share 2-D
    neighborhoods of the matrix — land in adjacent strips/slabs, turning
    the C library's cache locality into tile density.
    """
    import numpy as np

    from .hilbert import hilbert_key64

    rows = np.asarray(coo.rows)[: coo.n_valid]
    cols = np.asarray(coo.cols)[: coo.n_valid]
    nrow, ncol = coo.shape
    hi, lo = hilbert_key64(jnp.asarray(rows), jnp.asarray(cols))
    key = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        lo
    ).astype(np.uint64)
    order = np.argsort(key, kind="stable")

    def first_appear(stream, n):
        vals, first = np.unique(stream, return_index=True)
        head = vals[np.argsort(first, kind="stable")]
        missing = np.setdiff1d(np.arange(n, dtype=np.int64), vals)
        return np.concatenate([head, missing])

    rp = first_appear(rows[order], nrow)
    cp = first_appear(cols[order], ncol)
    return jnp.asarray(rp.astype(np.int32)), jnp.asarray(cp.astype(np.int32))


def _ordering_cost(rows, cols, shape, rinv, cinv, tm=8, tk=128):
    """Modeled seconds/product under the hybrid split at its best
    threshold (shared measured constants — `bench.model`)."""
    import numpy as np

    from ..bench.model import auto_threshold_from_counts

    r2 = rinv[rows] if rinv is not None else rows
    c2 = cinv[cols] if cinv is not None else cols
    nsl = max(-(-shape[1] // tk), 1)
    pair = (r2 // tm) * nsl + c2 // tk
    _, cnt = np.unique(pair, return_counts=True)
    return auto_threshold_from_counts(cnt)[1]


def best_perms(coo):
    """Pick the ordering ({identity, degree, minhash, tilepack}) minimizing
    the modeled product cost. Returns (row_perm, col_perm) or (None, None)."""
    import numpy as np

    rows = np.asarray(coo.rows)[: coo.n_valid]
    cols = np.asarray(coo.cols)[: coo.n_valid]
    cands = {"none": (None, None)}
    rp, cp = degree_perms(coo)
    cands["degree"] = (np.asarray(rp), np.asarray(cp))
    rp, cp = minhash_perms(coo)
    cands["minhash"] = (np.asarray(rp), np.asarray(cp))
    rp, cp = tilepack_perms(coo, base="minhash")
    cands["tilepack"] = (np.asarray(rp), np.asarray(cp))
    rp, cp = tilepack_perms(coo, base="degree")
    cands["tilepack-deg"] = (np.asarray(rp), np.asarray(cp))
    rp, cp = hilbert_perms(coo)
    cands["hilbert"] = (np.asarray(rp), np.asarray(cp))
    best, best_cost = "none", None
    for name, (r, c) in cands.items():
        rinv = cinv = None
        if r is not None:
            rinv = np.empty(r.size, np.int64)
            rinv[r] = np.arange(r.size)
            cinv = np.empty(c.size, np.int64)
            cinv[c] = np.arange(c.size)
        cost = _ordering_cost(rows, cols, coo.shape, rinv, cinv)
        if best_cost is None or cost < best_cost:
            best, best_cost = name, cost
    if best == "none":
        return None, None
    r, c = cands[best]
    return jnp.asarray(r), jnp.asarray(c)


@jax.jit
def _degree_perms_device(coo):
    nrow, ncol = coo.shape
    valid = coo.valid_mask()
    ones = valid.astype(jnp.int32)
    rdeg = jnp.zeros((nrow,), jnp.int32).at[coo.rows].add(ones)
    cdeg = jnp.zeros((ncol,), jnp.int32).at[coo.cols].add(ones)
    row_perm = jnp.argsort(-rdeg, stable=True).astype(jnp.int32)
    col_perm = jnp.argsort(-cdeg, stable=True).astype(jnp.int32)
    return row_perm, col_perm


@jax.jit
def permute_coo(coo, row_perm, col_perm):
    """Relabel entries: new_row = rinv[row], new_col = cinv[col].

    The result represents ``P_r A P_cᵀ`` where P are the permutation
    matrices of ``row_perm``/``col_perm``: ``(P_r A P_cᵀ) @ x[col_perm]
    == (A @ x)[row_perm]``.
    """
    rinv = invert_perm(row_perm)
    cinv = invert_perm(col_perm)
    rows = rinv[coo.rows]
    cols = cinv[coo.cols]
    if isinstance(coo, BinaryCOO):
        # keep padding harmless: relabeled padding may alias real slots, but
        # the validity mask still guards it
        return BinaryCOO(
            rows=rows, cols=cols, shape=coo.shape, n_valid=coo.n_valid
        )
    return COO(
        rows=jnp.where(coo.valid_mask(), rows, 0),
        cols=jnp.where(coo.valid_mask(), cols, 0),
        vals=coo.vals,
        shape=coo.shape,
        n_valid=coo.n_valid,
    )
