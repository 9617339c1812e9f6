"""ELL gather-engine dispatch: SpMM over bucketed / segmented ELL.

Bridges `formats.ell` to the Pallas gather kernel
(`ops.pallas.ell_spmm`): pads operands, chunks buckets to the SMEM
scalar-prefetch budget, scatters per-bucket row outputs into Y, and
accumulates column segments. Falls back to the XLA engines off-TPU dtypes.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..formats.ell import EllMatrix, SegmentedEll
from . import assemble as _assemble
from .pallas.ell_spmm import (
    ELL_GROUP,
    SMEM_BLOCK_K_UNIT,
    SMEM_BLOCK_K_VALUED,
    ell_bucket_spmm,
    ell_bucket_spmm_dd,
    ell_bucket_spmm_dd_valued,
    ell_bucket_spmm_smem,
    packed_pair_ok,
)

__all__ = ["ell_spmm", "ell_spmm_dd", "gather_engine_supported", "gather_engine_fits"]

LANES = 128
# Flat entries per kernel call, bounded by SMEM (1 MB/core): unit mode
# prefetches cols only (int32 -> 512 KB at 128k), valued mode cols+vals
# (512 KB combined at 64k). Each chunk is a separate pallas call with its
# own launch + X-panel DMA — a 262k-row power-law matrix at the old 32k
# budget needed 224 calls (~35 ms of pure overhead), so the budget is the
# lever for hypersparse throughput.
_SMEM_IDX_BUDGET_UNIT = 128 * 1024
_SMEM_IDX_BUDGET_VALUED = 64 * 1024
_SMEM_IDX_BUDGET = _SMEM_IDX_BUDGET_UNIT  # compat alias (unit default)
# One-program-per-bucket SMEM-blocked kernel: measured slower than chunked
# scalar prefetch (see `_seg_parts`); flip for A/B experiments only.
USE_SMEM_PATH = False
# Merge packed width-class chunks into multi-part sweep launches
# (`ell_sweep_spmm`). Saves one resident-X DMA per width class but the
# per-grid-step `pl.when` part ladder has its own cost — A/B per flag.
USE_SWEEP = True
# X panel residency budget. 12 MB (same as the BSR resident budget) lets a
# ~24k-column matrix run unsegmented at n_block=128 — column segmentation
# splits rows across segments and roughly doubles bucket padding, so one
# segment is worth pushing for.
X_VMEM_BUDGET = 12 * 1024 * 1024


from ..utils.shapes import round_up as _round_up


def gather_engine_supported(dtype) -> bool:
    return jnp.dtype(dtype) == jnp.dtype(jnp.float32)


def gather_engine_fits(ncol: int, n_rhs: int, itemsize: int = 4) -> bool:
    """Does the X panel stay VMEM-resident at this width?

    Wide RHS runs as per-128-column chunked calls (`ell_spmm`), so only
    one LANES-wide panel must fit — N=256 on a 20k-col matrix previously
    failed this check and fell to the ~14x-slower XLA scan engine."""
    nb = min(_round_up(max(n_rhs, 1), LANES), 512)
    nb = min(nb, LANES)
    return _round_up(max(ncol, 8), 8) * nb * itemsize <= X_VMEM_BUDGET


def _chunk_ranges(nb: int, K: int, budget: int):
    """Slot ranges (s0, s1, n_pad) covering a bucket under the SMEM budget.

    The tail chunk gets its own EXACT (8-row-rounded) shape instead of
    padding to the full chunk: shared-shape tails dispatched 1.344x the
    raw nnz on powerlaw 65k² against the ladder's 1.131x stored padding —
    ~0.85M wasted slots ≈ 1 ms at the 1.2 ns/slot kernel floor (traced
    2026-08-21). Cost: ≤1 extra compiled shape per multi-chunk bucket.
    """
    nb_max = max(ELL_GROUP, (budget // max(K, 1)) // 8 * 8)
    if nb <= nb_max:
        yield 0, nb, nb
        return
    for s0 in range(0, nb, nb_max):
        s1 = min(s0 + nb_max, nb)
        yield s0, s1, min(-(-(s1 - s0) // 8) * 8, nb_max)


def _seg_layout(seg, budget=None):
    """THE part-slot layout of one segment — the single source consumed by
    the compute path (`_seg_parts`), the assembly-plan builder
    (`ops.assemble._slot_stream`), and tests. Yields per appended part
    ``(bucket, mode, s0, s1, n_pad)``: ``mode`` is "smem" (whole bucket,
    one program) or "chunk" (slots [s0, s1) padded to n_pad rows) — or,
    since round 5, a SWEEP item ``(subparts, "sweep", 0, 0, 0)`` whose
    first element lists ``(bucket, s0, s1, n_pad)`` sub-parts merged
    into ONE multi-width kernel launch (`pallas.ell_spmm.ell_sweep_spmm`
    — each per-width launch re-DMAs the resident X panel, 46
    calls/product on powerlaw 65k²). A ``budget`` override (the dd
    paths) always chunks, never sweeps."""
    unit = getattr(seg, "unit_vals", False)
    b_eff = (
        budget
        if budget is not None
        else (_SMEM_IDX_BUDGET_UNIT if unit else _SMEM_IDX_BUDGET_VALUED)
    )
    k_cap = SMEM_BLOCK_K_UNIT if unit else SMEM_BLOCK_K_VALUED
    # packed-pair buckets (unit, even K, 16-bit columns — full-unroll AND
    # chunked bodies both pack since round 5) prefetch HALF the int32
    # words per slot — double their chunk budget so hypersparse launch
    # counts halve to match (`pallas.ell_spmm.packed_pair_ok`; the kernel
    # applies the same test)
    rows_pad = _round_up(max(seg.shape[1] + 1, 8), 8)
    pend, pend_entries = [], 0  # sweep accumulator (packed sub-parts)
    cap_entries = 2 * b_eff if USE_SWEEP else 0

    def flush():
        nonlocal pend, pend_entries
        if len(pend) == 1:
            b_, s0_, s1_, n_ = pend[0]
            yield b_, "chunk", s0_, s1_, n_
        elif pend:
            yield tuple(pend), "sweep", 0, 0, 0
        pend, pend_entries = [], 0

    for b in seg.buckets:
        nb, K = b.cols.shape
        packable = (
            budget is None
            and unit
            and packed_pair_ok(K, rows_pad)
            and getattr(b, "packed", None) is not None
        )
        b_bucket = b_eff
        if budget is None and unit and packed_pair_ok(K, rows_pad):
            b_bucket = 2 * b_eff
        if budget is None and USE_SMEM_PATH and nb * K > b_bucket and K <= k_cap:
            yield from flush()
            yield b, "smem", 0, nb, nb
            continue
        for s0, s1, n_pad in _chunk_ranges(nb, K, b_bucket):
            if not packable:
                yield from flush()
                yield b, "chunk", s0, s1, n_pad
                continue
            if pend_entries + n_pad * K > cap_entries:
                yield from flush()
            pend.append((b, s0, s1, n_pad))
            pend_entries += n_pad * K
    yield from flush()


def _slice_chunk(b, ell, s0, s1, n_pad):
    """Device slice of bucket slots [s0, s1) padded to n_pad rows
    (padding rows: zero vals / sentinel columns — harmless). Returns
    ``(row_ids, cols, vals, packed)`` with ``packed`` the matching slice
    of the build-time packed pairs (or None)."""
    nb, K = b.cols.shape
    pk = getattr(b, "packed", None)
    if (s0, s1, n_pad) == (0, nb, nb):
        return b.row_ids, b.cols, b.vals, pk
    rid, cc, vv = b.row_ids[s0:s1], b.cols[s0:s1], b.vals[s0:s1]
    pp = None if pk is None else pk[s0:s1]
    if s1 - s0 < n_pad:
        pad = n_pad - (s1 - s0)
        pad_col = ell.shape[1] if getattr(ell, "unit_vals", False) else 0
        rid = jnp.concatenate([rid, jnp.zeros((pad,), rid.dtype)])
        cc = jnp.concatenate([cc, jnp.full((pad, K), pad_col, cc.dtype)])
        vv = jnp.concatenate([vv, jnp.zeros((pad, K), vv.dtype)])
        if pp is not None:
            # packed sentinel pair: both halves the sentinel column
            pad_p = jnp.int32(
                np.int32(np.uint32(pad_col) | (np.uint32(pad_col) << 16))
            )
            pp = jnp.concatenate(
                [pp, jnp.full((pad, K // 2), pad_p, pp.dtype)]
            )
    return rid, cc, vv, pp


def _bucket_chunks(b, ell, budget=None):
    """Fixed-nb chunks of a bucket whose flat cols fit the SMEM budget."""
    nb, K = b.cols.shape
    if budget is None:
        budget = (
            _SMEM_IDX_BUDGET_UNIT
            if getattr(ell, "unit_vals", False)
            else _SMEM_IDX_BUDGET_VALUED
        )
    for s0, s1, n_pad in _chunk_ranges(nb, K, budget):
        yield _slice_chunk(b, ell, s0, s1, n_pad)


def _seg_parts(ell: EllMatrix, Xseg, n_block: int, rids, parts):
    """Append one segment's per-bucket products to (rids, parts).

    The caller scatters ALL segments in ONE ``.at[].add`` — per-chunk (and
    then per-segment) scatters made XLA rewrite the full Y buffer once per
    scatter (~285 µs each on a 134 MB Y; 97 chunks ≈ 28 ms of pure copies
    on rmat s18, 11 segments ≈ 3 ms more). Rows appearing in several
    segments are duplicate scatter indices — scatter-add sums them."""
    unit = getattr(ell, "unit_vals", False)
    for b, mode, s0, s1, n_pad in _seg_layout(ell):
        if mode == "sweep":
            # ONE multi-width launch for the whole group of packed
            # sub-parts: one X-panel DMA, one output block per 8 rows,
            # rows laid out in exactly sub-part order (the plan builder
            # consumes the same `_seg_layout` stream)
            from .pallas.ell_spmm import ell_sweep_spmm

            flats, rid_l, meta = [], [], []
            for bb, t0, t1, np_ in b:
                rid, _cc, _vv, pp = _slice_chunk(bb, ell, t0, t1, np_)
                flats.append(pp.reshape(-1))
                rid_l.append(rid)
                meta.append((np_, bb.cols.shape[1] // 2))
            parts.append(
                ell_sweep_spmm(
                    jnp.concatenate(flats), Xseg,
                    n_block=n_block, parts=tuple(meta),
                )
            )
            rids.append(jnp.concatenate(rid_l))
            continue
        if mode == "smem":
            # one program for the whole bucket: indices travel as blocked
            # SMEM operands, dodging the scalar-prefetch chunk limit.
            # Measured SLOWER than chunked scalar prefetch on v5e
            # (powerlaw 65k^2: 24.7 vs 16.0 ms; rmat s18: 29.5 vs 23.2 —
            # blocked SMEM operand DMAs don't pipeline like VMEM blocks),
            # so OFF by default; kept as a working, bit-exact code path
            # (scripts/verify_smem_ell_tpu.py).
            parts.append(
                ell_bucket_spmm_smem(
                    b.cols, b.vals, Xseg, n_block=n_block, unit=unit
                )
            )
            rids.append(b.row_ids)
            continue
        row_ids, cols, vals, packed = _slice_chunk(b, ell, s0, s1, n_pad)
        parts.append(
            ell_bucket_spmm(
                cols, vals, Xseg, n_block=n_block, unit=unit, packed=packed
            )
        )
        # padding chunk rows add zeros (zero vals / sentinel columns)
        rids.append(row_ids)


@jax.jit
def _dd_add(ah, al, bh, bl):
    """Elementwise double-word addition (TwoSum + renormalize), f32.

    Safe under the terminal's forced ``--xla_allow_excess_precision``:
    all arithmetic is native f32 (the flag only elides *narrowing cast*
    round-trips, which this never performs — CLAUDE.md).
    """
    s = ah + bh
    v = s - ah
    e = (ah - (s - v)) + (bh - v)
    lo = al + bl + e
    hi = s + lo
    return hi, lo - (hi - s)


# cols + vh + vl scalar-prefetch arrays share the SMEM budget (3 arrays
# vs the valued path's 2)
_SMEM_IDX_BUDGET_DD = 40 * 1024


def _dd_segment(
    bucket_arrs, x2j, *, nrow, n_block, budget, unit, pad_col
):
    """One segment's full dd product, traced inline (see `_dd_all`).

    ``bucket_arrs``: tuple of ``(row_ids, cols)`` (unit) or
    ``(row_ids, cols, vh, vl)`` (valued) per bucket. Chunk slicing, every
    chunk's pallas call, and the batched scatter all trace into a single
    XLA program — the host loop issued ~300 per-chunk dispatches through
    the tunnel (config 1 measured 1.67 s of mostly dispatch after the
    scatter batching; compute floor is ~0.15 s). Returns (Shi, Slo).
    """
    Npad = x2j.shape[1]
    rids, yhs, yls = [], [], []
    for arrs in bucket_arrs:
        rid_b, cols_b = arrs[0], arrs[1]
        nb, K = cols_b.shape
        for s0, s1, n_pad in _chunk_ranges(nb, K, budget):
            if (s0, s1, n_pad) == (0, nb, nb):
                rid, cc = rid_b, cols_b
                rest = arrs[2:]
            else:
                rid, cc = rid_b[s0:s1], cols_b[s0:s1]
                rest = tuple(a[s0:s1] for a in arrs[2:])
                if s1 - s0 < n_pad:
                    pad = n_pad - (s1 - s0)
                    rid = jnp.concatenate(
                        [rid, jnp.zeros((pad,), rid.dtype)]
                    )
                    cc = jnp.concatenate(
                        [cc, jnp.full((pad, K), pad_col, cc.dtype)]
                    )
                    rest = tuple(
                        jnp.concatenate(
                            [a, jnp.zeros((pad, K), a.dtype)]
                        )
                        for a in rest
                    )
            if unit:
                yh, yl = ell_bucket_spmm_dd(cc, x2j, n_block=n_block)
            else:
                yh, yl = ell_bucket_spmm_dd_valued(
                    cc, rest[0], rest[1], x2j, n_block=n_block
                )
            rids.append(rid)
            yhs.append(yh)
            yls.append(yl)
    if not rids:
        z = jnp.zeros((nrow, Npad), jnp.float32)
        return z, z
    rcat = jnp.concatenate(rids)
    Shi = (
        jnp.zeros((nrow, Npad), jnp.float32)
        .at[rcat].add(jnp.concatenate(yhs))
    )
    Slo = (
        jnp.zeros((nrow, Npad), jnp.float32)
        .at[rcat].add(jnp.concatenate(yls))
    )
    return Shi, Slo


@functools.partial(
    jax.jit,
    static_argnames=("nrow", "n_cols", "n_block", "budget", "unit",
                     "pad_cols"),
)
def _dd_all(seg_arrs, x2s, *, nrow, n_cols, n_block, budget, unit,
            pad_cols):
    """The WHOLE dd product (every segment + the dd merges + the output
    column trim) as ONE jitted dispatch.

    Round-4 ran one `_dd_segment` dispatch per segment: config 1 (13
    segments) paid ~13 tunnel dispatch gaps per product plus a full
    ``(nrow, Npad)`` fetch — the dominant share of its 0.310 s warm
    time. ``pad_cols``: per-segment unit-sentinel column (static).
    Returns ``(Yhi[:, :n_cols], Ylo[:, :n_cols])`` — trimmed on DEVICE
    so the host fetch moves only the real columns (config 1 fetched
    8x the needed bytes before)."""
    Yhi = None
    Ylo = None
    for arrs, x2j, pad_col in zip(seg_arrs, x2s, pad_cols):
        Shi, Slo = _dd_segment(
            arrs, x2j, nrow=nrow, n_block=n_block, budget=budget,
            unit=unit, pad_col=pad_col,
        )
        if Yhi is None:
            Yhi, Ylo = Shi, Slo
        else:
            Yhi, Ylo = _dd_add(Yhi, Ylo, Shi, Slo)
    return Yhi[:, :n_cols], Ylo[:, :n_cols]


def _ell_spmm_dd_valued(A, X):
    """fp64-class ``Y = A @ X`` for VALUED matrices (`DdEll`): values and
    operand both travel as two f32 planes; per-nonzero products run
    Dekker TwoProd + TwoSum (`ell_bucket_spmm_dd_valued`). rel ~1e-13.
    """
    import numpy as np

    from ..formats.ell import SegmentedEll

    nrow, ncol = A.shape
    Xh = np.asarray(X, np.float64)
    N = Xh.shape[1]
    # narrow lane blocks for narrow RHS: the old 128-lane floor padded an
    # N=1 product's Y/chunk-parts 128x — per-chunk scatters then rewrote
    # ~200 MB of Y per chunk and config 1 measured 14.4 s (VERDICT r3
    # missing #4). Mosaic accepts lane dims equal to the array's.
    n_block = min(_round_up(N, 8), 512)
    Npad = _round_up(N, n_block)

    hi_segs = (
        list(zip(A.hi.col_offsets, A.hi.segments))
        if isinstance(A.hi, SegmentedEll)
        else [(0, A.hi)]
    )
    lo_segs = (
        list(A.lo.segments) if isinstance(A.lo, SegmentedEll) else [A.lo]
    )
    seg_arrs, x2s = [], []
    for (off, sh), sl in zip(hi_segs, lo_segs):
        seg_ncol = sh.shape[1]
        rows_pad = _round_up(max(seg_ncol + 1, 8), 8)
        Xs = Xh[off : off + seg_ncol]
        xhi = Xs.astype(np.float32)
        xlo = (Xs - xhi).astype(np.float32)
        x2 = np.zeros((2 * rows_pad, Npad), np.float32)
        x2[:seg_ncol, :N] = xhi
        x2[rows_pad : rows_pad + seg_ncol, :N] = xlo
        x2s.append(jnp.asarray(x2))
        seg_arrs.append(
            tuple(
                (bh.row_ids, bh.cols, bh.vals, bl.vals)
                for bh, bl in zip(sh.buckets, sl.buckets)
            )
        )
    # every segment + merge + trim in ONE dispatch (`_dd_all`)
    Yhi, Ylo = _dd_all(
        tuple(seg_arrs), tuple(x2s), nrow=nrow, n_cols=N,
        n_block=n_block, budget=_SMEM_IDX_BUDGET_DD, unit=False,
        pad_cols=(0,) * len(seg_arrs),
    )
    return np.asarray(Yhi, np.float64) + np.asarray(Ylo, np.float64)


def ell_spmm_dd(A, X):
    """fp64-class ``Y = A @ X`` for unit-values (binary) matrices on f32
    hardware: the f64 operand splits into hi/lo f32 planes and every sum
    runs an error-free TwoSum chain (`ell_bucket_spmm_dd`). Returns
    float64, rel ~1e-13 vs a true fp64 product for moderate row lengths —
    under the 1e-10 parity bar (BASELINE.json:5) with no emulated-f64 ops.

    Accumulation is fully on device: within a segment every row lives in
    exactly one bucket (width bucketing), so scatters are single writes
    (exact); segment partials merge with `_dd_add`. Host work is the
    operand split and one final fetch.

    A: EllMatrix or SegmentedEll with ``unit_vals=True``; X: f64[ncol, N].
    """
    import numpy as np

    from ..formats.ell import DdEll

    if isinstance(A, DdEll):
        return _ell_spmm_dd_valued(A, X)

    nrow, ncol = A.shape
    Xh = np.asarray(X, np.float64)
    N = Xh.shape[1]
    # narrow lane blocks + one batched scatter per segment — see
    # `_ell_spmm_dd_valued` (the 128-lane floor and per-chunk scatters
    # were the config-1 14.4 s pathology)
    n_block = min(_round_up(N, 8), 512)
    Npad = _round_up(N, n_block)

    segs = (
        list(zip(A.col_offsets, A.segments))
        if isinstance(A, SegmentedEll)
        else [(0, A)]
    )
    seg_arrs, x2s, pad_cols = [], [], []
    for off, seg in segs:
        if not getattr(seg, "unit_vals", False):
            raise ValueError("ell_spmm_dd requires a binary (unit) matrix")
        if getattr(seg, "split_rows", 0):
            # exactness depends on one bucket row per matrix row per
            # segment (single-write scatters); split sub-row partials
            # would merge through a plain f32 scatter-add and lose the
            # compensated low words (~2^-24 rel, not 1e-13)
            raise ValueError(
                "ell_spmm_dd requires an unsplit layout: rebuild with "
                "build_ell(..., split_rows=0) (the fp64-class compile "
                "paths do this automatically)"
            )
        seg_ncol = seg.shape[1]
        rows_pad = _round_up(max(seg_ncol + 1, 8), 8)
        Xs = Xh[off : off + seg_ncol]
        hi = Xs.astype(np.float32)
        lo = (Xs - hi).astype(np.float32)
        x2 = np.zeros((2 * rows_pad, Npad), np.float32)
        x2[:seg_ncol, :N] = hi
        x2[rows_pad : rows_pad + seg_ncol, :N] = lo
        x2s.append(jnp.asarray(x2))
        seg_arrs.append(tuple((b.row_ids, b.cols) for b in seg.buckets))
        pad_cols.append(int(seg.shape[1]))
    # every segment + merge + trim in ONE dispatch (`_dd_all`); each real
    # row appears once per segment, padding rows add 0
    Yhi, Ylo = _dd_all(
        tuple(seg_arrs), tuple(x2s), nrow=nrow, n_cols=N,
        n_block=n_block, budget=_SMEM_IDX_BUDGET_UNIT, unit=True,
        pad_cols=tuple(pad_cols),
    )
    return np.asarray(Yhi, np.float64) + np.asarray(Ylo, np.float64)


def ell_spmm(A, X, *, n_block: int | None = None) -> jax.Array:
    """``Y = A @ X`` through the Pallas gather engine.

    A: EllMatrix or SegmentedEll (f32). X: f32[ncol, N].
    """
    X = jnp.asarray(X)
    nrow, ncol = A.shape
    N = X.shape[1]
    segs = (
        list(zip(A.col_offsets, A.segments))
        if isinstance(A, SegmentedEll)
        else [(0, A)]
    )
    if n_block is None:
        n_block = min(_round_up(N, LANES), 512)
        # the (rows, n_block) X panel must stay VMEM-resident: segments
        # were sized for n_block=128, so wide RHS (N=256, BASELINE's
        # range top) must sweep extra j panels instead of widening the
        # resident block past the budget (a 24k-col segment at nb=256 is
        # 24.6 MB — over the 16 MB scoped-vmem wall)
        max_rows = max(
            _round_up(max(s.shape[1] + 1, 8), 8) for _, s in segs
        )
        while n_block > LANES and max_rows * n_block * 4 > X_VMEM_BUDGET:
            n_block //= 2
    if N > n_block:
        # RHS wider than one resident panel: run per-column-chunk CALLS,
        # not a multi-j kernel sweep — the nj>1 path's plan assembly
        # (row gathers at >128 lanes) measured 14x slower (ecfp N=256:
        # 50.5 ms vs 2 x 3.5 at N=128; probed 2026-08-21)
        outs = [
            ell_spmm(A, X[:, j : j + n_block], n_block=n_block)
            for j in range(0, N, n_block)
        ]
        return jnp.concatenate(outs, axis=1)
    Npad = _round_up(N, n_block)
    rids, parts = [], []
    for off, seg in segs:
        seg_ncol = seg.shape[1]
        # +1: unit-mode sentinel column (ncol) must hit a zero row of X
        rows_pad = _round_up(max(seg_ncol + 1, 8), 8)
        Xseg = (
            jnp.zeros((rows_pad, Npad), jnp.float32)
            .at[:seg_ncol, :N]
            .set(X[off : off + seg_ncol])
        )
        _seg_parts(seg, Xseg, n_block, rids, parts)
    plan = getattr(A, "plan", None)
    if (
        parts
        and plan is not None
        and plan.layout_key == _assemble.layout_key()
        and plan.n_slots == sum(int(p.shape[0]) for p in parts)
    ):
        # scatter-free assembly: class-grouped gathers (ops.assemble)
        return _assemble.apply_plan(plan, jnp.concatenate(parts, axis=0))[
            :, :N
        ]
    Y = jnp.zeros((nrow, Npad), jnp.float32)
    if parts:
        Y = Y.at[jnp.concatenate(rids)].add(jnp.concatenate(parts, axis=0))
    return Y[:, :N]
