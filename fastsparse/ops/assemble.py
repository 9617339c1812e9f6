"""Gather-plan Y assembly for the ELL engine.

`ell_spmm` collects per-bucket (and per-chunk) row panels and must combine
them into Y. The fallback is one big ``Y.at[rids].add(parts)`` — a
duplicate-index scatter-add whose XLA lowering rewrites the whole Y buffer
(measured ~285 µs per rewrite on a 134 MB Y; see CLAUDE.md session-2
notes). This module replaces it with *static gathers*, possible because the
slot layout (which output row every part-slot feeds) is fully determined at
format-build time:

* group output rows by **multiplicity** (how many real part-slots feed
  them — one per column segment the row touches);
* per multiplicity class ``c``: ``Yc = Σ_{s<c} parts_cat[pos_c[:, s]]`` —
  row gathers, traffic equal to the real slots, no scatter;
* one final row gather ``Y = concat(Yc..., zero_row)[rowpos]`` maps class
  order back to matrix order (rows with no nonzeros hit the zero row).

The reference's analogous trick is row-block ownership making COO SpMV
scatter-free (SURVEY.md §3.4); here ownership is precomputed per row at
convert time instead of per thread at run time.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field

__all__ = [
    "AssemblyPlan",
    "attach_plan",
    "build_assembly_plan",
    "apply_plan",
]


def attach_plan(fmt):
    """Return ``fmt`` with assembly plans attached where the engines can
    use them: f32 EllMatrix / SegmentedEll get an :class:`AssemblyPlan`
    (class-grouped gathers), BsrMatrix gets a :class:`BsrStripPlan`
    (strip gather); hybrid/column-segmented containers recurse. Other
    formats pass through unchanged."""
    import dataclasses

    from ..formats.bsr import BsrMatrix
    from ..formats.ell import EllMatrix, SegmentedEll

    if fmt is None:
        return None
    if type(fmt).__name__ == "HybridMatrix":
        return dataclasses.replace(
            fmt,
            dense=attach_plan(fmt.dense),
            sparse=attach_plan(fmt.sparse),
        )
    if type(fmt).__name__ == "ColSegmented":
        fmt = dataclasses.replace(
            fmt, segments=tuple(attach_plan(s) for s in fmt.segments)
        )
        if (
            getattr(fmt, "plan", None) is None
            and fmt.segments
            and all(isinstance(s, BsrMatrix) for s in fmt.segments)
            and all(
                b.strip_ids.ndim == 1 for s in fmt.segments for b in s.buckets
            )
        ):
            fmt = dataclasses.replace(fmt, plan=build_colseg_plan(fmt))
        return fmt
    if isinstance(fmt, BsrMatrix) and fmt.strip_plan is None:
        if fmt.is_mono:
            return fmt  # mono kernels write Y in place — no plan needed
        # stacked multi-shard containers (leading device axes on
        # strip_ids) assemble inside shard_map — skip those
        if all(b.strip_ids.ndim == 1 for b in fmt.buckets):
            return dataclasses.replace(
                fmt, strip_plan=build_strip_plan(fmt)
            )
        return fmt
    if isinstance(fmt, (EllMatrix, SegmentedEll)) and getattr(
        fmt, "plan", None
    ) is None:
        segs = fmt.segments if isinstance(fmt, SegmentedEll) else (fmt,)
        if all(s.dtype == jnp.float32 for s in segs):
            return dataclasses.replace(fmt, plan=build_assembly_plan(fmt))
    return fmt


@pytree_dataclass
class BsrStripPlan:
    """Strip-gather schedule for `bsr_spmm`: ``pos[s]`` is the row of the
    concatenated per-chunk strip panels holding strip ``s``'s output
    (strips are disjoint across buckets), or the appended zero panel for
    empty strips. ``n_parts`` = total panel rows the plan expects.

    ``row_pos`` (when present) is the row-granular version: position of
    output row ``r`` in the flattened ``(n_parts*TM, Npad)`` parts array
    (sentinel ``n_parts*TM`` = appended zero row). One gather over it
    produces the EXACT ``(nrow, Npad)`` output — the strip-level gather +
    separate ``[:nrow]`` trim cost a full extra Y rewrite (~36 µs/iter on
    the 2026-08-19 headline trace, docs/TRACE.md)."""

    pos: jax.Array  # int32[n_strips]
    n_parts: int = static_field()
    layout_key: Tuple = static_field()
    row_pos: Any = None  # int32[nrow] | None


def bsr_layout_key():
    from . import bsr_ops as bo

    return (bo._SMEM_IDX_BUDGET,)


def build_strip_plan(A) -> BsrStripPlan:
    """Host-side strip plan: one strip_ids fetch per bucket."""
    from . import bsr_ops as bo

    nsp = A.n_strips
    pos = np.full((nsp,), -1, np.int64)
    off = 0
    cur_b, sid_full = None, None
    for b, s0, s1, n_pad in bo._bsr_layout(A):
        if b is not cur_b:
            cur_b = b
            sid_full = np.asarray(b.strip_ids)
        sid = sid_full[s0:s1]
        real = sid < nsp  # padding bucket slots point at the dump strip
        pos[sid[real]] = off + np.nonzero(real)[0]
        off += n_pad
    pos[pos < 0] = off  # zero-panel sentinel for empty strips
    rp = _row_positions(pos[None, :], off, A.tile_m, A.shape[0])
    return BsrStripPlan(
        pos=jnp.asarray(pos.astype(np.int32)),
        n_parts=int(off),
        layout_key=bsr_layout_key(),
        row_pos=rp[0] if rp else None,
    )


def _row_positions(slot_of_strip, n_parts, TM, nrow):
    """Strip-level slot positions -> per-output-row gather indices.

    ``slot_of_strip`` int[n_levels, n_strips] (sentinel ``n_parts`` =
    absent); returns a tuple of int32[nrow] arrays, one per level, indexing
    the flattened ``(n_parts*TM + 1, Npad)`` parts array (last row = zeros).
    Returns None when the flat index would overflow int32."""
    if (n_parts + 1) * TM >= 2**31:
        return None
    r = np.arange(nrow, dtype=np.int64)
    s, q = r // TM, r % TM
    out = []
    for lvl in np.asarray(slot_of_strip, np.int64):
        src = np.where(lvl[s] < n_parts, lvl[s] * TM + q, n_parts * TM)
        out.append(jnp.asarray(src.astype(np.int32)))
    return tuple(out)


@pytree_dataclass
class AssemblyPlan:
    """Static gather schedule from part-slots to output rows.

    ``classes[k]`` is int32[n_k, widths[k]]: positions into the
    concatenated parts array of the rows with multiplicity ``widths[k]``,
    in the class's row order. ``rowpos`` is int32[nrow]: position of each
    output row in the class-concatenated panel, ``n_total`` (a zero row
    appended by `apply_plan`) for empty rows. ``layout_key`` guards against
    the chunking budgets changing between plan build and trace — on
    mismatch callers must fall back to the scatter path.
    """

    classes: Tuple[jax.Array, ...]
    rowpos: jax.Array
    widths: Tuple[int, ...] = static_field()
    n_slots: int = static_field()  # rows of parts_cat the plan was built for
    layout_key: Tuple = static_field()
    # Row-granular variant (colseg strip plans only): ``row_srcs[m][r]`` is
    # output row ``r``'s m-th contribution in the flattened
    # ``(n_slots*TM + 1, Npad)`` parts array (sentinel = the zero row).
    # Σ_m one gather each produces the EXACT (nrow, Npad) output — no
    # strip-level intermediate, no separate [:nrow] trim pass.
    row_srcs: Tuple[Any, ...] = ()


def _slot_stream(A):
    """Host view of the part-slot layout: yields per appended part a
    (row_ids, valid) numpy pair, in exactly the order `ell_spmm` appends
    compute parts. Both consume `ops.ell_ops._seg_layout` — THE single
    layout source — so they cannot drift. Host cost: ONE row_ids fetch
    per bucket (~nb int32), zero cols/vals traffic, zero device slicing."""
    from . import ell_ops as eo
    from ..formats.ell import SegmentedEll

    segs = A.segments if isinstance(A, SegmentedEll) else [A]
    for seg in segs:
        unit = getattr(seg, "unit_vals", False)
        sentinel = seg.shape[1]
        cur_b, rid_full, valid_full = None, None, None
        for b, mode, s0, s1, n_pad in eo._seg_layout(seg):
            # sweep items merge sub-parts into one compute part whose
            # rows are the sub-parts CONCATENATED in order — the slot
            # stream is identical to yielding each sub-part separately
            subs = b if mode == "sweep" else ((b, s0, s1, n_pad),)
            for bb, t0, t1, np_ in subs:
                if bb is not cur_b:
                    cur_b = bb
                    rid_full = np.asarray(bb.row_ids)
                    valid_full = _valid_mask(bb, unit, sentinel)
                n = t1 - t0
                if t0 == 0 and t1 == len(rid_full) and np_ == t1:
                    # part covers the whole bucket exactly
                    yield rid_full, valid_full
                    continue
                rid = np.zeros(np_, rid_full.dtype)
                rid[:n] = rid_full[t0:t1]
                valid = np.zeros(np_, bool)
                valid[:n] = valid_full[t0:t1]
                yield rid, valid


def _valid_mask(b, unit, sentinel):
    """Per-slot liveness. `n_real` (static, recorded by build_ell) avoids
    fetching the bucket's cols/vals — through the remote tunnel those are
    the format's bulk (~MBs); row_ids alone are ~nb ints."""
    if getattr(b, "n_real", -1) >= 0:
        return np.arange(b.cols.shape[0]) < b.n_real
    if unit:
        return (np.asarray(b.cols) != sentinel).any(axis=1)
    return (np.asarray(b.vals) != 0).any(axis=1)


def layout_key():
    """Current chunking-budget state; plans are valid only under the
    budgets they were built with (tests monkeypatch them). The trailing
    literal versions the layout algorithm itself (round 5: sweep
    grouping of packed sub-parts)."""
    from . import ell_ops as eo

    return (
        eo._SMEM_IDX_BUDGET_UNIT,
        eo._SMEM_IDX_BUDGET_VALUED,
        eo.SMEM_BLOCK_K_UNIT,
        eo.SMEM_BLOCK_K_VALUED,
        eo.USE_SMEM_PATH,
        eo.USE_SWEEP,
        "sweep1",
    )


def _classes_from_slots(rid_all, valid_all, nrow):
    """Group part-slot positions by output row and multiplicity.

    Returns ``(classes, widths, rowpos)`` — the core of every gather-plan:
    ``classes[k]`` int32[n_k, widths[k]] slot positions per row of
    multiplicity ``widths[k]``; ``rowpos`` int32[nrow] position in the
    class-concatenated output (sentinel = total = appended zero row)."""
    pos_all = np.nonzero(valid_all)[0]
    rows = rid_all[pos_all]
    # group slot positions by output row
    order = np.argsort(rows, kind="stable")
    rows_s, pos_s = rows[order], pos_all[order]
    counts = np.bincount(rows_s.astype(np.int64), minlength=nrow)
    uniq_rows = np.unique(rows_s)
    starts = np.concatenate([[0], np.cumsum(counts[uniq_rows])[:-1]])

    classes, widths, rowpos = [], [], np.full((nrow,), -1, np.int64)
    out_off = 0
    for c in np.unique(counts[uniq_rows]):
        sel = counts[uniq_rows] == c
        rws = uniq_rows[sel]
        st = starts[sel]
        pos_c = pos_s[st[:, None] + np.arange(c)[None, :]]
        classes.append(jnp.asarray(pos_c.astype(np.int32)))
        widths.append(int(c))
        rowpos[rws] = out_off + np.arange(len(rws))
        out_off += len(rws)
    rowpos[rowpos < 0] = out_off  # zero-row sentinel
    return classes, widths, rowpos


def build_assembly_plan(A) -> AssemblyPlan:
    """Host-side plan build (one pass over the format's index arrays)."""
    nrow = A.shape[0]
    rids, valids = [], []
    for rid, valid in _slot_stream(A):
        rids.append(rid.astype(np.int64))
        valids.append(valid)
    if rids:
        rid_all = np.concatenate(rids)
        valid_all = np.concatenate(valids)
    else:
        rid_all = np.zeros((0,), np.int64)
        valid_all = np.zeros((0,), bool)
    n_slots = len(rid_all)

    classes, widths, rowpos = _classes_from_slots(rid_all, valid_all, nrow)
    return AssemblyPlan(
        classes=tuple(classes),
        rowpos=jnp.asarray(rowpos.astype(np.int32)),
        widths=tuple(widths),
        n_slots=n_slots,
        layout_key=layout_key(),
    )


def colseg_layout_key():
    return ("colseg",) + bsr_layout_key()


def build_colseg_plan(A) -> AssemblyPlan:
    """Cross-segment strip plan for a ColSegmented of BsrMatrix.

    A row-strip appears once per column segment its nonzeros touch; the
    per-segment SpMM calls emit one (TM, Npad) panel per part slot. This
    plan assembles Y with multiplicity-class gathers over the concatenated
    panels — replacing ``nseg`` full-Y additions (each an nrow×N HBM
    rewrite) with traffic proportional to the real strip panels."""
    from . import bsr_ops as bo

    nsp = A.segments[0].n_strips
    sids, valids = [], []
    for seg in A.segments:
        cur_b, sid_full = None, None
        for b, s0, s1, n_pad in bo._bsr_layout(seg):
            if b is not cur_b:
                cur_b = b
                sid_full = np.asarray(b.strip_ids).astype(np.int64)
            sid = np.zeros(n_pad, np.int64)
            sid[: s1 - s0] = sid_full[s0:s1]
            valid = np.zeros(n_pad, bool)
            valid[: s1 - s0] = sid_full[s0:s1] < nsp
            sids.append(sid)
            valids.append(valid)
    rid_all = np.concatenate(sids) if sids else np.zeros((0,), np.int64)
    valid_all = (
        np.concatenate(valids) if valids else np.zeros((0,), bool)
    )
    classes, widths, rowpos = _classes_from_slots(rid_all, valid_all, nsp)

    # Row-granular schedule: slot position of each strip's m-th part.
    n_slots = len(rid_all)
    pos_all = np.nonzero(valid_all)[0]
    strips = rid_all[pos_all]
    order = np.argsort(strips, kind="stable")
    ss, ps = strips[order], pos_all[order]
    counts = np.bincount(ss.astype(np.int64), minlength=nsp)
    starts = np.zeros(nsp, np.int64)
    np.cumsum(counts[:-1], out=starts[1:])
    maxm = int(counts.max()) if counts.size else 0
    slot_of_strip = np.full((max(maxm, 1), nsp), n_slots, np.int64)
    for m in range(maxm):
        sel = counts > m
        slot_of_strip[m, sel] = ps[starts[sel] + m]
    row_srcs = _row_positions(
        slot_of_strip, n_slots, A.segments[0].tile_m, A.shape[0]
    )
    return AssemblyPlan(
        classes=tuple(classes),
        rowpos=jnp.asarray(rowpos.astype(np.int32)),
        widths=tuple(widths),
        n_slots=n_slots,
        layout_key=colseg_layout_key(),
        row_srcs=row_srcs or (),
    )


def apply_plan(plan: AssemblyPlan, parts_cat: jax.Array) -> jax.Array:
    """parts_cat f32[n_slots, Npad] -> Y f32[nrow, Npad] via the plan's
    gathers (no scatter)."""
    npad = parts_cat.shape[1]
    ys = []
    for c, pos_c in zip(plan.widths, plan.classes):
        yc = parts_cat[pos_c[:, 0]]
        for s in range(1, c):
            yc = yc + parts_cat[pos_c[:, s]]
        ys.append(yc)
    ys.append(jnp.zeros((1, npad), parts_cat.dtype))
    ycat = jnp.concatenate(ys, axis=0)
    return ycat[plan.rowpos]
