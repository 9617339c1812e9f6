"""Format validation & debug checks (SURVEY.md §5.2).

Races are impossible in XLA's functional model; the failure modes that
remain are *structural* — out-of-range indices, inconsistent bucket
shapes, broken padding invariants — which silently corrupt results via
clamped gathers / dropped scatters. `validate(A)` checks every invariant
host-side and raises with a precise message; use it after custom format
construction or deserialization (`io.npz_cache`). Kernel-level debugging:
run on CPU (Pallas interpret mode is automatic off-TPU) or wrap calls in
`jax.experimental.checkify` for traced bounds checks.
"""
from __future__ import annotations

import numpy as np

from ..formats.bsr import BsrMatrix
from ..formats.coo import COO, BinaryCOO
from ..formats.csr import CSR, BinaryCSR
from ..formats.ell import EllMatrix, SegmentedEll
from ..formats.hybrid import HybridMatrix
from ..formats.segmented import ColSegmented

__all__ = ["validate"]


class FormatError(AssertionError):
    pass


def _check(cond, msg):
    if not cond:
        raise FormatError(msg)


def validate(A) -> None:
    """Raise FormatError if ``A`` violates its format's invariants."""
    if isinstance(A, (COO, BinaryCOO)):
        nrow, ncol = A.shape
        rows = np.asarray(A.rows)[: A.n_valid]
        cols = np.asarray(A.cols)[: A.n_valid]
        _check(A.n_valid <= A.nnz_cap, "n_valid exceeds capacity")
        if rows.size:
            _check(rows.min() >= 0 and rows.max() < nrow, "row id out of range")
            _check(cols.min() >= 0 and cols.max() < ncol, "col id out of range")
            if getattr(A, "row_sorted", False):
                _check(
                    (np.diff(rows) >= 0).all(),
                    "row_sorted flag set but rows not ascending",
                )
        return
    if isinstance(A, (CSR, BinaryCSR)):
        nrow, ncol = A.shape
        rp = np.asarray(A.row_ptr)
        _check(rp.shape == (nrow + 1,), "row_ptr shape")
        _check(rp[0] == 0 and rp[-1] == A.n_valid, "row_ptr endpoints")
        _check((np.diff(rp) >= 0).all(), "row_ptr not monotone")
        cols = np.asarray(A.cols)[: A.n_valid]
        if cols.size:
            _check(cols.min() >= 0 and cols.max() < ncol, "col id out of range")
        return
    if isinstance(A, EllMatrix):
        nrow, ncol = A.shape
        col_hi = ncol + 1 if A.unit_vals else ncol
        for b in A.buckets:
            _check(b.cols.shape == (b.nb, b.width), "bucket cols shape")
            _check(b.vals.shape == (b.nb, b.width), "bucket vals shape")
            _check(b.nb % 8 == 0, "bucket nb not sublane aligned")
            rid = np.asarray(b.row_ids)
            _check(
                rid.min() >= 0 and rid.max() < max(nrow, 1),
                "ELL row id out of range",
            )
            cc = np.asarray(b.cols)
            _check(
                cc.min() >= 0 and cc.max() < max(col_hi, 1),
                "ELL col id out of range",
            )
        return
    if isinstance(A, BsrMatrix):
        from ..formats.bsr import (
            MonoGroupBucket,
            MonoPanelBucket,
            PanelBucket,
        )

        nsp, nsl = A.n_strips, A.n_slabs
        for b in A.buckets:
            if isinstance(b, MonoGroupBucket):
                _check(b.ns % b.group == 0, "mono-group ns not G-aligned")
                _check(
                    b.ns >= nsp, "mono-group must cover every strip"
                )
                gwv = np.asarray(b.windows)
                _check(
                    gwv.min() >= 0 and gwv.max() < b.n_windows,
                    "mono-group window out of range",
                )
                st = np.asarray(b.start_rel)
                _check(
                    st.min() >= 0 and (st + b.width).max() <= b.win_slabs,
                    "mono-group panel leaves its window",
                )
                last = (
                    (b.width * A.tile_k) // 32
                    if A.binary
                    else b.width * A.tile_k
                )
                _check(
                    b.panels.shape == (b.ns, A.tile_m, last),
                    "mono-group panel block shape",
                )
                continue
            if isinstance(b, MonoPanelBucket):
                sid = np.asarray(b.strip_ids)
                if b.strip_map is not None:
                    # side bucket: local strips, mapped into [0, nsp)
                    cover = b.out_strips
                    smap = np.asarray(b.strip_map)
                    _check(
                        smap.min() >= 0 and smap.max() < nsp,
                        "mono side strip_map out of range",
                    )
                    _check(
                        smap.size == cover,
                        "mono side strip_map size mismatch",
                    )
                else:
                    cover = max(b.out_strips, nsp)
                _check(
                    sid.min() >= 0 and sid.max() < cover,
                    "mono strip id out of range",
                )
                _check((np.diff(sid) >= 0).all(), "mono items not sorted")
                fst = np.asarray(b.first)
                starts = np.ones(sid.size, bool)
                starts[1:] = sid[1:] != sid[:-1]
                _check((fst == starts).all(), "mono first flags wrong")
                _check(
                    np.unique(sid).size == cover,
                    "mono items must cover every output strip "
                    "(incl. chain padding)",
                )
                win = np.asarray(b.window)
                st = np.asarray(b.start_rel)
                _check(
                    win.min() >= 0 and win.max() < b.n_windows,
                    "mono window out of range",
                )
                _check(
                    st.min() >= 0 and (st + b.width).max() <= b.win_slabs,
                    "mono panel leaves its window",
                )
                last = (
                    (b.width * A.tile_k) // 32
                    if A.binary
                    else b.width * A.tile_k
                )
                _check(
                    b.panels.shape == (b.ns, A.tile_m, last),
                    "mono panel block shape",
                )
                continue
            if isinstance(b, PanelBucket):
                _check(b.ns % 8 == 0, "panel ns not group aligned")
                sid = np.asarray(b.strip_ids)
                _check(
                    sid.min() >= 0 and sid.max() <= nsp,
                    "strip id out of range (dump strip is n_strips)",
                )
                st = np.asarray(b.start_slab)
                _check(
                    st.min() >= 0 and (st + b.width).max() <= max(nsl, b.width),
                    "panel start slab out of range",
                )
                last = (b.width * A.tile_k) // 32 if A.binary else b.width * A.tile_k
                _check(
                    b.panels.shape == (b.ns, A.tile_m, last),
                    "panel block shape",
                )
                continue
            _check(
                b.slab_ids.shape == (b.ns, b.ntiles), "bucket slab_ids shape"
            )
            sid = np.asarray(b.strip_ids)
            _check(
                sid.min() >= 0 and sid.max() <= nsp,
                "strip id out of range (dump strip is n_strips)",
            )
            sl = np.asarray(b.slab_ids)
            _check(
                sl.min() >= 0 and sl.max() < max(nsl, 1),
                "slab id out of range",
            )
            _check(
                b.tiles.shape[:2] == (b.ns, b.ntiles), "tiles leading shape"
            )
        return
    if isinstance(A, (SegmentedEll, ColSegmented)):
        offs = A.col_offsets
        _check(len(offs) == len(A.segments), "offsets/segments mismatch")
        end = 0
        for off, seg in zip(offs, A.segments):
            _check(off == end, "segments not contiguous")
            end = off + seg.shape[1]
            validate(seg)
        _check(end == A.shape[1], "segments do not cover all columns")
        return
    if isinstance(A, HybridMatrix):
        if A.dense is not None:
            validate(A.dense)
        if A.sparse is not None:
            validate(A.sparse)
        dc = getattr(A, "dense_cols", None)
        if dc is not None:
            cid = np.asarray(dc.col_ids)
            nc = dc.n_cols if dc.n_cols >= 0 else cid.size
            _check(
                cid.min() >= 0 and cid.max() < A.shape[1],
                "dense-col id out of range",
            )
            _check(
                (np.diff(cid[:nc]) > 0).all(),
                "dense-col ids not ascending",
            )
            blk = np.asarray(dc.block)
            _check(
                blk.shape[1] == cid.size
                and blk.shape[0] >= A.shape[0]
                and blk.shape[0] % 256 == 0,
                "dense-col block shape",
            )
            _check(
                not blk[A.shape[0]:].any(), "dense-col row padding not zero"
            )
            _check(cid.size % 128 == 0, "dense-col D not lane padded")
            _check(
                not blk[:, nc:].any(), "dense-col padding not zero"
            )
            _check(
                np.isin(blk, (0, 1)).all(), "dense-col block not 0/1"
            )
            _check(int(blk.sum()) == dc.nnz, "dense-col nnz mismatch")
        return
    raise TypeError(f"unsupported format {type(A).__name__}")
