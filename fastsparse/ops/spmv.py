"""SpMV: ``y = A @ x`` and ``y = A.T @ x`` for every format.

Covers the reference kernels ``A_mul_B`` / ``At_mul_B`` (COO, SURVEY.md §2
R3-R4) and ``bcsr_A_mul_B`` / ``bcsr_At_mul_B`` (CSR, R5). The OpenMP row
loop of §3.2 becomes, per format:

* COO/CSR — a fused gather(``x[cols]``) × vals → scatter-add(``rows``),
  compiled by XLA into its native gather/scatter kernels;
* ELL — per-bucket dense ``(nb, K)`` gather-multiply-rowsum, one compiled
  program per bucket width;
* tiled BSR — Pallas MXU kernels (`ops.pallas`), dispatched from
  `ops.bsr_ops`.

Transpose products never scatter down columns of the same tiling; callers
that need fast ``Aᵀ·x`` precompute a transpose tiling (SURVEY.md §7.3 item
5 — "avoid scatter in Aᵀ·x via dual tilings"). The COO/CSR fallbacks here
are correctness engines that do scatter.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.coo import COO, BinaryCOO
from ..formats.csr import CSR, BinaryCSR
from ..formats.ell import EllMatrix

__all__ = ["spmv", "spmv_t"]


def _coo_like(mat):
    """(rows, cols, vals) with padding already zeroed, for COO/CSR inputs."""
    if isinstance(mat, (COO, CSR)):
        return mat.rows, mat.cols, mat.vals
    if isinstance(mat, (BinaryCOO, BinaryCSR)):
        return mat.rows, mat.cols, None
    raise TypeError(f"unsupported format {type(mat).__name__}")


def spmv(A, x):
    """``y = A @ x``. ``x``: dtype[ncol] → dtype[nrow]."""
    x = jnp.asarray(x)
    from ..formats.bsr import BsrMatrix
    from ..formats.ell import SegmentedEll
    from ..formats.hybrid import HybridMatrix
    from ..formats.segmented import ColSegmented

    if isinstance(A, HybridMatrix):
        y = jnp.zeros((A.shape[0],), x.dtype)
        if A.dense is not None:
            y = y + spmv(A.dense, x)
        if A.sparse is not None:
            y = y + spmv(A.sparse, x)
        if A.dense_cols is not None:
            from .spmm import dense_cols_spmm

            y = y + dense_cols_spmm(A.dense_cols, x[:, None])[:, 0]
        return y
    if isinstance(A, ColSegmented):
        if A.segments and isinstance(A.segments[0], BsrMatrix):
            from .bsr_ops import colseg_spmm

            # narrow packing makes the 1-column case one MXU pass/strip
            y = colseg_spmm(A, x[:, None])
            if y is not None:
                return y[:, 0]
        y = jnp.zeros((A.shape[0],), x.dtype)
        for off, seg in zip(A.col_offsets, A.segments):
            y = y + spmv(seg, x[off : off + seg.shape[1]])
        return y
    if isinstance(A, BsrMatrix):
        from .bsr_ops import bsr_spmv

        return bsr_spmv(A, x)
    if isinstance(A, (EllMatrix, SegmentedEll)):
        from .ell_ops import gather_engine_fits, gather_engine_supported

        seg_ncol = (
            A.seg_cols if isinstance(A, SegmentedEll) else A.shape[1]
        )
        if (
            jax.default_backend() == "tpu"
            and gather_engine_supported(
                jnp.result_type(
                    (
                        A.segments[0] if isinstance(A, SegmentedEll) else A
                    ).dtype,
                    x.dtype,
                )
            )
            and gather_engine_fits(seg_ncol, 1)
        ):
            # One VREG row-load per nonzero costs the same at N=1 as at
            # N=128 — run SpMV through the gather SpMM kernel.
            from .ell_ops import ell_spmm

            return ell_spmm(A, x[:, None])[:, 0]
    if isinstance(A, SegmentedEll):
        y = jnp.zeros((A.shape[0],), x.dtype)
        for off, seg in zip(A.col_offsets, A.segments):
            y = y + spmv(seg, x[off : off + seg.shape[1]])
        return y
    if isinstance(A, EllMatrix):
        y = jnp.zeros((A.shape[0],), jnp.result_type(A.dtype, x.dtype))
        for b in A.buckets:
            contrib = (b.vals * x[b.cols]).sum(axis=1)
            y = y.at[b.row_ids].add(contrib)
        return y
    rows, cols, vals = _coo_like(A)
    gathered = x[cols]
    if vals is None:  # binary: mask padding instead of multiplying
        gathered = jnp.where(A.valid_mask(), gathered, 0)
    else:
        gathered = vals * gathered
    return jnp.zeros((A.shape[0],), gathered.dtype).at[rows].add(gathered)


def spmv_t(A, x):
    """``y = A.T @ x``. ``x``: dtype[nrow] → dtype[ncol].

    For ELL this is the scatter fallback; prefer a precomputed transpose
    tiling (`linops.SparseOperator`, built with ``transpose=True``) on the
    hot path.
    """
    x = jnp.asarray(x)
    from ..formats.bsr import BsrMatrix
    from ..formats.ell import SegmentedEll

    from ..formats.hybrid import HybridMatrix
    from ..formats.segmented import ColSegmented

    if isinstance(A, (BsrMatrix, ColSegmented, HybridMatrix)):
        raise TypeError(
            "tiled formats have no transpose-scatter path; build the dual "
            "tiling via fastsparse.operator(..., transpose=True) instead"
        )
    if isinstance(A, SegmentedEll):
        parts = [
            spmv_t(seg, x) for seg in A.segments
        ]
        y = jnp.zeros((A.shape[1],), x.dtype)
        for off, seg, part in zip(A.col_offsets, A.segments, parts):
            y = y.at[off : off + seg.shape[1]].add(part)
        return y
    if isinstance(A, EllMatrix):
        y = jnp.zeros((A.shape[1],), jnp.result_type(A.dtype, x.dtype))
        for b in A.buckets:
            contrib = b.vals * x[b.row_ids][:, None]
            y = y.at[b.cols].add(contrib)
        return y
    rows, cols, vals = _coo_like(A)
    gathered = x[rows]
    if vals is None:
        gathered = jnp.where(A.valid_mask(), gathered, 0)
    else:
        gathered = vals * gathered
    return jnp.zeros((A.shape[1],), gathered.dtype).at[cols].add(gathered)
