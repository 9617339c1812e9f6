"""Multi-RHS SpMM: ``Y = A @ X`` and ``Y = A.T @ X``.

The reference's keystone optimization was the unrolled multi-column CSR
kernel (``bcsr_A_mul_B2/4/n``, SURVEY.md §3.3) that amortizes index traffic
over several right-hand sides. On TPU the same economics hold with much
wider panels: each gathered X row is a full 128-lane vector, so index bytes
are amortized 128-512x. The XLA engines here stream nonzeros in fixed-size
chunks (static shapes; nnz-proportional HBM traffic); the MXU-fed Pallas
path lives in `ops.pallas.bsr_spmm` for tiled BSR.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.coo import COO, BinaryCOO
from ..formats.csr import CSR, BinaryCSR
from ..formats.ell import EllMatrix

__all__ = ["spmm", "spmm_t", "spmm_dd"]

_CHUNK = 32768  # nonzeros per scan step in the streaming COO engine


def _pad_to_chunks(a, chunk, fill=0):
    n = a.shape[0]
    pad = (-n) % chunk
    if pad:
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1), constant_values=fill)
    return a.reshape(-1, chunk, *a.shape[1:])


def _coo_arrays(A):
    if isinstance(A, (COO, CSR)):
        return A.rows, A.cols, A.vals
    if isinstance(A, (BinaryCOO, BinaryCSR)):
        return A.rows, A.cols, A.valid_mask().astype(jnp.float32)
    raise TypeError(f"unsupported format {type(A).__name__}")


def _stream_scatter(rows, cols, vals, X, n_out):
    """acc[n_out, N] += vals[k] * X[cols[k]] at rows[k], chunked over k."""
    chunk = min(_CHUNK, max(int(rows.shape[0]), 1))
    r = _pad_to_chunks(rows, chunk)
    c = _pad_to_chunks(cols, chunk)
    v = _pad_to_chunks(vals, chunk)
    acc = jnp.zeros((n_out, X.shape[1]), jnp.result_type(vals.dtype, X.dtype))

    def step(acc, rcv):
        rk, ck, vk = rcv
        return acc.at[rk].add(vk[:, None] * X[ck]), None

    acc, _ = jax.lax.scan(step, acc, (r, c, v))
    return acc


# fp32-parity dot for the dense-column block: "i8" = radix-256 int8
# planes (3 s8xs8->s32 passes — 2x the bf16 MXU rate on v5e), "bf16" =
# 3 bf16 planes (fallback if XLA's s8 dot lowering underperforms).
DENSECOLS_DOT = "i8"


def dense_cols_spmm(dc, X, precision: str = "highest"):
    """``Y += block @ X[col_ids]`` for a `formats.hybrid.DenseCols`.

    The block is 0/1 int8 (exact in bf16); fp32 parity comes from the
    same 3-plane X encodings the mono kernel uses (radix-256 int8 planes
    or bf16 split — `ops.bsr_ops`). Runs as plain XLA dots: a dense
    (nrow, D) @ (D, N) contraction is exactly what the compiler already
    tiles optimally onto the MXU.
    """
    Xs = X[dc.col_ids]  # (D, N) — D is small; gather cost negligible
    B = dc.block
    nrow = dc.shape[0]
    parity = precision == "highest" and X.dtype == jnp.float32
    if not parity:
        return jnp.dot(
            B.astype(jnp.bfloat16),
            Xs.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        ).astype(X.dtype)[:nrow]
    # ONE pass over the block (rmat s18: 259 MB int8 — the dominant
    # operand): a per-plane dot would stream it three times, and the
    # XLA single-dot form materializes a (nrow, 3N) fold intermediate;
    # the Pallas kernel folds in-register.
    N = Xs.shape[1]
    if DENSECOLS_DOT == "i8":
        from .bsr_ops import _quant3_carry

        q0, q1, q2, s = _quant3_carry(Xs)
        q3 = jnp.concatenate(
            [q.astype(jnp.int8) for q in (q0, q1, q2)], axis=1
        )
        if N % 128 == 0:
            from .pallas.bsr_spmm import densecols_spmm_pallas

            s8 = jnp.broadcast_to(s, (8, N))
            return densecols_spmm_pallas(B, q3, s8)[:nrow]
        d = jax.lax.dot_general(
            B, q3, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32)
        return (
            d[:, :N] * 65536.0 + d[:, N : 2 * N] * 256.0 + d[:, 2 * N :]
        )[:nrow] * s
    from .bsr_ops import _split_bf16_planes

    x0, x1, x2 = _split_bf16_planes(Xs)
    x3 = jnp.concatenate([x0, x1, x2], axis=1)
    Bb = B.astype(jnp.bfloat16)
    d = jnp.dot(Bb, x3, preferred_element_type=jnp.float32)
    return (d[:, :N] + d[:, N : 2 * N] + d[:, 2 * N :])[:nrow]


def spmm(A, X):
    """``Y = A @ X``. ``X``: dtype[ncol, N] → dtype[nrow, N]."""
    X = jnp.asarray(X)
    from ..formats.bsr import BsrMatrix
    from ..formats.ell import SegmentedEll
    from ..formats.hybrid import HybridMatrix
    from ..formats.segmented import ColSegmented

    if isinstance(A, HybridMatrix):
        Y = jnp.zeros((A.shape[0], X.shape[1]), X.dtype)
        if A.dense is not None:
            Y = Y + spmm(A.dense, X)
        if A.sparse is not None:
            Y = Y + spmm(A.sparse, X)
        if A.dense_cols is not None:
            Y = Y + dense_cols_spmm(A.dense_cols, X)
        return Y
    if isinstance(A, ColSegmented):
        if A.segments and isinstance(A.segments[0], BsrMatrix):
            from .bsr_ops import colseg_spmm

            Y = colseg_spmm(A, X)
            if Y is not None:
                return Y
        Y = jnp.zeros((A.shape[0], X.shape[1]), X.dtype)
        for off, seg in zip(A.col_offsets, A.segments):
            Y = Y + spmm(seg, X[off : off + seg.shape[1]])
        return Y
    if isinstance(A, BsrMatrix):
        from .bsr_ops import bsr_spmm

        return bsr_spmm(A, X)
    if isinstance(A, SegmentedEll):
        from .ell_ops import ell_spmm, gather_engine_supported

        seg_dtype = jnp.result_type(A.segments[0].dtype, X.dtype)
        if gather_engine_supported(seg_dtype):
            return ell_spmm(A, X)
        Y = jnp.zeros((A.shape[0], X.shape[1]), seg_dtype)
        for off, seg in zip(A.col_offsets, A.segments):
            Y = Y + spmm(seg, X[off : off + seg.shape[1]])
        return Y
    if isinstance(A, EllMatrix):
        from .ell_ops import (
            ell_spmm,
            gather_engine_fits,
            gather_engine_supported,
        )

        if gather_engine_supported(
            jnp.result_type(A.dtype, X.dtype)
        ) and gather_engine_fits(A.shape[1], X.shape[1]):
            return ell_spmm(A, X)
        acc = jnp.zeros((A.shape[0], X.shape[1]), jnp.result_type(A.dtype, X.dtype))
        for b in A.buckets:
            def step(acc, cv):
                ck, vk = cv  # (nb,), (nb,)
                return acc.at[b.row_ids].add(vk[:, None] * X[ck]), None

            acc, _ = jax.lax.scan(step, acc, (b.cols.T, b.vals.T))
        return acc
    rows, cols, vals = _coo_arrays(A)
    return _stream_scatter(rows, cols, vals, X, A.shape[0])


def spmm_dd(A, X):
    """fp64-class ``Y = A @ X`` on f32 hardware (binary OR valued).

    Compensated double-word gather (`ops.ell_ops.ell_spmm_dd`): the f64
    operand splits into hi/lo f32 planes, sums run error-free TwoSum
    chains, result is float64 at rel ~1e-13 — the TPU answer to the
    reference's fp64 ``SparseDoubleMatrix`` products (SURVEY.md §2 R4)
    without emulated-f64 arithmetic. ``A``: unit-values EllMatrix /
    SegmentedEll, a `DdEll` (valued f64 matrices compiled with
    `build_ell_dd` — Dekker TwoProd per nonzero), or a SparseOperator
    whose forward tiling is one (permutations are applied at the
    boundary). Host-level entry point — not jittable (returns a NumPy
    array after one device fetch).
    """
    import numpy as np

    from ..linops import SparseOperator
    from .ell_ops import ell_spmm_dd

    if isinstance(A, SparseOperator):
        Xp = np.asarray(X, np.float64)
        if A.col_perm is not None:
            Xp = Xp[np.asarray(A.col_perm)]
        Y = ell_spmm_dd(A.fwd, Xp)
        if A.row_inv is not None:
            Y = Y[np.asarray(A.row_inv)]
        return Y
    return ell_spmm_dd(A, X)


def spmm_t(A, X):
    """``Y = A.T @ X``. ``X``: dtype[nrow, N] → dtype[ncol, N]."""
    X = jnp.asarray(X)
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
        parts = [spmm_t(seg, X) for seg in A.segments]
        Y = jnp.zeros((A.shape[1], X.shape[1]), X.dtype)
        for off, seg, part in zip(A.col_offsets, A.segments, parts):
            Y = Y.at[off : off + seg.shape[1]].add(part)
        return Y
    if isinstance(A, EllMatrix):
        acc = jnp.zeros((A.shape[1], X.shape[1]), jnp.result_type(A.dtype, X.dtype))
        for b in A.buckets:
            Xg = X[b.row_ids]  # (nb, N)

            def step(acc, cv):
                ck, vk = cv
                return acc.at[ck].add(vk[:, None] * Xg), None

            acc, _ = jax.lax.scan(step, acc, (b.cols.T, b.vals.T))
        return acc
    rows, cols, vals = _coo_arrays(A)
    return _stream_scatter(cols, rows, vals, X, A.shape[1])
