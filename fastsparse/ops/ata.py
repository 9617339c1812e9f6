"""Normal-equation products: ``AᵀA·x`` (and ``AᵀA·X``, ``AAᵀ·x``).

Reference analog: ``bcsr_AA_mul_B`` (SURVEY.md §2 R5, §3.3) — the inner
product of every Macau/SMURFF CG iteration, called thousands of times per
Gibbs run. The C version did ``tmp = A·x`` then a scatter-add ``Aᵀ·tmp``;
on TPU scatter down the transpose is the trap (SURVEY.md §7.3 item 5), so
the hot path composes two *forward* products over dual tilings: ``A`` tiled
by rows of A, plus ``Aᵀ`` tiled by rows of Aᵀ, both built once at convert
time (`linops.SparseOperator` with ``transpose=True``).
"""
from __future__ import annotations

from ..ops.spmm import spmm, spmm_t
from ..ops.spmv import spmv, spmv_t

__all__ = ["ata_x", "ata_X", "aat_x"]


def ata_x(A, x, At=None, reg: float = 0.0):
    """``(AᵀA + reg·I) x`` with optional precomputed transpose tiling."""
    tmp = spmv(A, x)
    out = spmv(At, tmp) if At is not None else spmv_t(A, tmp)
    if reg:
        out = out + reg * x
    return out


def ata_X(A, X, At=None, reg: float = 0.0):
    """``(AᵀA + reg·I) X`` — multi-RHS variant (Macau A'A·X panels)."""
    tmp = spmm(A, X)
    out = spmm(At, tmp) if At is not None else spmm_t(A, tmp)
    if reg:
        out = out + reg * X
    return out


def aat_x(A, x, At=None, reg: float = 0.0):
    """``(AAᵀ + reg·I) x``."""
    tmp = spmv(At, x) if At is not None else spmv_t(A, x)
    out = spmv(A, tmp)
    if reg:
        out = out + reg * x
    return out
