"""Speed-of-light model (SURVEY.md §6): measure the chip's effective HBM
bandwidth at runtime and derive bandwidth-bound bounds for sparse kernels.
Never hardcode bandwidth — compute it from the measured chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .timing import time_chain

__all__ = ["measure_hbm_bw", "spmm_sol_seconds", "spmv_sol_seconds"]


def measure_hbm_bw(nbytes: int = 256 * 1024 * 1024, reps: int = 10) -> float:
    """Effective HBM bandwidth (bytes/s) via a chained jitted copy."""
    n = nbytes // 4
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    dt = time_chain(f, x, reps=reps)
    return 2 * nbytes / dt  # one read + one write per element


def spmm_sol_seconds(
    nrow: int, ncol: int, nnz: int, n_rhs: int, bw: float,
    *, binary: bool = True, itemsize: int = 4
) -> float:
    """Lower-bound time for Y = A @ X with an *ideal* sparse format:
    A traffic = 4B column index per nnz (bitmask is cheaper: nnz/8), X and Y
    streamed exactly once."""
    a_bytes = (nnz // 8) if binary else nnz * (4 + itemsize)
    a_bytes += nnz // 32 * 4  # index metadata per 32-nnz tile row, amortized
    x_bytes = ncol * n_rhs * itemsize
    y_bytes = nrow * n_rhs * itemsize
    return (a_bytes + x_bytes + y_bytes) / bw


def spmv_sol_seconds(
    nrow: int, ncol: int, nnz: int, bw: float, *, binary: bool = True,
    itemsize: int = 4
) -> float:
    a_bytes = (nnz // 8) if binary else nnz * (4 + itemsize)
    a_bytes += nnz // 32 * 4
    x_bytes = ncol * itemsize
    y_bytes = nrow * itemsize
    return (a_bytes + x_bytes + y_bytes) / bw
