"""Speed-of-light model (SURVEY.md §6): measure the chip's effective HBM
bandwidth at runtime and derive bandwidth-bound bounds for sparse kernels.
Never hardcode bandwidth — compute it from the measured chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


__all__ = ["measure_hbm_bw", "spmm_sol_seconds", "spmv_sol_seconds"]


BW_FLOOR = 30e9  # below: the tunnel was stalling mid-measurement
BW_CEIL = 1.5e12  # above: physically impossible for one v5e chip
# Fallback when every reading is implausible (a fully wedged tunnel
# hour): assume the chip's SPEC bandwidth. A deflated denominator would
# inflate vs_baseline into a fake pass; the spec value keeps the target
# honest at worst slightly harder than the effective-through-stack rate.
BW_SPEC_FALLBACK = 819e9  # v5e datasheet HBM bandwidth


def measure_hbm_bw(nbytes: int = 256 * 1024 * 1024, reps: int = 10) -> float:
    """Effective HBM bandwidth (bytes/s) via a chained jitted copy.

    Timed with `timing.time_chain_diff` (two chain lengths differenced —
    the fetch RTT cancels exactly; the old ``elapsed - rtt`` subtraction
    produced 320 GB/s-8.5 TB/s "readings" on an ~820 GB/s chip). Returns
    the first reading in the physically plausible window, retrying up to
    5 times; if the tunnel is so wedged that none is, returns the chip's
    spec bandwidth rather than a deflated artifact (see BW_SPEC_FALLBACK).
    """
    from .timing import time_chain_diff

    n = nbytes // 4
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda x: x + 1.0)
    for _ in range(5):
        dt = time_chain_diff(f, x, reps=reps)
        bw = 2 * nbytes / dt  # one read + one write per element
        if BW_FLOOR <= bw <= BW_CEIL:
            return bw
    return BW_SPEC_FALLBACK


def _ideal_a_bytes(nnz: int, binary: bool, itemsize: int, ideal: str) -> int:
    """Ideal-format A traffic per BASELINE.md's SoL model.

    ``ideal="csr"`` (default) is the model BASELINE.md documents for the
    driver target: "binary SpMV moves ≈ 4 B of column-index plus amortized
    gathered-x and row_ptr/y traffic per nonzero" — 4 B/nnz of index (plus
    amortized row metadata), values only when non-binary.

    ``ideal="bitmask"`` is the stricter 1 bit/nnz storage bound (the model
    bench.py used through round 2, kept as a secondary report): it is NOT
    wall-time-achievable at fp32 parity on v5e — the per-use VPU mask
    expansion costs more than the DMA it saves (probe_tilecost_tpu,
    2026-08-17; re-confirmed vs int8 panels 2026-08-20)."""
    if ideal == "bitmask":
        a = (nnz // 8) if binary else nnz * (4 + itemsize)
    else:
        a = nnz * 4 if binary else nnz * (4 + itemsize)
    return a + nnz // 32 * 4  # row/tile metadata per 32-nnz run, amortized


def spmm_sol_seconds(
    nrow: int, ncol: int, nnz: int, n_rhs: int, bw: float,
    *, binary: bool = True, itemsize: int = 4, ideal: str = "csr"
) -> float:
    """Lower-bound time for Y = A @ X with an *ideal* sparse format:
    A traffic per `_ideal_a_bytes`, X and Y streamed exactly once."""
    a_bytes = _ideal_a_bytes(nnz, binary, itemsize, ideal)
    x_bytes = ncol * n_rhs * itemsize
    y_bytes = nrow * n_rhs * itemsize
    return (a_bytes + x_bytes + y_bytes) / bw


def spmv_sol_seconds(
    nrow: int, ncol: int, nnz: int, bw: float, *, binary: bool = True,
    itemsize: int = 4, ideal: str = "csr"
) -> float:
    a_bytes = _ideal_a_bytes(nnz, binary, itemsize, ideal)
    x_bytes = ncol * itemsize
    y_bytes = nrow * itemsize
    return (a_bytes + x_bytes + y_bytes) / bw
