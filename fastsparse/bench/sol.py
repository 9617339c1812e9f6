"""Speed-of-light model (SURVEY.md §6): measure the chip's effective HBM
bandwidth at runtime and derive bandwidth-bound bounds for sparse kernels.
Never hardcode bandwidth — compute it from the measured chip.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


__all__ = ["measure_hbm_bw", "spmm_sol_seconds", "spmv_sol_seconds"]


BW_FLOOR = 30e9  # below: the tunnel was stalling mid-measurement
BW_CEIL = 1.5e12  # above: physically impossible for one v5e chip —
# an RTT spike made time_chain's (elapsed - rtt) go negative and clamp


def measure_hbm_bw(nbytes: int = 256 * 1024 * 1024, reps: int = 10) -> float:
    """Effective HBM bandwidth (bytes/s) via a chained jitted copy.

    Readings outside the physically plausible window are measurement
    artifacts (RTT spike under-/over-shooting the subtraction) — retry a
    few times and return the best plausible reading; if none is, return
    the smallest reading above the floorless minimum so downstream SoL
    math stays finite and pessimistic-for-us (higher bw = harder target
    would be wrong to fake, lower = inflated vs_baseline)."""
    import time as _time

    n = nbytes // 4
    x = jnp.arange(n, dtype=jnp.float32)
    f = jax.jit(lambda x: x + 1.0)

    def chain(k):
        t0 = _time.perf_counter()
        y = x
        for _ in range(k):
            y = f(y)
        float(y[0])  # fetch
        return _time.perf_counter() - t0

    chain(2)  # warm
    readings = []
    for _ in range(5):
        # two-length difference: the fetch RTT (~25 ms, jittering by
        # +-10 ms) cancels exactly instead of being subtracted from a
        # ~6 ms signal — the old time_chain subtraction produced 320 GB/s
        # to 8.5 TB/s "readings" on an ~820 GB/s chip.
        short, long_ = reps, 4 * reps
        dt = (chain(long_) - chain(short)) / (long_ - short)
        bw = 2 * nbytes / max(dt, 1e-9)
        readings.append(bw)
        if BW_FLOOR <= bw <= BW_CEIL:
            return bw
    valid = [b for b in readings if BW_FLOOR <= b <= BW_CEIL]
    if valid:
        return max(valid)
    return min(BW_CEIL, max(min(readings), BW_FLOOR))


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
