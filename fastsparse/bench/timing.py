"""Robust device timing.

`jax.block_until_ready` is a no-op through remote-execution tunnels (the
axon TPU terminal): dispatches return immediately and nothing forces the
device to run. Correct timing requires a *value fetch* — a tiny transfer
that can only complete after every queued program has executed. All
fastsparse benchmarks time ``reps`` dispatches + one scalar fetch and
subtract the measured round-trip latency.
"""
from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp

__all__ = [
    "fetch_scalar",
    "measure_rtt",
    "time_fn",
    "time_fn_stats",
    "time_chain",
    "time_chain_diff",
    "time_scan",
]


def fetch_scalar(x) -> float:
    """Force execution of everything ``x`` depends on; return a scalar."""
    leaf = jax.tree.leaves(x)[0]
    return float(jnp.sum(leaf))


_rtt_cache: float | None = None


def measure_rtt(reps: int = 5) -> float:
    """Seconds for one dispatch+fetch of a trivial computation."""
    global _rtt_cache
    if _rtt_cache is not None:
        return _rtt_cache
    t = jnp.ones((8,))
    fetch_scalar(t + 1)
    t0 = time.perf_counter()
    for _ in range(reps):
        fetch_scalar(t + 1)
    _rtt_cache = (time.perf_counter() - t0) / reps
    return _rtt_cache


def time_fn(fn: Callable, *args, reps: int = 20, warmup: int = 2) -> float:
    """Mean seconds per call: reps dispatches + one forced fetch - RTT.

    Auto-scales ``reps`` until the aggregate is a few RTTs long — fast
    kernels (< ~1 ms) are otherwise swamped by fetch-latency noise (the
    2026-08-17 tm-sweep read 0.000 ms on a 0.2 ms product)."""
    rtt = measure_rtt()
    out = None
    for _ in range(warmup):
        out = fn(*args)
    fetch_scalar(out)
    while True:
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(*args)
        fetch_scalar(out)
        elapsed = time.perf_counter() - t0
        if elapsed - rtt >= 3.0 * rtt or reps >= 640:
            return max((elapsed - rtt) / reps, 1e-9)
        reps = min(reps * 8, 640)


def time_fn_stats(
    fn: Callable, *args, batches: int = 5, reps: int = 20
) -> dict:
    """`time_fn` run as ``batches`` independent fetch batches.

    Returns ``{"min_ms", "median_ms", "samples_ms", "rtt_ms"}`` so a bench
    row carries variance evidence: tunnel-hour swings (documented 3.5 vs
    4.6 ms on identical code across sessions) are then distinguishable
    from real regressions by the spread and the probe RTT."""
    rtt = measure_rtt()
    samples = sorted(time_fn(fn, *args, reps=reps) for _ in range(batches))
    return {
        "min_ms": round(samples[0] * 1e3, 4),
        "median_ms": round(samples[len(samples) // 2] * 1e3, 4),
        "samples_ms": [round(s * 1e3, 4) for s in samples],
        "rtt_ms": round(rtt * 1e3, 2),
    }


def time_scan(
    fn: Callable,
    x0,
    iters: int = 512,
    batches: int = 5,
    couple_rows: int | None = None,
) -> float:
    """Device-chained per-iteration seconds: ONE dispatch running ``iters``
    data-dependent applications of ``fn`` inside `lax.fori_loop`, one
    fetch. Per-dispatch tunnel latency and inter-launch host gaps are paid
    once instead of per iteration — the closest measurable analog of
    device-busy time per product (docs/TRACE.md found wall ≈ 2× busy at
    N=128; this separates the two in bench rows).

    Each iteration's carry GENUINELY depends on the previous product —
    ``x[0,0] += 1e-38 · y[0,0]`` — because XLA hoists loop-invariant
    computations out of while loops (an `optimization_barrier` variant
    measured 0.000 ms: the product was elided). The single-element
    update is in-place inside the loop body; the perturbation is below
    f32 resolution of any realistic operand.

    ``couple_rows``: rows of ``y`` the coupling reduction reads. The
    default (None = all) re-reads the FULL output from HBM every
    iteration — on the 50k×128 headline that charge is ~25.6 MB ≈
    40-50 µs of pure measurement overhead per product. ONLY pass a
    small row count when ``fn``'s output is produced by a Pallas kernel
    (or another opaque custom call): a `pallas_call` executes atomically
    — XLA cannot push a slice INTO it to elide work — so an 8-row read
    still forces the complete product while costing ~4 KB. For XLA-dot
    outputs it MUST stay None (slices get algebraically pushed through
    dots and the measurement collapses — the 0.009 ms pathology above).
    """
    eps = jnp.asarray(1e-38, jnp.float32)

    def body(_, x):
        y = fn(x)
        # quadratic reduction: slices/linear reductions of a dot get
        # algebraically pushed through by XLA (y[:1,:1] of x@W became a
        # single dot-product and the "loop" measured 0.009 ms) — sum(y²)
        # cannot, so the full product must execute every iteration
        if couple_rows is not None:
            y = y[:couple_rows]
        s = jnp.sum(jnp.square(y.astype(jnp.float32)))
        return x.at[:1, :1].add((eps * s).astype(x.dtype))

    def loop(n):
        g = jax.jit(
            lambda x: jax.lax.fori_loop(0, n, body, x), static_argnums=()
        )
        fetch_scalar(g(x0))  # compile + warm

        def run():
            t0 = time.perf_counter()
            fetch_scalar(g(x0))
            return time.perf_counter() - t0

        return min(run() for _ in range(batches))

    # two loop lengths; the difference cancels the fetch RTT exactly.
    # iters must be LARGE: tunnel fetch latency varies by +-10 ms
    # between calls, so the loop-time signal has to dwarf it (512 x a
    # 0.3 ms product = 150 ms against +-10 ms noise; 30-iter loops
    # measured pure noise).
    t1 = loop(iters)
    t2 = loop(2 * iters)
    return max((t2 - t1) / iters, 1e-9)


def time_chain(fn: Callable, x0, reps: int = 10) -> float:
    """Timing with a data-dependency chain ``y = fn(y)`` (for ops whose
    output feeds back as input; strongest guarantee of serialization).

    Implemented as a two-length difference (`time_chain_diff`): the old
    ``elapsed - rtt`` subtraction was ill-conditioned when the signal is
    the same order as the ~25 ms RTT jitter — it produced 320 GB/s to
    8.5 TB/s "bandwidth readings" on an ~820 GB/s chip."""
    return time_chain_diff(fn, x0, reps)


def time_chain_diff(fn: Callable, x0, reps: int = 10) -> float:
    """Per-call seconds for the chain ``y = fn(y)`` via the difference of
    a ``reps`` and a ``4*reps`` chain — the fetch RTT cancels exactly."""

    def chain(k: int) -> float:
        t0 = time.perf_counter()
        y = x0
        for _ in range(k):
            y = fn(y)
        fetch_scalar(y)
        return time.perf_counter() - t0

    chain(2)  # warm the compile + device path
    short, long_ = reps, 4 * reps
    return max((chain(long_) - chain(short)) / (long_ - short), 1e-9)
