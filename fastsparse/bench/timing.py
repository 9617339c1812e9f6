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

__all__ = ["fetch_scalar", "measure_rtt", "time_fn", "time_chain"]


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


def time_chain(fn: Callable, x0, reps: int = 10) -> float:
    """Timing with a data-dependency chain ``y = fn(y)`` (for ops whose
    output feeds back as input; strongest guarantee of serialization)."""
    rtt = measure_rtt()
    y = fn(x0)
    fetch_scalar(y)
    t0 = time.perf_counter()
    y = x0
    for _ in range(reps):
        y = fn(y)
    fetch_scalar(y)
    return max((time.perf_counter() - t0 - rtt) / reps, 1e-9)
