"""Tracing / profiling helpers (SURVEY.md §5.1).

The reference's only instrumentation was ``omp_get_wtime`` in bench
drivers. Here `named` wraps the kernel launch sites — the Pallas calls in
`ops.pallas.bsr_spmm` (`bucket_spmm_*`, `panel_spmm_*`) and
`ops.pallas.ell_spmm` (`ell_gather_*`), the Y-assembly stages in
`ops.bsr_ops` (`bsr_assemble_strips`, `colseg_assemble`), and the local
compute bodies in `parallel.ops` (`pspm*_local`) — so `jax.profiler`
traces (perfetto/xprof) attribute device time per kernel; `trace`
captures a profiler trace around any block.
"""
from __future__ import annotations

import contextlib
import os

import jax

__all__ = ["named", "trace"]


def named(name: str):
    """Alias of `jax.named_scope` for kernel annotation."""
    return jax.named_scope(name)


@contextlib.contextmanager
def trace(logdir: str = "/tmp/fastsparse_trace"):
    """Capture a profiler trace around a block:

        with trace("/tmp/t"):
            y = op.matvec(x); fetch_scalar(y)

    View with xprof/perfetto. On remote-execution backends make sure the
    block ends with a value fetch (`bench.timing.fetch_scalar`), otherwise
    nothing has executed by the time the trace stops.
    """
    os.makedirs(logdir, exist_ok=True)
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()
