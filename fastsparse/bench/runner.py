"""Benchmark suite runner (SURVEY.md §2.2 N6, §5.1).

Times jitted kernels with forced value fetches (`bench.timing`), reports nnz/s, GFLOP/s and
the speed-of-light fraction from the measured HBM bandwidth (`bench.sol`).
Used by the repo-root ``bench.py`` (driver headline) and usable standalone:

    python -m fastsparse.bench.runner
"""
from __future__ import annotations

from typing import Any, Dict, List

import jax

from .timing import time_fn

__all__ = ["time_fn", "run_suite"]


def run_suite(sizes=((16_384, 1_000_000),), n_rhs: int = 128) -> List[Dict[str, Any]]:
    import jax.numpy as jnp
    import numpy as np
    import scipy.sparse as sp

    import fastsparse as fs
    from .metrics import format_stats
    from .sol import measure_hbm_bw, spmm_sol_seconds, spmv_sol_seconds

    bw = measure_hbm_bw()
    rows = []
    rng = np.random.default_rng(0)
    for n, nnz in sizes:
        r = (n * (rng.random(nnz) ** 1.6)).astype(np.int64) % n
        c = (n * (rng.random(nnz) ** 1.6)).astype(np.int64) % n
        m = sp.coo_matrix((np.ones(nnz, np.float32), (r, c)), shape=(n, n))
        m.sum_duplicates()
        m.data[:] = 1.0
        m = m.tocsr()

        op = fs.operator(m, format="bsr", transpose=False, reorder="degree")
        X = jnp.asarray(rng.standard_normal((n, n_rhs)), jnp.float32)
        x = jnp.asarray(rng.standard_normal(n), jnp.float32)

        spmm_fn = jax.jit(lambda op, X: op.matmat(X))
        spmv_fn = jax.jit(lambda op, x: op.matvec(x))
        dt_mm = time_fn(spmm_fn, op, X)
        dt_mv = time_fn(spmv_fn, op, x)
        sol_mm = spmm_sol_seconds(n, n, m.nnz, n_rhs, bw, binary=True)
        sol_mv = spmv_sol_seconds(n, n, m.nnz, bw, binary=True)
        stats = format_stats(op.fwd)
        rows.append(
            {
                "matrix": f"powerlaw {n}x{n} nnz={m.nnz}",
                "hbm_bw_GBs": bw / 1e9,
                "spmm_ms": dt_mm * 1e3,
                "spmm_nnz_s": m.nnz / dt_mm,
                "spmm_sol_frac": sol_mm / dt_mm,
                "spmv_ms": dt_mv * 1e3,
                "spmv_nnz_s": m.nnz / dt_mv,
                "spmv_sol_frac": sol_mv / dt_mv,
                **{f"fmt_{k}": v for k, v in stats.items()},
            }
        )
    return rows


if __name__ == "__main__":
    import json

    from ..utils.cache import enable_persistent_cache

    enable_persistent_cache()
    for row in run_suite():
        print(json.dumps(row, default=str))
