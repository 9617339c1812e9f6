"""Driver benchmark: one JSON line with the headline metric.

Headline (BASELINE.json:9, config 3): Macau/SMURFF-style binary multi-RHS
SpMM ``Y = A @ X`` (N=128) on a power-law matrix, degree-clustered bitmask
tiled-BSR, Pallas MXU kernels. ``vs_baseline`` is measured nnz/s divided by
the target — 80 % of the speed-of-light HBM-bound nnz/s computed from the
chip's *measured* bandwidth (BASELINE.json:5; SURVEY.md §6).
"""
import json
import sys
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import scipy.sparse as sp

    sys.path.insert(0, ".")
    import fastsparse as fs
    from fastsparse.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    from fastsparse.bench.sol import measure_hbm_bw, spmm_sol_seconds

    nrow = ncol = 65_536
    nnz_target = 4_000_000
    n_rhs = 128
    rng = np.random.default_rng(0)
    alpha = 1.6
    r = (nrow * (rng.random(nnz_target) ** alpha)).astype(np.int64) % nrow
    c = (ncol * (rng.random(nnz_target) ** alpha)).astype(np.int64) % ncol
    m = sp.coo_matrix((np.ones(nnz_target, np.float32), (r, c)), shape=(nrow, ncol))
    m.sum_duplicates()
    m.data[:] = 1.0
    m = m.tocsr()
    nnz = int(m.nnz)

    # hypersparse structure -> the ELL gather engine; coarse bucket widths
    # bound the compiled-program count (remote compiles are slow).
    cfg = fs.Config(ell_bucket_widths=(8, 32, 128, 512, 2048, 8192))
    op = fs.operator(m, transpose=False, reorder="degree", config=cfg)
    X = jnp.asarray(rng.standard_normal((ncol, n_rhs)), jnp.float32)

    from fastsparse.bench.timing import time_fn

    step = jax.jit(lambda op, X: op.matmat(X))
    Y = step(op, X)
    # correctness spot check on a slice
    ref = m[:256] @ np.asarray(X)
    err = float(np.abs(np.asarray(Y)[:256] - ref).max())
    assert err < 1e-2 * max(float(np.abs(ref).max()), 1.0), f"wrong result: {err}"

    dt = time_fn(step, op, X, reps=20)

    bw = measure_hbm_bw()
    sol = spmm_sol_seconds(nrow, ncol, nnz, n_rhs, bw, binary=True)
    nnz_s = nnz / dt
    sol_nnz_s = nnz / sol
    target = 0.80 * sol_nnz_s

    print(
        json.dumps(
            {
                "metric": "binary_bsr_spmm_n128_nnz_per_s",
                "value": round(nnz_s, 1),
                "unit": "nnz/s",
                "vs_baseline": round(nnz_s / target, 4),
                "detail": {
                    "ms_per_spmm": round(dt * 1e3, 3),
                    "gflops": round(2 * nnz * n_rhs / dt / 1e9, 1),
                    "hbm_bw_GBs": round(bw / 1e9, 1),
                    "sol_nnz_per_s": round(sol_nnz_s, 1),
                    "sol_fraction": round(nnz_s / sol_nnz_s, 4),
                    "matrix": f"{nrow}x{ncol} powerlaw nnz={nnz}",
                    "n_rhs": n_rhs,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
