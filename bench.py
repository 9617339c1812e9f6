"""Driver benchmark: one JSON line with the headline metric.

Headline (BASELINE.json:9, config 3): Macau/SMURFF-style **blocked/BSR
binary multi-RHS SpMM** ``Y = A @ X`` (N=128) — bitmask tiled-BSR through
the Pallas MXU kernels (binary fp32-parity 3-pass path, column-segmented
VMEM-resident X). ``vs_baseline`` is measured nnz/s over the target: 80 %
of the speed-of-light HBM-bound nnz/s from the chip's *measured* bandwidth
(BASELINE.json:5; SURVEY.md §6). The hypersparse power-law case (gather
engine) is reported in ``detail``.
"""
import json
import sys

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, ".")
    import fastsparse as fs
    from fastsparse.bench.matrices import banded, powerlaw
    from fastsparse.bench.sol import measure_hbm_bw, spmm_sol_seconds
    from fastsparse.bench.timing import time_fn
    from fastsparse.utils.cache import enable_persistent_cache

    enable_persistent_cache()
    n_rhs = 128
    rng = np.random.default_rng(0)

    # --- headline: blocked binary SpMM (config 3) ------------------------
    mb = banded(50_000, 512, seed=4, density=0.39)
    mb.data[:] = 1.0
    nnz = int(mb.nnz)
    op = fs.operator(mb, format="bsr", transpose=False)
    X = jnp.asarray(rng.standard_normal((mb.shape[1], n_rhs)), jnp.float32)
    step = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(step(op, X))
    ref = mb[:256] @ np.asarray(X)
    err = float(np.abs(Y[:256] - ref).max() / (np.abs(ref).max() + 1e-30))
    assert err < 2e-5, f"wrong result: rel={err}"
    dt = time_fn(step, op, X, reps=20)

    bw = measure_hbm_bw()
    sol = spmm_sol_seconds(*mb.shape, nnz, n_rhs, bw, binary=True)
    nnz_s = nnz / dt
    target = 0.80 * (nnz / sol)

    # --- detail: hypersparse power-law via the gather engine -------------
    mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    opp = fs.operator(mp, transpose=False, reorder="degree")
    Xp = jnp.asarray(rng.standard_normal((mp.shape[1], n_rhs)), jnp.float32)
    stepp = jax.jit(lambda op, X: op.matmat(X))
    Yp = np.asarray(stepp(opp, Xp))
    refp = mp[:256] @ np.asarray(Xp)
    errp = float(np.abs(Yp[:256] - refp).max() / (np.abs(refp).max() + 1e-30))
    assert errp < 2e-5, f"wrong hypersparse result: rel={errp}"
    dtp = time_fn(stepp, opp, Xp, reps=10)

    print(
        json.dumps(
            {
                "metric": "binary_blocked_bsr_spmm_n128_nnz_per_s",
                "value": round(nnz_s, 1),
                "unit": "nnz/s",
                "vs_baseline": round(nnz_s / target, 4),
                "detail": {
                    "ms_per_spmm": round(dt * 1e3, 3),
                    "gflops": round(2 * nnz * n_rhs / dt / 1e9, 1),
                    "rel_err": err,
                    "hbm_bw_GBs": round(bw / 1e9, 1),
                    "sol_fraction": round(nnz_s / (nnz / sol), 4),
                    "matrix": f"banded 50k bw512 binary nnz={nnz}",
                    "hypersparse_powerlaw": {
                        "ms": round(dtp * 1e3, 3),
                        "nnz_per_s": round(mp.nnz / dtp, 1),
                        "rel_err": errp,
                        "matrix": f"65536^2 powerlaw nnz={int(mp.nnz)}",
                    },
                    "n_rhs": n_rhs,
                    "backend": jax.default_backend(),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
