"""Benchmark suite over the BASELINE.json config families -> BENCH.md.

Usage:
    python scripts/bench_suite.py cpu   # fp64 oracle configs (forces CPU)
    PYTHONPATH=... python scripts/bench_suite.py tpu   # TPU kernel configs

Appends one markdown table row + one JSON line per config to BENCH.md.
"""
import json
import sys
import time

MODE = sys.argv[1] if len(sys.argv) > 1 else "tpu"

if MODE == "cpu":
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, ".")
import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded, ecfp_like, powerlaw, rmat  # noqa: E402
from fastsparse.bench.timing import time_fn  # noqa: E402
from fastsparse.bench.sol import measure_hbm_bw, spmm_sol_seconds, spmv_sol_seconds  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

RESULTS = []


def record(config, metric, value, unit, detail):
    row = {
        "config": config,
        "metric": metric,
        "value": round(value, 2),
        "unit": unit,
        "backend": jax.default_backend(),
        **detail,
    }
    RESULTS.append(row)
    print(json.dumps(row), flush=True)


def check(got, ref, rtol, config):
    got = np.asarray(got)
    scale = np.abs(ref).max() + 1e-300
    rel = float(np.abs(got - ref).max() / scale)
    assert rel <= rtol, f"{config}: rel err {rel:.2e} > {rtol}"
    return rel


def cpu_configs():
    # BASELINE config 1: fp64 CSR SpMV, 100k x 100k, ~50 nnz/row, vs scipy
    n, per_row = 100_000, 50
    m = powerlaw(n, n, n * per_row, seed=0, alpha=1.0, dtype=np.float64)
    op = fs.operator(m, format="ell", transpose=True)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(n))
    f = jax.jit(lambda op, x: op.matvec(x))
    rel = check(f(op, x), m @ np.asarray(x), 1e-10, "fp64-csr-spmv")
    dt = time_fn(f, op, x, reps=5)
    record(
        "1 fp64 CSR SpMV 100k^2",
        "spmv_nnz_per_s",
        m.nnz / dt,
        "nnz/s",
        {"ms": round(dt * 1e3, 2), "rel_err": rel, "rtol": 1e-10},
    )


def tpu_configs():
    import os

    only = [t for t in os.environ.get("FS_SUITE_ONLY", "").split(",") if t]

    def want(tag):
        return not only or tag in only

    bw = measure_hbm_bw()
    rng = np.random.default_rng(1)

    # BASELINE config 2: COO SpMV with reordering, power-law, fp32
    m = powerlaw(20_000, 20_000, 1_000_000, seed=0, dtype=np.float32)
    if not want("2"):
        m = None
    op = fs.operator(m, reorder="auto", transpose=False, dtype=np.float32) if m is not None else None
    if op is not None:
        x = jnp.asarray(rng.standard_normal(20_000), jnp.float32)
        f = jax.jit(lambda op, x: op.matvec(x))
        rel = check(f(op, x), m @ np.asarray(x), 2e-4, "spmv-powerlaw")
        dt = time_fn(f, op, x, reps=10)
        sol = spmv_sol_seconds(*m.shape, m.nnz, bw, binary=False)
        record(
            "2 fp32 SpMV powerlaw 20k^2",
            "spmv_nnz_per_s",
            m.nnz / dt,
            "nnz/s",
            {"ms": round(dt * 1e3, 3), "rel_err": rel, "sol_frac": round(sol / dt, 4)},
        )

    # BASELINE config 3: binary multi-RHS SpMM, Macau-style matrices
    cases3 = []
    if want("3e"):
        cases3.append(("ecfp 50k x 20k", ecfp_like(50_000, 20_000, 64, 400, seed=2)))
    if want("3r"):
        cases3.append(("rmat s18", rmat(18, 16, seed=3)))
    if want("3b"):
        cases3.append(("banded 50k bw512", banded(50_000, 512, seed=4)))
    for name, mat in cases3:
        binary = bool((mat.data == 1).all())
        op = fs.operator(mat, reorder="auto", transpose=False)
        fmt = type(op.fwd).__name__
        for n_rhs in (32, 128):
            X = jnp.asarray(
                rng.standard_normal((mat.shape[1], n_rhs)), jnp.float32
            )
            f = jax.jit(lambda op, X: op.matmat(X))
            ref = mat[:512] @ np.asarray(X)
            got = np.asarray(f(op, X))[:512]
            rel = check(got, ref, 2e-4, f"spmm-{name}")
            dt = time_fn(f, op, X, reps=10)
            sol = spmm_sol_seconds(*mat.shape, mat.nnz, n_rhs, bw, binary=binary)
            record(
                f"3 SpMM {name} N={n_rhs}",
                "spmm_nnz_per_s",
                mat.nnz / dt,
                "nnz/s",
                {
                    "ms": round(dt * 1e3, 3),
                    "gflops": round(2 * mat.nnz * n_rhs / dt / 1e9, 1),
                    "rel_err": rel,
                    "sol_frac": round(sol / dt, 4),
                    "format": fmt,
                },
            )

    # BASELINE config 4: SpGEMM with fused nnz estimation
    if not want("4"):
        return
    A = rmat(13, 8, seed=5, binary=False)
    B = rmat(13, 8, seed=6, binary=False)
    t0 = time.perf_counter()
    C, info = fs.spgemm(A, B)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    C, info = fs.spgemm(A, B)  # warm: device compiles cached (the
    # host symbolic join still runs every call and is part of warm cost)
    dt = time.perf_counter() - t0
    ref = A @ B
    # f32 cancellation can zero a handful of entries that scipy's f64 keeps
    assert abs(info["nnz"] - ref.nnz) <= max(16, ref.nnz // 10_000)
    got = np.asarray(C.to_scipy().tocsr()[:256].toarray())
    check(got, ref[:256].toarray(), 1e-4, "spgemm")
    record(
        "4 SpGEMM rmat13 x rmat13",
        "spgemm_flops_per_s",
        info["flops"] / dt,
        "FLOP/s",
        {
            "s": round(dt, 2),
            "cold_s": round(cold, 2),
            "nnz_out": info["nnz"],
            "est_nnz": info["est_nnz"],
            "pairs": info["n_pairs"],
        },
    )


def main():
    if MODE == "cpu":
        cpu_configs()
    else:
        assert jax.default_backend() == "tpu", jax.default_backend()
        tpu_configs()
    # append to BENCH.md
    import datetime

    stamp = datetime.datetime.now().isoformat(timespec="seconds")
    with open("BENCH.md", "a") as f:
        f.write(f"\n## {MODE} run {stamp}\n\n")
        f.write("| config | value | unit | detail |\n|---|---|---|---|\n")
        for r in RESULTS:
            detail = {
                k: v
                for k, v in r.items()
                if k not in ("config", "metric", "value", "unit")
            }
            f.write(
                f"| {r['config']} | {r['value']:.3g} | {r['unit']} | "
                f"{json.dumps(detail)} |\n"
            )


if __name__ == "__main__":
    main()
