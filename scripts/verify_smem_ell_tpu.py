"""Verify the SMEM-blocked ELL gather path (`ell_bucket_spmm_smem`) on TPU.

1. Correctness: force the SMEM path on a small powerlaw matrix (budget
   monkeypatch) and compare vs scipy + the chunked path.
2. A/B timing in ONE process (CLAUDE.md): hypersparse powerlaw 65k^2/4M
   and rmat s18 through `operator().matmat`, chunked vs SMEM-blocked.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
import fastsparse.ops.ell_ops as eo
from fastsparse.bench.matrices import powerlaw, rmat
from fastsparse.bench.timing import time_fn

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    v = float(jnp.sum(jnp.ones((8, 128))))
    assert v == 1024.0
    tick("tunnel ok")

    rng = np.random.default_rng(7)

    # --- correctness: force SMEM path on a small matrix ------------------
    m = powerlaw(4096, 2048, 300_000, seed=3, binary=True)
    coo = fs.binary_coo_from_scipy(m.tocoo())
    A = fs.build_ell(coo)
    X = jnp.asarray(rng.standard_normal((2048, 128)), jnp.float32)
    ref = m @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30

    Yc = np.asarray(eo.ell_spmm(A, X))
    errc = np.abs(Yc - ref).max() / sc
    tick(f"small chunked: rel={errc:.2e}")
    assert errc < 2e-6

    old = eo._SMEM_IDX_BUDGET_UNIT, eo._SMEM_IDX_BUDGET_VALUED
    eo.USE_SMEM_PATH = True
    eo._SMEM_IDX_BUDGET_UNIT = eo._SMEM_IDX_BUDGET_VALUED = 64
    try:
        Ys = np.asarray(eo.ell_spmm(A, X))
    finally:
        eo.USE_SMEM_PATH = False
        eo._SMEM_IDX_BUDGET_UNIT, eo._SMEM_IDX_BUDGET_VALUED = old
    errs = np.abs(Ys - ref).max() / sc
    bit = np.array_equal(Ys, Yc)
    tick(f"small SMEM-forced: rel={errs:.2e} bitwise-match-chunked={bit}")
    assert errs < 2e-6

    # valued variant
    mv = powerlaw(4096, 2048, 300_000, seed=4, binary=False)
    Av = fs.build_ell(fs.coo_from_scipy(mv, dtype=np.float32))
    refv = mv @ np.asarray(X)
    scv = np.abs(refv).max() + 1e-30
    Yvc = np.asarray(eo.ell_spmm(Av, X))
    eo.USE_SMEM_PATH = True
    eo._SMEM_IDX_BUDGET_UNIT = eo._SMEM_IDX_BUDGET_VALUED = 64
    try:
        Yvs = np.asarray(eo.ell_spmm(Av, X))
    finally:
        eo.USE_SMEM_PATH = False
        eo._SMEM_IDX_BUDGET_UNIT, eo._SMEM_IDX_BUDGET_VALUED = old
    ev = np.abs(Yvs - refv).max() / scv
    tick(
        f"small valued SMEM-forced: rel={ev:.2e} "
        f"bitwise-match-chunked={np.array_equal(Yvs, Yvc)}"
    )
    assert ev < 2e-6

    # --- A/B timing: hypersparse configs --------------------------------
    for name, mat in (
        ("powerlaw 65k^2 4M", powerlaw(65_536, 65_536, 4_000_000, seed=0,
                                       binary=True)),
        ("rmat s18", rmat(18, seed=1)),
    ):
        op = fs.operator(mat, transpose=False, reorder="degree")
        Xb = jnp.asarray(
            rng.standard_normal((mat.shape[1], 128)), jnp.float32
        )
        refb = mat[:256] @ np.asarray(Xb)
        scb = np.abs(refb).max() + 1e-30

        # chunked baseline (USE_SMEM_PATH defaults False)
        fc = jax.jit(lambda op, X: op.matmat(X))
        Yb = np.asarray(fc(op, Xb))
        e0 = np.abs(Yb[:256] - refb).max() / scb
        dt0 = time_fn(fc, op, Xb, reps=10)
        tick(f"{name} chunked: {dt0*1e3:8.3f} ms rel={e0:.2e}")

        eo.USE_SMEM_PATH = True
        try:
            fsm = jax.jit(lambda op, X: op.matmat(X))
            Yb2 = np.asarray(fsm(op, Xb))
            e1 = np.abs(Yb2[:256] - refb).max() / scb
            dt1 = time_fn(fsm, op, Xb, reps=10)
        finally:
            eo.USE_SMEM_PATH = False
        tick(
            f"{name} SMEM   : {dt1*1e3:8.3f} ms rel={e1:.2e} "
            f"speedup={dt0/dt1:.2f}x"
        )
        assert e1 < 5e-6

    tick("done")


if __name__ == "__main__":
    main()
