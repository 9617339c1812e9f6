"""TPU smoke test: compiled Pallas BSR kernels vs scipy + first timings.

Run on the real chip: python scripts/tpu_smoke.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()
from fastsparse.formats.bsr import build_bsr
from fastsparse.formats.coo import binary_coo_from_scipy, coo_from_scipy
from fastsparse.ops.bsr_ops import bsr_spmm, bsr_spmv
from fastsparse.reorder.sort import sort_coo


def powerlaw(nrow, ncol, nnz, seed, alpha=1.6):
    rng = np.random.default_rng(seed)
    r = (nrow * (rng.random(nnz) ** alpha)).astype(np.int64) % nrow
    c = (ncol * (rng.random(nnz) ** alpha)).astype(np.int64) % ncol
    m = sp.coo_matrix((np.ones(nnz, np.float32), (r, c)), shape=(nrow, ncol))
    m.sum_duplicates()
    m.data[:] = 1.0
    return m.tocsr()


def timeit(fn, *args, reps=20):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps, out


def main():
    print("backend:", jax.default_backend())
    nrow = ncol = 50_000
    nnz = 2_000_000
    m = powerlaw(nrow, ncol, nnz, seed=0)
    print(f"matrix: {nrow}x{ncol}, nnz={m.nnz}")

    coo = binary_coo_from_scipy(m)
    t0 = time.perf_counter()
    coo_h = sort_coo(coo, "hilbert")
    jax.block_until_ready(coo_h.rows)
    print(f"hilbert sort: {time.perf_counter()-t0:.3f}s")

    for label, src in [("raw", coo), ("hilbert", coo_h)]:
        t0 = time.perf_counter()
        A = build_bsr(src)
        jax.block_until_ready(A.buckets[0].tiles)
        print(
            f"[{label}] build_bsr: {time.perf_counter()-t0:.2f}s "
            f"tiles={A.n_tiles} occ={A.tile_occupancy:.4f} "
            f"pad={A.padding_ratio:.2f} "
            f"A_bytes/nnz={A.padded_tiles*8*A.tile_k//32/ max(A.nnz,1):.1f}"
        )

        # correctness (small RHS)
        N = 128
        rng = np.random.default_rng(1)
        X = rng.standard_normal((ncol, N)).astype(np.float32)
        Xd = jnp.asarray(X)
        Y = np.asarray(bsr_spmm(A, Xd))
        ref = m @ X
        err = np.abs(Y - ref).max() / max(np.abs(ref).max(), 1e-30)
        print(f"[{label}] spmm err={err:.2e}")

        dt, _ = timeit(lambda Xd=Xd, A=A: bsr_spmm(A, Xd), reps=10)
        nnzs = m.nnz / dt
        gflops = 2 * m.nnz * N / dt / 1e9
        print(f"[{label}] spmm N={N}: {dt*1e3:.2f} ms  {nnzs/1e9:.2f} Gnnz/s  {gflops:.0f} GFLOP/s")

        x = rng.standard_normal(ncol).astype(np.float32)
        xd = jnp.asarray(x)
        y = np.asarray(bsr_spmv(A, xd))
        refv = m @ x
        errv = np.abs(y - refv).max() / max(np.abs(refv).max(), 1e-30)
        dt, _ = timeit(lambda xd=xd, A=A: bsr_spmv(A, xd), reps=10)
        print(f"[{label}] spmv err={errv:.2e}  {dt*1e3:.2f} ms  {m.nnz/dt/1e9:.2f} Gnnz/s")


if __name__ == "__main__":
    main()
