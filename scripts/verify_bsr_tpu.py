"""Focused TPU verify: Pallas BSR kernels only (fastest path to signal).

Shapes chosen to be stable across runs so the persistent compile cache
hits. Run me with: PYTHONUNBUFFERED=1 PYTHONPATH=/root/repo python ...
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import fastsparse as fs
from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def powerlaw(nrow, ncol, nnz, seed, alpha=1.6, binary=False):
    rng = np.random.default_rng(seed)
    r = (nrow * (rng.random(nnz) ** alpha)).astype(np.int64) % nrow
    c = (ncol * (rng.random(nnz) ** alpha)).astype(np.int64) % ncol
    m = sp.coo_matrix(
        (rng.standard_normal(nnz).astype(np.float32), (r, c)), shape=(nrow, ncol)
    )
    m.sum_duplicates()
    if binary:
        m.data[:] = 1.0
    return m.tocsr()


def check(name, got, ref, rtol=2e-4, atol=2e-4):
    got = np.asarray(got)
    err = np.abs(got - ref)
    scale = np.abs(ref).max() + 1e-30
    ok = err.max() <= atol + rtol * scale
    tick(f"{name}: rel={err.max()/scale:.2e} {'OK' if ok else 'FAIL'}")
    assert ok, name


def bench(name, f, *args, reps=10, nnz=None):
    from fastsparse.bench.timing import time_fn

    dt = time_fn(f, *args, reps=reps)
    tick(f"{name}: {dt*1e3:.3f} ms" + (f" {nnz/dt/1e9:.3f} Gnnz/s" if nnz else ""))


def main():
    assert jax.default_backend() == "tpu"
    tick("start")
    N = 128
    m = powerlaw(20_000, 20_000, 1_000_000, seed=0)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(m.shape[1]), jnp.float32)
    X = jnp.asarray(rng.standard_normal((m.shape[1], N)), jnp.float32)

    # build WITHOUT the on-device sort in the way (direct host scipy -> bsr)
    A = fs.build_bsr(fs.coo_from_scipy(m, dtype=np.float32))
    tick(f"build_bsr: tiles={A.n_tiles} occ={A.tile_occupancy:.4f}")

    from fastsparse.ops.bsr_ops import bsr_spmm, bsr_spmv

    check("spmm resident-or-auto", bsr_spmm(A, X), m @ np.asarray(X))
    bench("spmm N=128", bsr_spmm, A, X, nnz=m.nnz)
    check("spmv", bsr_spmv(A, x), m @ np.asarray(x))
    bench("spmv", bsr_spmv, A, x, nnz=m.nnz)

    mb = powerlaw(20_000, 20_000, 1_000_000, seed=2, binary=True)
    B = fs.build_bsr(fs.binary_coo_from_scipy(mb))
    tick(f"build_bsr binary: tiles={B.n_tiles}")
    check("binary spmm (3-pass planes)", bsr_spmm(B, X), mb @ np.asarray(X))
    bench("binary spmm N=128", bsr_spmm, B, X, nnz=mb.nnz)
    check("binary spmv", bsr_spmv(B, x), mb @ np.asarray(x))

    # gather engine (hypersparse auto path)
    op = fs.operator(m, reorder="auto", transpose=False, dtype=np.float32)
    tick(f"auto format: {type(op.fwd).__name__}")
    check("auto op spmm", op.matmat(X), m @ np.asarray(X))
    bench("auto op spmm N=128", lambda o, Xd: o.matmat(Xd), op, X, nnz=m.nnz)

    # hybrid on mixed structure
    from fastsparse.bench.matrices import banded

    mh = (banded(8192, 96, seed=7) +
          powerlaw(8192, 8192, 60_000, seed=8)).tocsr()
    H = fs.build_hybrid(fs.coo_from_scipy(mh, dtype=np.float32), threshold=32)
    Xh = jnp.asarray(np.random.default_rng(9).standard_normal(
        (8192, 128)), jnp.float32)
    check("hybrid spmm", fs.spmm(H, Xh), mh @ np.asarray(Xh), rtol=5e-4, atol=5e-4)
    tick(f"hybrid dense_frac={H.dense_fraction:.2f}")
    tick("ALL OK")


if __name__ == "__main__":
    main()
