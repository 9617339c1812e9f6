"""Verify driver: public API on the real TPU (see .claude/skills/verify)."""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import fastsparse as fs
from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()


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
    print(f"  {name}: max_abs_err={err.max():.2e} rel={err.max()/scale:.2e} {'OK' if ok else 'FAIL'}")
    assert ok, name


def bench(name, f, *args, reps=10, nnz=None, flops=None):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(*args)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / reps
    extra = ""
    if nnz:
        extra += f" {nnz/dt/1e9:.3f} Gnnz/s"
    if flops:
        extra += f" {flops/dt/1e12:.3f} TFLOP/s"
    print(f"  {name}: {dt*1e3:.3f} ms{extra}")
    return dt


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    print("devices:", jax.devices())

    # --- empty matrix through every format -------------------------------
    e = sp.csr_matrix((64, 48), dtype=np.float32)
    for build in (fs.build_ell, fs.build_bsr):
        A = build(fs.coo_from_scipy(e, dtype=np.float32))
        y = fs.spmv(A, jnp.ones(48, jnp.float32))
        assert np.asarray(y).max() == 0
    print("empty matrix: OK")

    # --- valued fp32: ELL + BSR vs scipy ----------------------------------
    m = powerlaw(20_000, 20_000, 1_000_000, seed=0)
    rng = np.random.default_rng(1)
    x = rng.standard_normal(m.shape[1]).astype(np.float32)
    X = rng.standard_normal((m.shape[1], 128)).astype(np.float32)
    xd, Xd = jnp.asarray(x), jnp.asarray(X)

    coo = fs.coo_from_scipy(m, dtype=np.float32)
    ell = fs.build_ell(coo)
    print(f"ELL: padded/nnz={ell.padding_ratio:.2f}")
    check("ell spmv", jax.jit(fs.spmv)(ell, xd), m @ x)
    bench("ell spmv (XLA)", jax.jit(fs.spmv), ell, xd, nnz=m.nnz)

    bsr = fs.build_bsr(coo)
    print(f"BSR: tiles={bsr.n_tiles} occ={bsr.tile_occupancy:.4f} pad={bsr.padding_ratio:.2f}")
    check("bsr spmv", fs.spmv(bsr, xd), m @ x)
    check("bsr spmm", fs.spmm(bsr, Xd), m @ X)
    bench("bsr spmv (pallas)", fs.spmv, bsr, xd, nnz=m.nnz)
    bench(
        "bsr spmm N=128 (pallas)", fs.spmm, bsr, Xd,
        nnz=m.nnz, flops=2 * m.nnz * 128,
    )

    # --- binary bitmask BSR ------------------------------------------------
    mb = powerlaw(20_000, 20_000, 1_000_000, seed=2, binary=True)
    op = fs.operator(mb)  # auto: bitmask BSR + dual tiling
    check("binary op matvec", op.matvec(xd), mb @ x)
    check("binary op rmatvec", op.rmatvec(xd), mb.T @ x, rtol=5e-4, atol=5e-4)
    ref = mb.T @ (mb @ X) + 0.1 * X
    check("binary op normal_matmat", op.normal_matmat(Xd, reg=0.1), ref, 2e-3, 2e-3)
    bench(
        "binary AtA·X N=128 (pallas)",
        jax.jit(lambda op, X: op.normal_matmat(X, reg=0.1)), op, Xd,
        nnz=2 * mb.nnz, flops=4 * mb.nnz * 128,
    )

    print("ALL OK")


if __name__ == "__main__":
    main()
