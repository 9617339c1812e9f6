"""Session-4 consolidated verify: everything changed since the last
real-TPU run, in one process.

1. plan path end-to-end after the _seg_layout refactor (small + powerlaw)
2. spgemm cumsum compaction (rmat13^2, warm timing)
3. tall bf16 tiles tm=256/512 on the headline banded matrix
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, powerlaw, rmat
from fastsparse.bench.timing import time_fn

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    rng = np.random.default_rng(7)

    # 1a. small plan correctness (segmented, binary + valued)
    for binary in (True, False):
        m = powerlaw(4096, 30_000, 120_000, seed=1, binary=binary)
        X = jnp.asarray(rng.standard_normal((30_000, 64)), jnp.float32)
        op = fs.operator(m, format="ell", transpose=False)
        fmt = op.fwd
        assert getattr(fmt, "plan", None) is not None
        Y = np.asarray(op.matmat(X))
        ref = m @ np.asarray(X)
        err = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
        tick(f"plan small binary={binary}: rel={err:.2e}")
        assert err < 2e-6

    # 1b. powerlaw 65k^2 hypersparse (plan, warm shapes)
    mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    opp = fs.operator(mp, transpose=False, reorder="degree")
    Xp = jnp.asarray(rng.standard_normal((65_536, 128)), jnp.float32)
    f = jax.jit(lambda op, X: op.matmat(X))
    Yp = np.asarray(f(opp, Xp))
    refp = mp[:256] @ np.asarray(Xp)
    e = np.abs(Yp[:256] - refp).max() / (np.abs(refp).max() + 1e-30)
    dt = time_fn(f, opp, Xp, reps=10)
    tick(f"powerlaw 65k plan: {dt*1e3:7.3f} ms rel={e:.2e}")
    assert e < 5e-6

    # 2. spgemm with cumsum compaction
    A = rmat(13, 8, seed=5, binary=False)
    B = rmat(13, 8, seed=6, binary=False)
    t0 = time.perf_counter()
    C, info = fs.spgemm(A, B)
    cold = time.perf_counter() - t0
    t0 = time.perf_counter()
    C, info = fs.spgemm(A, B)
    warm = time.perf_counter() - t0
    ref = (A @ B).tocsr()
    assert abs(info["nnz"] - ref.nnz) <= max(16, ref.nnz // 10_000)
    got = np.asarray(C.to_scipy().tocsr()[:256].toarray())
    rs = np.abs(ref[:256].toarray())
    err = np.abs(got - ref[:256].toarray()).max() / (rs.max() + 1e-30)
    tick(
        f"spgemm rmat13^2: warm {warm:5.2f}s (cold {cold:5.2f}s) "
        f"nnz={info['nnz']} rel={err:.1e} "
        f"({info['flops']/warm/1e9:.1f} GFLOP/s)"
    )
    assert err < 1e-4

    # 3. tall bf16 tiles on the headline matrix
    mb = banded(50_000, 512, seed=4, density=0.39)
    mb.data[:] = 1.0
    Xb = jnp.asarray(rng.standard_normal((50_000, 128)), jnp.float32)
    refb = mb[:256] @ np.asarray(Xb)
    scb = np.abs(refb).max() + 1e-30
    for tm in (128, 256, 512):
        cfg = fs.Config(tile_m=tm)
        op = fs.operator(mb, format="bsr", transpose=False, config=cfg)
        fb = jax.jit(lambda op, X: op.matmat(X))
        Yb = np.asarray(fb(op, Xb))
        eb = np.abs(Yb[:256] - refb).max() / scb
        dtb = time_fn(fb, op, Xb, reps=15)
        segs = op.fwd.segments if hasattr(op.fwd, "segments") else [op.fwd]
        ntiles = sum(b.slab_ids.size for s in segs for b in s.buckets)
        tick(
            f"banded tm={tm:>3}: {dtb*1e3:7.3f} ms {ntiles} tiles "
            f"{dtb/ntiles*1e9:6.1f} ns/tile rel={eb:.1e}"
        )
        assert eb < 2e-6

    tick("done")


if __name__ == "__main__":
    main()
