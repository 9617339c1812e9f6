"""Session-3 verify: drive the changed paths on the real TPU.

Covers: binary HIGHEST bodies (expand / planes_k / planes_n), bf16-valued
tiles at fp32 parity, ELL batched-scatter SpMM, operator() end-to-end.
Small shapes (<=20k, ~1M nnz) per the verify recipe.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, ecfp_like
from fastsparse.bench.timing import time_fn
from fastsparse.ops.bsr_ops import bsr_spmm

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    # tunnel probe
    v = float(jnp.sum(jnp.ones((8, 128))))
    assert v == 1024.0
    tick("tunnel ok")

    rng = np.random.default_rng(3)
    mb = banded(8_192, 384, seed=4, density=0.35).tocsr()
    mb.data[:] = 1.0
    X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
    ref = mb[:256] @ np.asarray(X)
    scale = np.abs(ref).max()

    coo = fs.binary_coo_from_scipy(mb.tocoo())
    for tile_m in (32, 128):
        cfg = fs.Config(tile_m=tile_m)
        A_bits = fs.build_bsr(coo, config=cfg)
        for path in ("expand", "planes_k", "planes_n"):
            f = jax.jit(lambda A, X, p=path: bsr_spmm(A, X, binary_path=p))
            Y = np.asarray(f(A_bits, X))
            err = float(np.abs(Y[:256] - ref).max() / scale)
            dt = time_fn(f, A_bits, X, reps=10)
            tick(
                f"tm={tile_m:>3} bits/{path:>8}: {dt*1e3:7.3f} ms "
                f"({mb.nnz/dt/1e9:6.3f} Gnnz/s) rel={err:.2e}"
            )
            assert err < 2e-6, (path, tile_m, err)
        A_bf = fs.build_bsr(coo, config=cfg, binary=False, dtype="bfloat16")
        f = jax.jit(bsr_spmm)
        Y = np.asarray(f(A_bf, X))
        err = float(np.abs(Y[:256] - ref).max() / scale)
        dt = time_fn(f, A_bf, X, reps=10)
        tick(
            f"tm={tile_m:>3} bf16/valued  : {dt*1e3:7.3f} ms "
            f"({mb.nnz/dt/1e9:6.3f} Gnnz/s) rel={err:.2e}"
        )
        assert err < 2e-6, ("bf16", tile_m, err)

    # ELL batched-scatter path (gather engine) on an ecfp-like slice
    me = ecfp_like(12_000, 8_192, seed=7).tocsr().astype(np.float32)
    op = fs.operator(me, format="ell")
    Xe = jnp.asarray(
        rng.standard_normal((me.shape[1], 64)), jnp.float32
    )
    Ye = np.asarray(op.matmat(Xe))
    refe = me @ np.asarray(Xe)
    erre = float(np.abs(Ye - refe).max() / (np.abs(refe).max() + 1e-30))
    tick(f"ell operator matmat rel={erre:.2e}")
    assert erre < 2e-6, erre

    # operator auto end-to-end on the banded matrix (hits BSR + dual tiling)
    opb = fs.operator(mb, format="auto")
    yb = np.asarray(opb.matvec(np.asarray(X[:, 0])))
    refv = mb @ np.asarray(X[:, 0])
    errv = float(
        np.abs(yb - refv).max() / (np.abs(refv).max() + 1e-30)
    )
    tick(
        f"operator(auto) matvec rel={errv:.2e} fmt={type(opb.fwd).__name__}"
    )
    assert errv < 2e-6, errv
    tick("ALL OK")


if __name__ == "__main__":
    main()
