"""Recalibrate bench/model constants for bf16-valued binary tiles.

1. tile_m sweep (banded 20k bw384, N=128) -> per-tile cost at tm=8/32/128
   (TILE_BASE_S / TILE_ROW_S were measured on bitmask tiles: 147/457/1816
   ns — bf16 tiles skip the expansion).
2. hybrid threshold sweep on ecfp 50k x 20k (tilepack) -> DENSE_TILE_S /
   auto-threshold breakeven.
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

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    rng = np.random.default_rng(2)

    # --- 1. tile_m sweep -------------------------------------------------
    mb = banded(20_000, 384, seed=4, density=0.4)
    mb.data[:] = 1.0
    X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
    ref = mb[:256] @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30
    for tm in (8, 32, 128):
        cfg = fs.Config(tile_m=tm)
        op = fs.operator(mb, format="bsr", transpose=False, config=cfg)
        fmt = op.fwd
        segs = fmt.segments if hasattr(fmt, "segments") else [fmt]
        n_tiles = sum(
            b.slab_ids.size for s in segs for b in s.buckets
        )
        f = jax.jit(lambda op, X: op.matmat(X))
        Y = np.asarray(f(op, X))
        err = float(np.abs(Y[:256] - ref).max() / sc)
        dt = time_fn(f, op, X, reps=15)
        tick(
            f"tm={tm:>3}: {dt*1e3:7.3f} ms {n_tiles} tiles "
            f"{dt/n_tiles*1e9:7.1f} ns/tile rel={err:.1e}"
        )
        assert err < 2e-6

    # --- 2. hybrid threshold sweep --------------------------------------
    me = ecfp_like(50_000, 20_000)
    Xe = jnp.asarray(rng.standard_normal((me.shape[1], 128)), jnp.float32)
    refe = me[:256] @ np.asarray(Xe)
    sce = np.abs(refe).max() + 1e-30
    from fastsparse.formats.hybrid import build_hybrid
    from fastsparse.reorder.cluster import (
        invert_perm,
        permute_coo,
        tilepack_perms,
    )

    coo = fs.binary_coo_from_scipy(me.tocoo())
    rp, cp = tilepack_perms(coo)
    pcoo = permute_coo(coo, rp, cp)
    ri = np.asarray(invert_perm(rp))
    Xp = jnp.asarray(np.asarray(Xe)[np.asarray(cp)])
    for th in (8, 16, 32, 64):
        H = build_hybrid(pcoo, threshold=th)
        f = jax.jit(lambda H, X: fs.spmm(H, X))
        Yp = np.asarray(f(H, Xp))
        Y = Yp[ri][:256]
        err = float(np.abs(Y - refe).max() / sce)
        dt = time_fn(f, H, Xp, reps=15)
        tick(
            f"th={th:>3}: {dt*1e3:7.3f} ms dense_frac={H.dense_fraction:.3f} "
            f"rel={err:.1e}"
        )
        assert err < 3e-6

    tick("done")


if __name__ == "__main__":
    main()
