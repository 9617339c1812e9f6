"""Verify + measure the bf16-valued-tile default for binary BSR
(Config.binary_tiles) through operator() on real TPU.

Configs: headline banded 50k bw512 (ColSegmented BSR), ecfp 50k x 20k
(hybrid), rmat s18 (hybrid+plan). A/B vs bitmask tiles in ONE process.
"""
import dataclasses
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, ecfp_like, rmat
from fastsparse.bench.timing import time_fn

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def run_pair(name, mat, reorder=None, fmt="auto", tol=2e-6):
    rng = np.random.default_rng(1)
    X = jnp.asarray(rng.standard_normal((mat.shape[1], 128)), jnp.float32)
    ref = mat[:256] @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30
    for tiles in ("bitmask", "bf16"):
        cfg = fs.Config(binary_tiles=tiles)
        t0 = time.perf_counter()
        op = fs.operator(
            mat, format=fmt, transpose=False, reorder=reorder, config=cfg
        )
        tb = time.perf_counter() - t0
        f = jax.jit(lambda op, X: op.matmat(X))
        Y = np.asarray(f(op, X))
        err = float(np.abs(Y[:256] - ref).max() / sc)
        dt = time_fn(f, op, X, reps=15)
        tick(
            f"{name} {tiles:>7}: {dt*1e3:7.3f} ms rel={err:.1e} "
            f"(build {tb:.0f}s, fmt {type(op.fwd).__name__})"
        )
        assert err < tol, (name, tiles, err)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")

    import sys
    only = sys.argv[1] if len(sys.argv) > 1 else "all"
    if only in ("all", "banded"):
        mb = banded(50_000, 512, seed=4, density=0.39)
        mb.data[:] = 1.0
        run_pair("banded 50k bw512", mb, fmt="bsr")

    if only in ("all", "ecfp"):
        me = ecfp_like(50_000, 20_000)
        run_pair("ecfp 50k x 20k  ", me, reorder="tilepack")

    if only not in ("all", "rmat"):
        tick("done"); return
    mr = rmat(18, seed=1)
    run_pair("rmat s18        ", mr, reorder="degree", tol=6e-6)

    tick("done")


if __name__ == "__main__":
    main()
