"""TPU probe: MXU row utilization via tile_m on the blocked-binary headline.

(8x128) tiles use 8 of 128 MXU rows per pass; (32/128 x 128) tiles cut
grid steps 4-16x and fill the systolic array. Bitmask storage keeps even a
128x128 binary tile at 2 KB.
"""
import time

import numpy as np

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import fetch_scalar, time_fn
from fastsparse.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    fetch_scalar(jnp.ones((8,)) + 1)
    print(f"probe ok ({time.perf_counter() - t0:.0f}s)", flush=True)

    m = banded(50_000, 512, seed=4, density=0.39)
    m.data[:] = 1.0
    nnz = int(m.nnz)
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.standard_normal((m.shape[1], 128)), jnp.float32)
    want = m[:2048] @ np.asarray(X)

    for tm in (8, 32, 128):
        cfg = fs.Config(tile_m=tm)
        t0 = time.perf_counter()
        op = fs.operator(m, format="bsr", transpose=False, config=cfg)
        build = time.perf_counter() - t0
        step = jax.jit(lambda o, x: o.matmat(x))
        t0 = time.perf_counter()
        got = np.asarray(step(op, X))[:2048]
        first = time.perf_counter() - t0
        rel = np.abs(got - want).max() / np.abs(want).max()
        sec = time_fn(step, op, X, reps=10)
        print(
            f"tile_m={tm:3d}  build={build:5.1f}s first={first:6.1f}s "
            f"hot={sec * 1e3:8.3f} ms  {nnz / sec / 1e9:5.2f} Gnnz/s "
            f"{2 * nnz * 128 / sec / 1e9:7.1f} GFLOP/s rel={rel:.1e}",
            flush=True,
        )
        assert rel < 2e-5


if __name__ == "__main__":
    main()
