"""A/B the integrated halo narrow engine (BsrMatrix.narrow) against the
per-item mono path on the headline matrix (banded 50k bw512, binary):
SpMV and N=2/4/8, device-chained busy (time_scan), interleaved."""
import dataclasses
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_scan

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(1)
    mat = banded(50_000, 512, seed=4)
    mat.data[:] = 1.0
    op = fs.operator(mat, format="bsr", transpose=False)
    A = op.fwd
    b = A.narrow
    assert b is not None
    tick(f"halo: G={b.group} W={b.width} win={b.win_slabs} "
         f"stride={b.stride} nwin={b.n_windows}")
    op_off = dataclasses.replace(
        op, fwd=dataclasses.replace(A, narrow=None))

    for N in (1, 2, 4, 8):
        X = jnp.asarray(rng.standard_normal((50_000, N)), jnp.float32)
        ref = mat @ np.asarray(X, np.float64)
        best = {"halo": 1e9, "mono": 1e9}
        for o, name in ((op, "halo"), (op_off, "mono")):
            Y = np.asarray(jax.jit(lambda X: o.matmat(X))(X))
            rel = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
            assert rel < 1e-6, f"{name} N={N}: rel {rel}"
        for r in range(4):
            for o, name in ((op, "halo"), (op_off, "mono")):
                dt = time_scan(lambda X: o.matmat(X), X, iters=512)
                best[name] = min(best[name], dt)
        tick(f"N={N}: halo {best['halo']*1e3:.3f} ms | "
             f"mono {best['mono']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
