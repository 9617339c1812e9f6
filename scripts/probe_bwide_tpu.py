"""TPU A/B: binary HIGHEST kernel bodies (expand / planes_k / planes_n).

Times the headline blocked-binary config (banded 50k bw512, N=128) and an
ECFP-like config at each tile height the auto picker uses, all paths in ONE
process (CLAUDE.md: never compare timings across runs).
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


def run_case(name, m, tile_m, n_rhs=128):
    rng = np.random.default_rng(1)
    mb = m.tocsr().astype(np.float32)
    mb.data[:] = 1.0
    A = fs.build_bsr(
        fs.binary_coo_from_scipy(mb.tocoo()), config=fs.Config(tile_m=tile_m)
    )
    X = jnp.asarray(
        rng.standard_normal((mb.shape[1], n_rhs)), jnp.float32
    )
    ref = mb[:256] @ np.asarray(X)
    scale = np.abs(ref).max() + 1e-30
    for path in ("expand", "planes_k", "planes_n"):
        f = jax.jit(
            lambda A, X, p=path: bsr_spmm(A, X, binary_path=p)
        )
        Y = np.asarray(f(A, X))
        err = float(np.abs(Y[:256] - ref).max() / scale)
        dt = time_fn(f, A, X, reps=10)
        tick(
            f"{name} tm={tile_m} {path}: {dt*1e3:.3f} ms "
            f"({mb.nnz/dt/1e9:.3f} Gnnz/s) rel={err:.2e}"
        )
        assert err < 2e-5, (name, path, err)


def main():
    assert jax.default_backend() == "tpu"
    tick("start")
    mb = banded(50_000, 512, seed=4, density=0.39)
    run_case("banded50k", mb, 128)
    run_case("banded50k", mb, 32)
    me = ecfp_like(50_000, 20_000, seed=3)
    run_case("ecfp50k", me, 8)
    tick("done")


if __name__ == "__main__":
    main()
