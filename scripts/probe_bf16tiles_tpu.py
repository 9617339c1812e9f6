"""TPU A/B at genuinely VMEM-resident X (ncol=16384): bitmask tiles
(expand / planes_k / planes_n) vs bf16-VALUED tiles (planes_n, no
expansion) vs valued f32 (HIGHEST), one process.

The earlier 50k-col probe was invalid: every unsegmented path silently
fell back to the same streamed program (X panel > 12 MB), so the numbers
were noise on identical code. The real headline runs 16384-col segments.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_fn
from fastsparse.ops.bsr_ops import bsr_spmm

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu"
    tick("start")
    n_rhs = 128
    rng = np.random.default_rng(1)
    mb = banded(16_384, 512, seed=4, density=0.39).tocsr()
    mb.data[:] = 1.0
    nnz = int(mb.nnz)
    X = jnp.asarray(rng.standard_normal((mb.shape[1], n_rhs)), jnp.float32)
    ref = mb[:256] @ np.asarray(X)
    scale = np.abs(ref).max() + 1e-30

    for tile_m in (128, 32, 8):
        coo = fs.binary_coo_from_scipy(mb.tocoo())
        cfg = fs.Config(tile_m=tile_m)
        A_bits = fs.build_bsr(coo, config=cfg)
        A_bf16 = fs.build_bsr(coo, config=cfg, binary=False, dtype="bfloat16")
        A_f32 = fs.build_bsr(coo, config=cfg, binary=False)
        cases = [
            ("bits/expand", A_bits, dict(binary_path="expand")),
            ("bits/planes_k", A_bits, dict(binary_path="planes_k")),
            ("bits/planes_n", A_bits, dict(binary_path="planes_n")),
            ("bf16/planes_n", A_bf16, {}),
            ("bf16/default1p", A_bf16, dict(precision="default")),
            ("f32/highest", A_f32, {}),
        ]
        for name, A, kw in cases:
            f = jax.jit(lambda A, X, kw=tuple(kw.items()): bsr_spmm(A, X, **dict(kw)))
            Y = np.asarray(f(A, X))
            err = float(np.abs(Y[:256] - ref).max() / scale)
            dt = time_fn(f, A, X, reps=10)
            tick(
                f"tm={tile_m:>3} {name:>14}: {dt*1e3:7.3f} ms "
                f"({nnz/dt/1e9:6.3f} Gnnz/s) rel={err:.2e}"
            )
            lim = 3e-2 if "default" in name else 2e-5
            assert err < lim, (name, err)
    tick("done")


if __name__ == "__main__":
    main()
