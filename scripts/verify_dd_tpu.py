"""TPU verify: double-word (fp64-class) paths on real Mosaic.

The XLA:CPU LLVM backend breaks compensated f32 chains (CLAUDE.md);
Mosaic is the authoritative target. Checks the unit dd gather and the
valued dd gather (Dekker TwoProd) against scipy f64 at rtol 1e-10.
"""
import time

import numpy as np
import scipy.sparse as sp

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax

import fastsparse as fs

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(7)

    # unit (binary) dd
    mb = sp.random(4000, 3000, 0.01, format="csr", random_state=3)
    mb.data[:] = 1.0
    A = fs.build_ell(fs.binary_coo_from_scipy(mb.tocoo()))
    X = rng.standard_normal((3000, 32)) * (
        10.0 ** rng.integers(-6, 6, (3000, 32))
    )
    ref = (mb @ X).astype(np.float64)
    Y = fs.spmm_dd(A, X)
    scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300
    rel = float(np.max(np.abs(Y - ref) / scale))
    tick(f"unit dd rel={rel:.2e}")
    assert rel < 1e-10, rel

    # valued dd (Dekker TwoProd in-kernel)
    mv = sp.random(4000, 3000, 0.01, format="csr", random_state=4)
    mv.data[:] = rng.standard_normal(mv.nnz) * (
        10.0 ** rng.integers(-6, 6, mv.nnz)
    )
    Av = fs.build_ell_dd(mv)
    refv = (mv @ X).astype(np.float64)
    Yv = fs.spmm_dd(Av, X)
    scalev = np.abs(refv).max(axis=0, keepdims=True) + 1e-300
    relv = float(np.max(np.abs(Yv - refv) / scalev))
    tick(f"valued dd rel={relv:.2e}")
    assert relv < 1e-10, relv
    tick("ALL OK")


if __name__ == "__main__":
    main()
