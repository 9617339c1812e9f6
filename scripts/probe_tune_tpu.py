"""A/B `tune=True` (interval-DP bucket edges) for the bench hypersparse
detail: powerlaw 65k^2/4M through operator().matmat, N=128, one process.

Padding 1.47 -> 1.21 measured on CPU; gather engine is slot-bound
(~2.2 ns/slot) so fewer padded slots should convert ~1:1 into time.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import powerlaw
from fastsparse.bench.timing import time_fn

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    rng = np.random.default_rng(7)
    mat = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    X = jnp.asarray(rng.standard_normal((mat.shape[1], 128)), jnp.float32)
    ref = mat[:256] @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30

    for tune in (False, True):
        t0 = time.perf_counter()
        op = fs.operator(mat, transpose=False, reorder="degree", tune=tune)
        tb = time.perf_counter() - t0
        fmt = op.fwd
        pad = getattr(fmt, "padding_ratio", None)
        if pad is None and getattr(fmt, "sparse", None) is not None:
            pad = fmt.sparse.padding_ratio
        f = jax.jit(lambda op, X: op.matmat(X))
        Y = np.asarray(f(op, X))
        err = float(np.abs(Y[:256] - ref).max() / sc)
        dt = time_fn(f, op, X, reps=10)
        tick(
            f"tune={tune!s:>5}: {dt*1e3:7.3f} ms rel={err:.1e} "
            f"pad={pad:.3f} (build {tb:.0f}s, {type(fmt).__name__})"
        )
        assert err < 5e-6

    tick("done")


if __name__ == "__main__":
    main()
