"""TPU verify: tilepack reordering end-to-end through the public API.

Builds operator(reorder=...) on an ECFP-like matrix (the Macau workload,
SURVEY.md §1.1), checks SpMM against scipy at fp32 parity, and times
minhash vs tilepack orderings on the real chip.
"""
import time

import numpy as np

import fastsparse as fs
from fastsparse.bench.matrices import ecfp_like
from fastsparse.bench.timing import fetch_scalar, time_fn
from fastsparse.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    import jax

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    fetch_scalar(jax.numpy.ones((8,)) + 1)
    print(f"probe fetch ok ({time.perf_counter() - t0:.1f}s)", flush=True)

    m = ecfp_like(20000, 16384, bits_per_compound=64, n_scaffolds=120)
    X = np.random.default_rng(0).standard_normal((16384, 128)).astype(np.float32)
    want = m @ X

    for reorder in ("minhash", "tilepack"):
        t0 = time.perf_counter()
        op = fs.operator(m, reorder=reorder, transpose=False)
        build_s = time.perf_counter() - t0
        fmt = type(op.fwd).__name__
        import jax as _jax

        step = _jax.jit(lambda o, x: o.matmat(x))
        t0 = time.perf_counter()
        got = np.asarray(step(op, X))
        first_s = time.perf_counter() - t0
        rel = np.abs(got - want).max() / np.abs(want).max()
        sec = time_fn(step, op, X, reps=10)
        nnz = m.nnz
        print(
            f"{reorder:9s} fmt={fmt:14s} build={build_s:6.1f}s first={first_s:6.1f}s "
            f"hot={sec * 1e3:8.3f}ms  {nnz / sec / 1e9:6.2f} Gnnz/s  rel={rel:.2e}",
            flush=True,
        )
        assert rel < 1e-5, f"parity failure under reorder={reorder}: {rel}"
    print("OK", flush=True)


if __name__ == "__main__":
    main()
