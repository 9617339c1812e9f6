"""End-to-end A/B of the round-4 gather-engine kernel rework on the real
driver workload (powerlaw 65k^2 N=128, reorder="degree" — bench.py's
hypersparse detail row).

NEW = whole-row unroll for K<=64 + packed column pairs (2x16-bit/int32,
doubled chunk budget) for larger even K. OLD = the chunked scalar-prefetch
body (round-3 production). Same process, operators rebuilt under each
configuration, jit caches cleared between flips — compiled programs ride
the persistent cache after the first alternation.
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
from fastsparse.ops import ell_ops
from fastsparse.ops.pallas import ell_spmm as ell_k

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def set_new(on: bool):
    if on:
        ell_k._FULL_K_MAX = 64
        ell_k.packed_pair_ok = _orig_ok
        ell_ops._ELL_FULL_K_MAX = 64
        ell_ops.packed_pair_ok = _orig_ok
    else:
        ell_k._FULL_K_MAX = 0
        ell_k.packed_pair_ok = lambda K, nx: False
        ell_ops._ELL_FULL_K_MAX = 0
        ell_ops.packed_pair_ok = lambda K, nx: False
    jax.clear_caches()


_orig_ok = ell_k.packed_pair_ok


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    rng = np.random.default_rng(1)
    mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    X = jnp.asarray(rng.standard_normal((65_536, 128)), jnp.float32)
    ref = (mp @ np.asarray(X)).astype(np.float64)

    results = {"new": 1e9, "old": 1e9}
    for rnd in range(3):
        for name in ("new", "old"):
            set_new(name == "new")
            op = fs.operator(mp, transpose=False, reorder="degree")
            f = jax.jit(lambda op, X: op.matmat(X))
            Y = np.asarray(f(op, X))
            err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
            assert err < 1e-5, f"{name}: rel {err}"
            dt = time_fn(f, op, X, reps=10)
            results[name] = min(results[name], dt)
            tick(f"round {rnd} {name}: {dt*1e3:7.3f} ms (rel {err:.1e})")
    slots = None
    tick(f"BEST new {results['new']*1e3:.3f} ms | old {results['old']*1e3:.3f} ms")


if __name__ == "__main__":
    main()
