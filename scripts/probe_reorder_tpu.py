"""VERDICT #7: reorder A/B on the BASELINE config-2 shape (ONE process):
hilbert vs morton-ish (hilbert IS the curve family here) vs degree vs
tilepack vs none, powerlaw 20k^2 1M-nnz fp32 SpMV + 65k^2 4M SpMM N=128."""
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import powerlaw
from fastsparse.bench.timing import time_fn

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(1)

m = powerlaw(20_000, 20_000, 1_000_000, seed=0, dtype=np.float32)
x = jnp.asarray(rng.standard_normal(20_000), jnp.float32)
refv = m @ np.asarray(x).astype(np.float64)
print("== config 2: powerlaw 20k^2 SpMV ==")
for ro in (None, "hilbert", "degree", "tilepack", "auto"):
    op = fs.operator(m, reorder=ro, transpose=False, dtype=np.float32)
    f = jax.jit(lambda op, x: op.matvec(x))
    y = np.asarray(f(op, x))
    rel = float(np.abs(y - refv).max() / np.abs(refv).max())
    dt = time_fn(f, op, x, reps=10)
    print(f"reorder={str(ro):9s}: {dt*1e3:7.3f} ms rel {rel:.1e} "
          f"fmt {type(op.fwd).__name__}")

mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
X = jnp.asarray(rng.standard_normal((65_536, 128)), jnp.float32)
refm = mp @ np.asarray(X).astype(np.float64)
print("== powerlaw 65k^2 SpMM N=128 ==")
for ro in (None, "hilbert", "degree", "tilepack"):
    op = fs.operator(mp, reorder=ro, transpose=False)
    f = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(f(op, X))
    rel = float(np.abs(Y - refm).max() / np.abs(refm).max())
    dt = time_fn(f, op, X, reps=10)
    print(f"reorder={str(ro):9s}: {dt*1e3:7.3f} ms rel {rel:.1e} "
          f"fmt {type(op.fwd).__name__}")
