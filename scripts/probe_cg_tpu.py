"""Decompose the CG per-iteration cost (suite tag 5cg: 2.09 ms/iter vs
0.466 ms for a bare normal step).

Times, same-process on the real chip:
  a) bare jitted normal_matmat (time_fn, reps)
  b) jitted fori_loop of K chained normal steps (one launch, one fetch)
  c) jitted while_loop CG via cg_normal at fixed maxiter
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_fn  # noqa: E402
from fastsparse.solvers.cg import cg_normal  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

mat = banded(50_000, 512, seed=4)
mat.data[:] = 1.0
op = fs.operator(mat, format="bsr", transpose=True)
rng = np.random.default_rng(0)
B = jnp.asarray(rng.standard_normal((mat.shape[1], 32)), jnp.float32)

# a) bare normal step
f = jax.jit(lambda op, X: op.normal_matmat(X, reg=50.0))
dt = time_fn(f, op, B, reps=10)
print(f"a) bare normal step: {dt*1e3:.3f} ms", flush=True)

# b) fori_loop of K chained normal steps
K = 64


@jax.jit
def chain(op, X):
    def body(_, x):
        y = op.normal_matmat(x, reg=50.0)
        return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)

    return jax.lax.fori_loop(0, K, body, X)


r = chain(op, B)
r.block_until_ready()
float(jnp.sum(r))  # warm + fetch
t0 = time.perf_counter()
r = chain(op, B)
float(jnp.sum(r))
dt_loop = time.perf_counter() - t0
print(f"b) fori_loop {K} normal steps: {dt_loop*1e3/K:.3f} ms/iter "
      f"(total {dt_loop*1e3:.1f} ms incl RTT)", flush=True)

# c) full CG fixed 115-iter-ish
res = cg_normal(op, B, reg=50.0, tol=1e-3, maxiter=150)
iters = int(res.iters)
t0 = time.perf_counter()
res = cg_normal(op, B, reg=50.0, tol=1e-3, maxiter=150)
float(jnp.sum(res.x))
dt_cg = time.perf_counter() - t0
print(f"c) cg_normal: {dt_cg*1e3:.1f} ms / {iters} iters = "
      f"{dt_cg*1e3/max(iters,1):.3f} ms/iter", flush=True)
