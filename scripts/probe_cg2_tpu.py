"""CG iteration cost decomposition (round 4).

Suite 5cg measures 0.96 ms/iter while the serialized normal product
(time_scan) is 0.395 ms — locate the other 0.57 ms. Times fixed-length
fori_loops (one dispatch, 256 iters, difference of two lengths):
  a) full CG body (matvec + reductions + axpys, while-free)
  b) CG body with the matvec replaced by a trivial op  -> vector cost
  c) matvec + single axpy (no reductions)              -> reduction cost
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import fetch_scalar, time_scan
from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
mat = banded(50_000, 512, seed=4)
mat.data[:] = 1.0
op = fs.operator(mat, format="bsr", transpose=True)
B = jnp.asarray(rng.standard_normal((mat.shape[1], 32)), jnp.float32)
reg = 50.0

mv = lambda v: op.normal_matmat(v, reg=reg)
busy_mv = time_scan(mv, B, iters=256)
print(f"normal product serialized: {busy_mv*1e3:.3f} ms", flush=True)


def cg_body(mv_fn):
    def body(_, state):
        x, r, p, gamma = state
        q = mv_fn(p)
        denom = jnp.sum(p * q, axis=0)
        alpha = jnp.where(denom != 0, gamma / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * q
        gamma_new = jnp.sum(r * r, axis=0)
        beta = jnp.where(gamma != 0, gamma_new / gamma, 0.0)
        p = r + beta * p
        return (x, r, p, gamma_new)
    return body


def run_loop(body, n, state0):
    g = jax.jit(lambda s: jax.lax.fori_loop(0, n, body, s))
    fetch_scalar(g(state0)[0])
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        fetch_scalar(g(state0)[0])
        best = min(best, time.perf_counter() - t0)
    return best


x0 = jnp.zeros_like(B)
r0 = B
p0 = B
g0 = jnp.sum(r0 * r0, axis=0)
state0 = (x0, r0, p0, g0)

for name, fn in (
    ("full body", mv),
    ("no-matvec body", lambda v: v * 1.0001),
):
    body = cg_body(fn)
    t1 = run_loop(body, 128, state0)
    t2 = run_loop(body, 256, state0)
    print(f"{name}: {(t2-t1)/128*1e3:.3f} ms/iter", flush=True)


def body_axpy(_, state):
    x, r, p, gamma = state
    q = mv(p)
    x = x + 0.5 * p
    r = r - 0.5 * q
    p = r + 0.5 * p
    return (x, r, p, gamma)


t1 = run_loop(body_axpy, 128, state0)
t2 = run_loop(body_axpy, 256, state0)
print(f"matvec+axpy (no reductions): {(t2-t1)/128*1e3:.3f} ms/iter",
      flush=True)
