"""Stage split of the headline mono product + int8-MXU feasibility.

Round-4 headline question (VERDICT r3 #1): busy 0.256 ms vs the 0.133 ms
format bound — where do the 123 us live? Splits the product into
  (a) X prep  — pad copy + fp32-parity plane stacking (XLA level)
  (b) kernel  — the mono pallas launch on a prepared operand
  (c) trim    — the [:nrow] output slice copy
each measured as a device-chained scan (one dispatch, data-coupled
iterations — bench/timing.time_scan mechanics).

Also probes whether Mosaic lowers s8 x s8 -> s32 dots on v5e (the MXU's
2x int8 rate would cut the 3-plane parity MXU time ~33%).
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

N = 128
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
A = op.fwd
b = A.buckets[0]
print("layout", type(b).__name__, "tm", A.tile_m, "W", b.width,
      "win", b.win_slabs, "ni", b.ns, "dtype", b.panels.dtype,
      "out_strips", b.out_strips, flush=True)

X = jnp.asarray(rng.standard_normal((mb.shape[1], N)), jnp.float32)

# --- full product busy --------------------------------------------------
busy = time_scan(lambda X: op.matmat(X), X, iters=256)
print(f"full matmat busy      {busy*1e3:.3f} ms", flush=True)

# --- stage a: X prep (pad + plane stack) --------------------------------
from fastsparse.ops import bsr_ops


def prep(X):
    Xp, NB, Npad, fold, nq = bsr_ops._prep_mono_x(A, X, N, "highest")
    return Xp


Xp0 = jax.jit(prep)(X)
print("prep out", Xp0.shape, Xp0.dtype, flush=True)
busy_prep = time_scan(lambda X: prep(X), X, iters=256)
print(f"X prep busy           {busy_prep*1e3:.3f} ms", flush=True)

# --- stage b: kernel on a prepared operand ------------------------------
# NOTE: args must be PASSED, not closed over — a closing jit embeds the
# bucket arrays as constants and the standalone compile then hits the
# 16 MB scoped-vmem wall (16.10M) that the production argument-passing
# compile stays under (probed 2026-08-20).
_, NB, Npad, fold, nq = bsr_ops._prep_mono_x(A, X, N, "highest")
TM = A.tile_m
rows = max(b.out_strips, A.n_strips) * TM
from fastsparse.bench.timing import time_fn_stats
from fastsparse.ops.pallas.bsr_spmm import mono_panel_spmm


def kern(window, strip_ids, start_rel, first, panels, Xp):
    return mono_panel_spmm(
        window, strip_ids, start_rel, first, panels, Xp,
        tile_m=TM, tile_k=A.tile_k, width=b.width, win_slabs=b.win_slabs,
        binary=A.binary, n_block=NB, fold=fold, precision="highest",
        out_rows=rows,
    )


kargs = (b.window, b.strip_ids, b.start_rel, b.first, b.panels, Xp0)
ts = time_fn_stats(kern, *kargs, batches=5, reps=30)
print(f"kernel-only wall      {ts['min_ms']:.3f} ms min / "
      f"{ts['median_ms']:.3f} med  (fold={fold})", flush=True)

# --- stage c: trim ------------------------------------------------------
Y0 = kern(*kargs)


def trim(Y):
    return Y[: A.shape[0], :N] * 1.0


busy_trim = time_scan(lambda Y: trim(Y), Y0, iters=256)
print(f"trim copy busy        {busy_trim*1e3:.3f} ms", flush=True)
print(f"prep+trim             {(busy_prep+busy_trim)*1e3:.3f} ms "
      f"(kernel ~ full - this)", flush=True)

# --- int8 MXU probe -----------------------------------------------------
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot_i8(a_ref, b_ref, o_ref):
    o_ref[:] = jax.lax.dot_general(
        a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )


try:
    a8 = jnp.asarray(rng.integers(-3, 4, (256, 768)), jnp.int8)
    b8 = jnp.asarray(rng.integers(-3, 4, (768, 512)), jnp.int8)
    out = pl.pallas_call(
        _dot_i8,
        out_shape=jax.ShapeDtypeStruct((256, 512), jnp.int32),
    )(a8, b8)
    ref = np.asarray(a8, np.int64) @ np.asarray(b8, np.int64)
    ok = (np.asarray(out) == ref).all()
    print("int8 dot lowers:", bool(ok), flush=True)
except Exception as e:
    print("int8 dot FAILED:", repr(e)[:300], flush=True)


# throughput: chained big dots, int8 vs bf16
def _bench_dot(dtype, K=2048):
    M = Nn = 2048
    a = jnp.asarray(rng.integers(-3, 4, (M, K)), dtype) if dtype == jnp.int8 \
        else jnp.asarray(rng.standard_normal((M, K)), dtype)
    bm = jnp.asarray(rng.integers(-3, 4, (K, Nn)), dtype) if dtype == jnp.int8 \
        else jnp.asarray(rng.standard_normal((K, Nn)), dtype)
    acc = jnp.int32 if dtype == jnp.int8 else jnp.float32

    def body(a_ref, b_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            a_ref[:], b_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=acc,
        )

    f = jax.jit(lambda a, bm: pl.pallas_call(
        body, out_shape=jax.ShapeDtypeStruct((M, Nn), acc))(a, bm))
    y = f(a, bm)
    fetch_scalar(y)
    eps = jnp.asarray(1, dtype if dtype == jnp.int8 else dtype)

    def loop(n):
        def it(_, a):
            y = f(a, bm)
            s = (jnp.sum(y) % 2).astype(dtype)
            return a.at[:1, :1].add(s - s + (0 if dtype == jnp.int8 else 0))
        g = jax.jit(lambda a: jax.lax.fori_loop(0, n, it, a))
        fetch_scalar(g(a))
        t0 = time.perf_counter()
        fetch_scalar(g(a))
        return time.perf_counter() - t0

    t1, t2 = loop(128), loop(256)
    dt = (t2 - t1) / 128
    tops = 2 * M * K * Nn / dt / 1e12
    print(f"{jnp.dtype(dtype).name} dot 2048^3: {dt*1e6:.1f} us "
          f"= {tops:.1f} T(FL)OPS", flush=True)


try:
    _bench_dot(jnp.bfloat16)
    _bench_dot(jnp.int8)
except Exception as e:
    print("dot bench failed:", repr(e)[:300], flush=True)
