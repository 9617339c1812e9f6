"""Mono kernel anatomy on the real chip: bytes levers + busy-vs-wall.

At the headline config (banded 50k bw512 binary, tile_m=128, win=80):
(a) bf16 anchor wall + device-chained busy (time_scan),
(b) precision=default 1-pass (MXU share),
(c) int8 panels (half the A bytes),
(d) bitmask panels (1/16 the A bytes; in-kernel expansion cost),
(e) normal-equation mono_chain vs two separate products,
(f) tile_m=256 (fewer, taller items — per-item overhead share).
"""
import dataclasses
import functools

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.metrics import tree_nbytes
from fastsparse.bench.timing import measure_rtt, time_fn, time_scan
from fastsparse.config import DEFAULT
from fastsparse.ops import bsr_ops as BO

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
nnz = int(mb.nnz)

X128 = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
x1 = X128[:, :1]
ref128 = (mb @ np.asarray(X128)).astype(np.float64)


def bench(tag, op, X, ref, reps=30):
    step = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(step(op, X))
    err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
    dt = time_fn(step, op, X, reps=reps)
    print(f"{tag}: {dt * 1e3:.3f} ms rel={err:.2e} "
          f"a_bytes/nnz={tree_nbytes(op.fwd) / nnz:.2f}", flush=True)
    return dt


cfg = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=128)

# (a) bf16 anchor
op_bf16 = fs.operator(mb, format="bsr", transpose=True, config=cfg)
assert op_bf16.fwd.is_mono
dt_a = bench("(a) bf16 N=128 wall", op_bf16, X128, ref128)
busy = time_scan(lambda X: op_bf16.matmat(X), X128, iters=40)
print(f"(a) bf16 N=128 busy (chained): {busy * 1e3:.3f} ms", flush=True)
dt_a1 = bench("(a) bf16 N=1   wall", op_bf16, x1, ref128[:, :1])
busy1 = time_scan(lambda x: op_bf16.matmat(x), x1, iters=40)
print(f"(a) bf16 N=1   busy (chained): {busy1 * 1e3:.3f} ms", flush=True)

# (b) precision=default single-pass (parity off — MXU share probe)
A = op_bf16.fwd
f_def = jax.jit(functools.partial(BO.bsr_spmm, precision="default"))
Yd = np.asarray(f_def(A, X128))
errd = float(np.abs(Yd - ref128).max() / np.abs(ref128).max())
dtd = time_fn(f_def, A, X128, reps=30)
print(f"(b) default-prec N=128: {dtd * 1e3:.3f} ms rel={errd:.2e}", flush=True)

# (c) int8 panels
from fastsparse.formats.bsr import build_bsr
from fastsparse.formats.coo import binary_coo_from_scipy

coo = binary_coo_from_scipy(mb.tocoo())
A8 = build_bsr(coo, config=cfg, dtype=jnp.int8, binary=False)
assert A8.is_mono and A8.dtype == jnp.int8
f8 = jax.jit(BO.bsr_spmm)
Y8 = np.asarray(f8(A8, X128))
err8 = float(np.abs(Y8 - ref128).max() / np.abs(ref128).max())
dt8 = time_fn(f8, A8, X128, reps=30)
print(f"(c) int8 N=128: {dt8 * 1e3:.3f} ms rel={err8:.2e} "
      f"a_bytes/nnz={tree_nbytes(A8) / nnz:.2f}", flush=True)
Y81 = np.asarray(f8(A8, x1))
err81 = float(np.abs(Y81 - ref128[:, :1]).max() / np.abs(ref128[:, :1]).max())
dt81 = time_fn(f8, A8, x1, reps=30)
print(f"(c) int8 N=1:   {dt81 * 1e3:.3f} ms rel={err81:.2e}", flush=True)
busy81 = time_scan(lambda x: f8(A8, x), x1, iters=40)
print(f"(c) int8 N=1   busy (chained): {busy81 * 1e3:.3f} ms", flush=True)

# (d) bitmask panels
Ab = build_bsr(coo, config=cfg, binary=True)
assert Ab.is_mono and Ab.binary
Yb = np.asarray(f8(Ab, X128))
errb = float(np.abs(Yb - ref128).max() / np.abs(ref128).max())
dtb = time_fn(f8, Ab, X128, reps=30)
print(f"(d) bitmask N=128: {dtb * 1e3:.3f} ms rel={errb:.2e} "
      f"a_bytes/nnz={tree_nbytes(Ab) / nnz:.2f}", flush=True)
Yb1 = np.asarray(f8(Ab, x1))
errb1 = float(np.abs(Yb1 - ref128[:, :1]).max() / np.abs(ref128[:, :1]).max())
dtb1 = time_fn(f8, Ab, x1, reps=30)
print(f"(d) bitmask N=1:   {dtb1 * 1e3:.3f} ms rel={errb1:.2e}", flush=True)
busyb1 = time_scan(lambda x: f8(Ab, x), x1, iters=40)
print(f"(d) bitmask N=1  busy (chained): {busyb1 * 1e3:.3f} ms", flush=True)

# (e) normal equations: mono_chain vs two separate products
Xn = X128[:, :32]
refn = (mb.T @ (mb @ np.asarray(Xn))).astype(np.float64)
fchain = jax.jit(lambda op, X: op.normal_matmat(X))
Yc = np.asarray(fchain(op_bf16, Xn))
errc = float(np.abs(Yc - refn).max() / np.abs(refn).max())
dtc = time_fn(fchain, op_bf16, Xn, reps=30)
fsep = jax.jit(lambda op, X: op.rmatmat(op.matmat(X)))
dts = time_fn(fsep, op_bf16, Xn, reps=30)
dtf = time_fn(jax.jit(lambda op, X: op.matmat(X)), op_bf16, Xn, reps=30)
print(f"(e) normal N=32 chain: {dtc * 1e3:.3f} ms rel={errc:.2e} | "
      f"separate: {dts * 1e3:.3f} ms | one fwd: {dtf * 1e3:.3f} ms",
      flush=True)

# (f) tile_m=256
try:
    cfg256 = dataclasses.replace(cfg, tile_m=256)
    op256 = fs.operator(mb, format="bsr", transpose=False, config=cfg256)
    b = op256.fwd.buckets[0]
    print(f"(f) tm=256: W={b.width} ni={b.ns}", flush=True)
    bench("(f) tm=256 bf16 N=128", op256, X128, ref128)
except Exception as e:
    print(f"(f) tm=256 FAILED: {repr(e)[:300]}", flush=True)
