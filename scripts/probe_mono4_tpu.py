"""Mono A/B on the headline matrix, one process: grouped (G strips/step)
vs plain mono (G=1 items) vs segmented panels, at tm=128/256; fixed
device-chained busy; chain-vs-separate normal equations interleaved."""
import dataclasses

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
from fastsparse.formats import bsr as fbsr

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
nnz = int(mb.nnz)
X128 = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
x1 = X128[:, :1]
X8 = X128[:, :8]
ref128 = (mb @ np.asarray(X128)).astype(np.float64)


def bench(tag, op, X, ref, reps=30):
    step = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(step(op, X))
    err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
    dt = time_fn(step, op, X, reps=reps)
    b = op.fwd.buckets[0]
    extra = f"G={b.group}" if hasattr(b, "group") else f"ni={b.ns}"
    print(f"{tag}: {dt * 1e3:.3f} ms rel={err:.2e} {extra} W={b.width} "
          f"B/nnz={tree_nbytes(op.fwd) / nnz:.2f} "
          f"nbkt={len(op.fwd.buckets)}", flush=True)
    return dt


ops = {}
for tm in (128, 256):
    cfg = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=tm)
    opg = fs.operator(mb, format="bsr", transpose=True, config=cfg)
    assert opg.fwd.is_mono_grouped, "grouped not selected"
    ops[tm] = opg
    bench(f"grouped tm={tm} N=128", opg, X128, ref128)
    bench(f"grouped tm={tm} N=1  ", opg, x1, ref128[:, :1])
    bench(f"grouped tm={tm} N=8  ", opg, X8, ref128[:, :8])
    old = fbsr.MONO_SPILL_MAX
    fbsr.MONO_SPILL_MAX = -1.0  # force grouped decline -> plain mono
    try:
        opp = fs.operator(mb, format="bsr", transpose=False, config=cfg)
    finally:
        fbsr.MONO_SPILL_MAX = old
    assert opp.fwd.is_mono and not opp.fwd.is_mono_grouped
    bench(f"plain   tm={tm} N=128", opp, X128, ref128)
    bench(f"plain   tm={tm} N=1  ", opp, x1, ref128[:, :1])

# segmented-panel baseline (mono off) at tm=128
cfg_off = dataclasses.replace(DEFAULT, bsr_mono="off", tile_m=128)
op0 = fs.operator(mb, format="bsr", transpose=False, config=cfg_off)
step0 = jax.jit(lambda op, X: op.matmat(X))
Y0 = np.asarray(step0(op0, X128))
e0 = float(np.abs(Y0 - ref128).max() / np.abs(ref128).max())
dt0 = time_fn(step0, op0, X128, reps=30)
print(f"segmented tm=128 N=128: {dt0 * 1e3:.3f} ms rel={e0:.2e}", flush=True)

# busy (device-chained, eps-coupled)
opg = ops[128]
busy = time_scan(lambda X: opg.matmat(X), X128, iters=40)
print(f"busy grouped tm=128 N=128 (x40): {busy * 1e3:.3f} ms", flush=True)
busy1 = time_scan(lambda x: opg.matmat(x), x1, iters=40)
print(f"busy grouped tm=128 N=1   (x40): {busy1 * 1e3:.3f} ms", flush=True)

# chain vs separate, interleaved 3x
Xn = X128[:, :32]
fchain = jax.jit(lambda op, X: op.normal_matmat(X))
fsep = jax.jit(lambda op, X: op.rmatmat(op.matmat(X)))
refn = (mb.T @ (mb @ np.asarray(Xn))).astype(np.float64)
Yc = np.asarray(fchain(opg, Xn))
print(f"chain rel={np.abs(Yc - refn).max() / np.abs(refn).max():.2e}",
      flush=True)
np.asarray(fsep(opg, Xn))
for r in range(3):
    dtc = time_fn(fchain, opg, Xn, reps=30)
    dts = time_fn(fsep, opg, Xn, reps=30)
    print(f"normal N=32 round{r}: chain {dtc * 1e3:.3f} ms | "
          f"separate {dts * 1e3:.3f} ms", flush=True)
