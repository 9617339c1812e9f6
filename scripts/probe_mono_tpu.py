"""Mono-panel kernel A/B on the real chip (one process).

Measures the single-launch mono layout against the current auto layout
(column-segmented per-class panels) on the driver headline config
(banded 50k bw512 binary, N=128) plus SpMV / narrow-RHS shapes, sweeping
MONO_WIN_SLABS. Parity asserted vs scipy at every point.
"""
import dataclasses
import sys
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.metrics import tree_nbytes
from fastsparse.bench.timing import measure_rtt, time_fn
from fastsparse.config import DEFAULT
from fastsparse.formats import bsr as fbsr

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
nnz = int(mb.nnz)
print(f"banded 50k bw512 nnz={nnz}", flush=True)

X128 = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
X8 = X128[:, :8]
x1 = X128[:, :1]
ref128 = (mb @ np.asarray(X128)).astype(np.float64)


def run(op, X, ref, reps=30):
    step = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(step(op, X))
    err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
    dt = time_fn(step, op, X, reps=reps)
    return dt, err


# --- baseline: current auto layout (bsr_mono off) -------------------------
# tile_m=128 replicates the best_tile_m auto-override (operator() only
# applies it when config IS the DEFAULT object)
cfg_off = dataclasses.replace(DEFAULT, bsr_mono="off", tile_m=128)
op0 = fs.operator(mb, format="bsr", transpose=False, config=cfg_off)
t0 = time.time()
dt, err = run(op0, X128, ref128)
print(
    f"auto(no-mono) N=128: {dt * 1e3:.3f} ms rel={err:.2e} "
    f"fmt={type(op0.fwd).__name__} a_bytes/nnz="
    f"{tree_nbytes(op0.fwd) / nnz:.2f} (compile+run {time.time() - t0:.0f}s)",
    flush=True,
)
dt1, err1 = run(op0, x1, ref128[:, :1])
print(f"auto(no-mono) N=1:   {dt1 * 1e3:.3f} ms rel={err1:.2e}", flush=True)
dt8, err8 = run(op0, X8, ref128[:, :8])
print(f"auto(no-mono) N=8:   {dt8 * 1e3:.3f} ms rel={err8:.2e}", flush=True)

# --- mono at several window sizes ------------------------------------------
cfg_force = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=128)
for win in (int(sys.argv[1]),) if len(sys.argv) > 1 else (80, 64, 96):
    fbsr.MONO_WIN_SLABS = win
    try:
        t0 = time.time()
        opm = fs.operator(mb, format="bsr", transpose=False, config=cfg_force)
        A = opm.fwd
        b = A.buckets[0]
        print(
            f"-- mono win={win}: W={b.width} ni={b.ns} nwin={b.n_windows} "
            f"a_bytes/nnz={tree_nbytes(A) / nnz:.2f} "
            f"(build {time.time() - t0:.0f}s)",
            flush=True,
        )
        t0 = time.time()
        dt, err = run(opm, X128, ref128)
        print(
            f"mono win={win} N=128: {dt * 1e3:.3f} ms rel={err:.2e} "
            f"(compile+run {time.time() - t0:.0f}s)",
            flush=True,
        )
        dt1, err1 = run(opm, x1, ref128[:, :1])
        print(f"mono win={win} N=1:   {dt1 * 1e3:.3f} ms rel={err1:.2e}",
              flush=True)
        dt8, err8 = run(opm, X8, ref128[:, :8])
        print(f"mono win={win} N=8:   {dt8 * 1e3:.3f} ms rel={err8:.2e}",
              flush=True)
    except Exception as e:
        print(f"mono win={win} FAILED: {repr(e)[:300]}", flush=True)
