"""Scratch-vs-per-item fold A/B in ONE process (headline, tm=256).

Variants: (a) scratch planes @ win=48 (new default), (b) per-item planes
@ win=48, (c) per-item planes @ win=80 (the former 0.208 ms config).
N=128 and N=1 each.
"""
import dataclasses

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import measure_rtt, time_fn
from fastsparse.config import DEFAULT
from fastsparse.formats import bsr as fbsr
from fastsparse.formats.bsr import build_bsr
from fastsparse.formats.coo import binary_coo_from_scipy
from fastsparse.ops import bsr_ops as BO

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
X128 = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
x1 = X128[:, :1]
ref128 = (mb @ np.asarray(X128)).astype(np.float64)

cfg = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=256)
coo = binary_coo_from_scipy(mb.tocoo())
A48 = build_bsr(coo, config=cfg)  # win=48 default
fbsr.MONO_WIN_SLABS = 80
A80 = build_bsr(coo, config=cfg)
fbsr.MONO_WIN_SLABS = 48

orig = BO.mono_panel_spmm


def run(tag, A, X, ref, scratch=True, reps=30):
    if scratch:
        BO.mono_panel_spmm = orig
    else:
        BO.mono_panel_spmm = lambda *a, **k: orig(
            *a, **dict(k, scratch_planes=False)
        )
    try:
        f = jax.jit(lambda A, X: BO.bsr_spmm(A, X))
        Y = np.asarray(f(A, X))
        err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
        dt = time_fn(f, A, X, reps=reps)
        print(f"{tag}: {dt * 1e3:.3f} ms rel={err:.2e}", flush=True)
    except Exception as e:
        print(f"{tag}: FAILED {repr(e)[:160]}", flush=True)
    finally:
        BO.mono_panel_spmm = orig


for rnd in range(2):
    run(f"[{rnd}] scratch  win=48 N=128", A48, X128, ref128, scratch=True)
    run(f"[{rnd}] per-item win=48 N=128", A48, X128, ref128, scratch=False)
    run(f"[{rnd}] per-item win=80 N=128", A80, X128, ref128, scratch=False)
    run(f"[{rnd}] scratch  win=80 N=128", A80, X128, ref128, scratch=True)
run("narrow win=48 N=1", A48, x1, ref128[:, :1])
run("narrow win=80 N=1", A80, x1, ref128[:, :1])
