"""Scratch-planes fold A/B at tm=256 (one process).

Pre-scratch (2026-08-20, same-hour): fold 0.813 ms vs DEFAULT 0.535 —
the per-item plane split was ~0.28 ms. With per-WINDOW planes in VMEM
scratch, fold should sit ~2 extra MXU passes above DEFAULT (~0.1 ms).
Also: bitmask at tm=256, and N=1/narrow under the scratch kernel.
"""
import dataclasses

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
from fastsparse.formats.bsr import build_bsr
from fastsparse.formats.coo import binary_coo_from_scipy
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

cfg = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=256)
coo = binary_coo_from_scipy(mb.tocoo())


def run(tag, A, X, ref, precision="highest", reps=30):
    f = jax.jit(lambda A, X: BO.bsr_spmm(A, X, precision=precision))
    Y = np.asarray(f(A, X))
    err = float(np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30))
    dt = time_fn(f, A, X, reps=reps)
    print(f"{tag}: {dt * 1e3:.3f} ms rel={err:.2e} "
          f"B/nnz={tree_nbytes(A) / nnz:.2f}", flush=True)
    return dt


A_bf16 = build_bsr(coo, config=cfg)
b = A_bf16.buckets[0]
print(f"geometry: W={b.width} ni={b.ns} win={b.win_slabs} "
      f"nwin={b.n_windows}", flush=True)
run("fold+scratch N=128", A_bf16, X128, ref128)
run("DEFAULT      N=128", A_bf16, X128, ref128, precision="default")
run("narrow       N=1  ", A_bf16, x1, ref128[:, :1])
run("narrow       N=8  ", A_bf16, X128[:, :8], ref128[:, :8])

A_bits = build_bsr(coo, config=cfg, binary=True)
run("bitmask fold N=128", A_bits, X128, ref128)
run("bitmask      N=1  ", A_bits, x1, ref128[:, :1])

# tm=128 under the scratch kernel (bytes-vs-items tradeoff re-check)
cfg128 = dataclasses.replace(DEFAULT, bsr_mono="force", tile_m=128)
A_128 = build_bsr(coo, config=cfg128)
run("fold+scratch tm=128 N=128", A_128, X128, ref128)
run("narrow tm=128 N=1        ", A_128, x1, ref128[:, :1])
