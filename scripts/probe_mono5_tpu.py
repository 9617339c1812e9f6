"""Byte-cut levers at the tm=256 mono operating point (one process).

(a) anchor: bf16 fold N=128 / N=1;
(b) DEFAULT precision (1 MXU pass, no plane math) — isolates the
    in-kernel plane-split share;
(c) int8 panels with a 0/1 WHERE-SELECT instead of the int8->bf16 cast
    (the cast measured +~1 us/item at tm=128 — Mosaic integer convert is
    slow; compare-select may lower better for binary values);
(d) bitmask panels at tm=256 (expansion amortized over taller items).
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
from fastsparse.ops.pallas import bsr_spmm as K

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


A_bf16 = build_bsr(coo, config=cfg)  # bf16-valued default
run("(a) bf16 fold N=128", A_bf16, X128, ref128)
run("(a) bf16 narrow N=1", A_bf16, x1, ref128[:, :1])
run("(b) bf16 DEFAULT N=128", A_bf16, X128, ref128, precision="default")

# (c) int8 with where-select expansion (binary values): monkeypatch the
# kernel's int8 handling before any int8 program compiles
_orig = K._mono_body


def _mono_body_sel(binary, PK, TK, TM, NB, fold, prec,
                   win_ref, strip_ref, start_ref, first_ref, panels_ref,
                   x_ref, o_ref):
    import functools as _ft  # noqa: F401
    del win_ref, strip_ref
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    i = pl.program_id(1)
    a = panels_ref[0]
    if binary:
        a = K._expand_bits(a, PK, jnp.float32)
        if fold or x_ref.dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
    elif a.dtype == jnp.int8:
        a = jnp.where(
            a != 0, jnp.bfloat16(1.0), jnp.bfloat16(0.0)
        )  # 0/1 select, no integer convert
    st = start_ref[i]
    xs = x_ref[pl.ds(st * TK, PK), :]
    if fold == "f32":
        x0 = xs.astype(jnp.bfloat16)
        r1 = xs - x0.astype(jnp.float32)
        xp1 = r1.astype(jnp.bfloat16)
        xp2 = (r1 - xp1.astype(jnp.float32)).astype(jnp.bfloat16)
        d = (
            jnp.dot(a, x0, preferred_element_type=jnp.float32)
            + jnp.dot(a, xp1, preferred_element_type=jnp.float32)
            + jnp.dot(a, xp2, preferred_element_type=jnp.float32)
        )
    else:
        a2, xs2 = K._match_dot_dtypes(a, xs)
        p = None if a2.dtype == jnp.bfloat16 else prec
        d = jnp.dot(a2, xs2, preferred_element_type=jnp.float32, precision=p)
        if fold:
            d = d[:, :NB] + d[:, NB:2 * NB] + d[:, 2 * NB:]
    f = first_ref[i]

    @pl.when(f == 1)
    def _():
        o_ref[:] = d

    @pl.when(f == 0)
    def _():
        o_ref[:] += d


K._mono_body = _mono_body_sel
A_i8 = build_bsr(coo, config=cfg, dtype=jnp.int8, binary=False)
run("(c) int8-select N=128", A_i8, X128, ref128)
run("(c) int8-select N=1  ", A_i8, x1, ref128[:, :1])
K._mono_body = _orig

# (d) bitmask at tm=256
A_bits = build_bsr(coo, config=cfg, binary=True)
run("(d) bitmask N=128", A_bits, X128, ref128)
run("(d) bitmask N=1  ", A_bits, x1, ref128[:, :1])
