"""Probe which SMEM index-blocking shapes Mosaic accepts for the
one-program big-bucket gather kernel (ell_bucket_spmm_smem rework).

Variants:
  A. 3-D SMEM operand (nb/G, 8, K) with block (1, 8, K)
  B. 1-D SMEM operand (nb*K,) with block (G*K,)
  C. indices in ANY/HBM + manual async_copy into SMEM scratch
Each variant computes a tiny unit-mode gather SpMM and checks vs numpy.
"""
import functools
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()
G, K, NB = 8, 64, 128
nb = 32  # strips
ncol = 256

rng = np.random.default_rng(0)
cols = rng.integers(0, ncol, (nb, K)).astype(np.int32)
x = rng.standard_normal((ncol, NB)).astype(np.float32)
ref = x[cols].sum(axis=1)  # (nb, NB)


def tick(msg):
    print(f"[{time.perf_counter()-T0:6.1f}s] {msg}", flush=True)


def check(name, fn):
    try:
        y = np.asarray(fn())
        err = np.abs(y - ref).max() / np.abs(ref).max()
        tick(f"{name}: OK rel={err:.2e}")
    except Exception as e:
        tick(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")


# --- A: 3-D SMEM blocks ---------------------------------------------------
def body_a(cols_ref, x_ref, o_ref):
    for g in range(G):
        acc = None
        for k in range(K):
            c = cols_ref[0, g, k]
            d = x_ref[pl.ds(c, 1), :]
            acc = d if acc is None else acc + d
        o_ref[pl.ds(g, 1), :] = acc


def run_a():
    c3 = jnp.asarray(cols.reshape(nb // G, G, K))
    return pl.pallas_call(
        body_a,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((1, G, K), lambda i: (i, 0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ncol, NB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, NB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, NB), jnp.float32),
    )(c3, jnp.asarray(x))


# --- B: 1-D SMEM blocks ---------------------------------------------------
def body_b(cols_ref, x_ref, o_ref):
    for g in range(G):
        acc = None
        for k in range(K):
            c = cols_ref[g * K + k]
            d = x_ref[pl.ds(c, 1), :]
            acc = d if acc is None else acc + d
        o_ref[pl.ds(g, 1), :] = acc


def run_b():
    c1 = jnp.asarray(cols.reshape(-1))
    return pl.pallas_call(
        body_b,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((G * K,), lambda i: (i,),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((ncol, NB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, NB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, NB), jnp.float32),
    )(c1, jnp.asarray(x))


# --- C: manual HBM->SMEM DMA ---------------------------------------------
def body_c(cols_hbm, x_ref, o_ref, scr, sem):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        cols_hbm.at[pl.ds(i * G, G)], scr, sem
    )
    cp.start()
    cp.wait()
    for g in range(G):
        acc = None
        for k in range(K):
            c = scr[g, k]
            d = x_ref[pl.ds(c, 1), :]
            acc = d if acc is None else acc + d
        o_ref[pl.ds(g, 1), :] = acc


def run_c():
    return pl.pallas_call(
        body_c,
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((ncol, NB), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, NB), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nb, NB), jnp.float32),
        scratch_shapes=[
            pltpu.SMEM((G, K), jnp.int32),
            pltpu.SemaphoreType.DMA,
        ],
    )(jnp.asarray(cols), jnp.asarray(x))


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    check("A 3-D SMEM block", run_a)
    check("B 1-D SMEM block", run_b)
    check("C HBM->SMEM DMA ", run_c)


if __name__ == "__main__":
    main()
