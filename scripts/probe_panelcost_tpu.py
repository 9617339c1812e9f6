"""Panel kernel per-strip cost anatomy (one process):
(a) real panel_spmm at the headline shape, (b) static-slice variant
(same FLOPs/DMA, no per-strip dynamic X slice), (c) SG sweep,
(d) fold=False 1-plane bound. Synthetic panel data at headline geometry:
ns=104 strips, w=5 (PK=640), TM=128, X (12544+pad, 384) bf16 resident."""
import functools
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastsparse.bench.timing import time_fn
from fastsparse.ops.pallas import bsr_spmm as K

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)

TM, TK, W = 128, 128, 5
PK = W * TK
ns = 104
n_slabs = 98
NB = 128
fold = True
xnb = 3 * NB if fold else NB

starts = jnp.asarray(np.minimum(np.arange(ns), n_slabs - W), jnp.int32)
panels = jnp.asarray(
    (rng.random((ns, TM, PK)) < 0.4).astype(np.float32), jnp.bfloat16)
x = jnp.asarray(rng.standard_normal((n_slabs * TK, xnb)), jnp.bfloat16)

f = jax.jit(functools.partial(
    K.panel_spmm, tile_m=TM, tile_k=TK, width=W, binary=False,
    n_block=NB, fold=fold, precision="highest"))
y = f(starts, panels, x)
dt = time_fn(f, starts, panels, x, reps=50)
print(f"(a) real panel_spmm 4x: {4*dt*1e3:.3f} ms  ({dt/ns*1e9:.0f} ns/strip)")

# (d) 1-plane (fold=False) bound
x1 = x[:, :NB]
f1 = jax.jit(functools.partial(
    K.panel_spmm, tile_m=TM, tile_k=TK, width=W, binary=False,
    n_block=NB, fold=False, precision="highest"))
f1(starts, panels, x1)
dt1 = time_fn(f1, starts, panels, x1, reps=50)
print(f"(d) 1-plane bound 4x: {4*dt1*1e3:.3f} ms ({dt1/ns*1e9:.0f} ns/strip)")

# (b) static-slice variant: x slice fixed at 0 (wrong math, perf only)
def _body_static(SG, start_ref, panels_ref, x_ref, o_ref):
    mats = panels_ref[:]
    for g in range(SG):
        a = mats[g]
        xs = x_ref[pl.ds(0, PK), :]
        d = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        if fold:
            d = d[:, :NB] + d[:, NB:2*NB] + d[:, 2*NB:]
        o_ref[pl.ds(g * TM, TM), :] = d

def static_variant(starts, panels, x, SG):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, ns // SG),
        in_specs=[
            pl.BlockSpec((SG, TM, PK), lambda j, i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(x.shape[:1] + (xnb,), lambda j, i, s: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((SG * TM, NB), lambda j, i, s: (i, j),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_body_static, SG),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns * TM, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(starts, panels, x)

for SG in (8, 4, 2, 1):
    fs_ = jax.jit(functools.partial(static_variant, SG=SG))
    fs_(starts, panels, x)
    dts = time_fn(fs_, starts, panels, x, reps=50)
    print(f"(b) static-slice SG={SG} 4x: {4*dts*1e3:.3f} ms ({dts/ns*1e9:.0f} ns/strip)")
