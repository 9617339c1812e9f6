"""Panel storage dtype A/B at the headline geometry (ONE process):
bf16 (current), int8 -> bf16 cast, fp8_e4m3 -> bf16 cast, bitmask expand.
0/1 panels are exact in every candidate; X stays 3-plane bf16 (fold)."""
import functools
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastsparse.bench.timing import time_fn

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)

TM, TK, W = 128, 128, 5
PK = W * TK
ns = 104
n_slabs = 98
NB = 128
xnb = 3 * NB

starts = jnp.asarray(np.minimum(np.arange(ns), n_slabs - W), jnp.int32)
mask = (rng.random((ns, TM, PK)) < 0.4)
x = jnp.asarray(rng.standard_normal((n_slabs * TK, xnb)), jnp.bfloat16)

def make(dtype_tag):
    if dtype_tag == "bf16":
        panels = jnp.asarray(mask.astype(np.float32), jnp.bfloat16)
    elif dtype_tag == "i8":
        panels = jnp.asarray(mask.astype(np.int8))
    elif dtype_tag == "f8":
        panels = jnp.asarray(mask.astype(np.float32)).astype(jnp.float8_e4m3fn)
    return panels

def body(cast, SG, start_ref, panels_ref, x_ref, o_ref):
    mats = panels_ref[:]
    if cast:
        mats = mats.astype(jnp.bfloat16)
    for g in range(SG):
        st = start_ref[g + SG * pl.program_id(1)]
        a = mats[g]
        xs = x_ref[pl.ds(st * TK, PK), :]
        d = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        d = d[:, :NB] + d[:, NB:2*NB] + d[:, 2*NB:]
        o_ref[pl.ds(g * TM, TM), :] = d

def run(panels, cast, SG=8):
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
        functools.partial(body, cast, SG),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns * TM, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel")),
    )(starts, panels, x)

ref = None
for tag, cast in [("bf16", False), ("i8", True), ("f8", True)]:
    try:
        panels = make(tag)
        f = jax.jit(functools.partial(run, cast=cast))
        y = np.asarray(f(panels))
        if ref is None:
            ref = y
        ok = np.allclose(y, ref, rtol=1e-5, atol=1e-4)
        dt = time_fn(f, panels, reps=50)
        print(f"{tag}: {dt*1e3:.3f} ms/launch ({dt/ns*1e9:.0f} ns/strip) match={ok}")
    except Exception as e:
        print(f"{tag}: FAILED {repr(e)[:160]}")
