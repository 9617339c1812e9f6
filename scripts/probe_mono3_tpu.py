"""Mono per-item overhead anatomy (synthetic, headline geometry).

Per-item cost at tm=128/W=5 measured 848 ns against a 301 ns panel-DMA
floor — ~550 ns/item of overhead. Variants isolate: item grouping (G
items per grid step, the panel kernel's SG trick), the dynamic in-kernel
X slice, MXU pass count, and the accumulate branch. Synthetic data: one
item per strip (the banded common case), all items in one X window.
"""
import functools

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastsparse.bench.timing import measure_rtt, time_fn

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
TM, TK, W = 128, 128, 5
PK = W * TK
NI = 400
WIN = 80
NB = 128
win_rows = WIN * TK

starts = jnp.asarray(
    np.minimum(np.arange(NI) % (WIN - W), WIN - W), jnp.int32
)
panels = jnp.asarray(
    (rng.random((NI, TM, PK)) < 0.3).astype(np.float32), jnp.bfloat16
)
xw = jnp.asarray(rng.standard_normal((win_rows, NB)), jnp.float32)


def body(G, static_x, ndots, accum, start_ref, panels_ref, x_ref, o_ref):
    i = pl.program_id(1)
    for g in range(G):
        a = panels_ref[g]
        if static_x:
            xs = x_ref[0:PK, :]
        else:
            st = start_ref[i * G + g]
            xs = x_ref[pl.ds(st * TK, PK), :]
        if ndots == 3:
            x0 = xs.astype(jnp.bfloat16)
            r1 = xs - x0.astype(jnp.float32)
            x1 = r1.astype(jnp.bfloat16)
            x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            d = (
                jnp.dot(a, x0, preferred_element_type=jnp.float32)
                + jnp.dot(a, x1, preferred_element_type=jnp.float32)
                + jnp.dot(a, x2, preferred_element_type=jnp.float32)
            )
        else:
            d = jnp.dot(
                a, xs.astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        sl = slice(g * TM, (g + 1) * TM)
        if accum:
            f = start_ref[i * G + g] % 2

            @pl.when(f == 0)
            def _():
                o_ref[sl, :] = d

            @pl.when(f == 1)
            def _():
                o_ref[sl, :] += d
        else:
            o_ref[sl, :] = d


def run(G, static_x=False, ndots=3, accum=False):
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, NI // G),
        in_specs=[
            pl.BlockSpec((G, TM, PK), lambda j, i, s: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_rows, NB), lambda j, i, s: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * TM, NB), lambda j, i, s: (i, j),
                               memory_space=pltpu.VMEM),
    )
    f = pl.pallas_call(
        functools.partial(body, G, static_x, ndots, accum),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((NI * TM, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )
    fj = jax.jit(lambda s, p, x: f(s, p, x))
    fj(starts, panels, xw)
    dt = time_fn(fj, starts, panels, xw, reps=50)
    print(
        f"G={G} static_x={int(static_x)} ndots={ndots} accum={int(accum)}:"
        f" {dt * 1e3:.3f} ms ({dt / NI * 1e9:.0f} ns/item)",
        flush=True,
    )
    return dt


# anchor: closest to the real mono kernel (G=1, dynamic slice, 3 dots,
# accumulate branch)
run(1, ndots=3, accum=True)
run(1, ndots=3, accum=False)
run(1, ndots=1, accum=False)
run(1, static_x=True, ndots=3, accum=False)
run(4, ndots=3, accum=True)
run(4, ndots=3, accum=False)
run(8, ndots=3, accum=True)
run(8, ndots=1, accum=True)
run(8, static_x=True, ndots=3, accum=False)
