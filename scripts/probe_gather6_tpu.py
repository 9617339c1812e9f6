"""Probe: lower the gather engine's ns/slot floor (round 5 task #2).

The chunked body (K > 64) measured 1.5-1.7 ns/slot vs the full-unroll
body's 1.18-1.32 (probe_gather3). Candidates, same-process interleaved,
all unit-mode, same X (16392 x 128 f32 resident) and ~2.1M slots:

  chunk16   — current chunked body, KB=16 (baseline for K=128 buckets)
  chunk32/64— wider unroll per grid step (fewer o_ref += passes)
  pack32    — current packed-pair chunked body, KB2=32
  full64    — K=64 full-unroll on 2x rows (sub-row-split equivalent)
  fullpack64— NEW: full-unroll + packed column pairs (half SMEM loads)
  fullpack32— same at K=32 on 4x rows
  overhead  — nb=8, K=8 full body (per-call fixed cost + X panel DMA)
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

NCOL = 16384
ROWS_PAD = 16392  # round8(NCOL + 1)
NB = 128
G = 8
N_ACC = 4

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((ROWS_PAD, NB)), jnp.float32)
x = x.at[NCOL:].set(0.0)

# slots per call: ONE chunk at the production SMEM budget (128k int32
# entries = 512 KB prefetch — 2M entries exceeded the 1 MB SMEM wall)
TOTAL = 128 * 1024


def cols_for(nb, K, seed):
    r = np.random.default_rng(seed)
    return jnp.asarray(r.integers(0, NCOL, (nb, K)), jnp.int32)


def _body_unit(K, KB, G, cols_ref, x_ref, o_ref):
    t = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        accs = [None] * N_ACC
        for u in range(KB):
            k = (i * G + g) * K + t * KB + u
            c = cols_ref[k]
            xr = x_ref[pl.ds(c, 1), :]
            a = u % N_ACC
            accs[a] = xr if accs[a] is None else accs[a] + xr
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


def _body_unit_packed(K2, KB2, G, cols_ref, x_ref, o_ref):
    t = pl.program_id(2)
    i = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        accs = [None] * N_ACC
        for u in range(KB2):
            k = (i * G + g) * K2 + t * KB2 + u
            p = cols_ref[k]
            c0 = jax.lax.bitwise_and(p, jnp.int32(0xFFFF))
            c1 = jax.lax.shift_right_logical(p, jnp.int32(16))
            xr0 = x_ref[pl.ds(c0, 1), :]
            xr1 = x_ref[pl.ds(c1, 1), :]
            a0 = (2 * u) % N_ACC
            a1 = (2 * u + 1) % N_ACC
            accs[a0] = xr0 if accs[a0] is None else accs[a0] + xr0
            accs[a1] = xr1 if accs[a1] is None else accs[a1] + xr1
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


def _body_full(K, G, cols_ref, x_ref, o_ref):
    i = pl.program_id(1)
    for g in range(G):
        accs = [None] * N_ACC
        for u in range(K):
            k = (i * G + g) * K + u
            c = cols_ref[k]
            xr = x_ref[pl.ds(c, 1), :]
            a = u % N_ACC
            accs[a] = xr if accs[a] is None else accs[a] + xr
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] = acc


def _body_full_packed(K2, G, cols_ref, x_ref, o_ref):
    i = pl.program_id(1)
    for g in range(G):
        accs = [None] * N_ACC
        for u in range(K2):
            k = (i * G + g) * K2 + u
            p = cols_ref[k]
            c0 = jax.lax.bitwise_and(p, jnp.int32(0xFFFF))
            c1 = jax.lax.shift_right_logical(p, jnp.int32(16))
            xr0 = x_ref[pl.ds(c0, 1), :]
            xr1 = x_ref[pl.ds(c1, 1), :]
            a0 = (2 * u) % N_ACC
            a1 = (2 * u + 1) % N_ACC
            accs[a0] = xr0 if accs[a0] is None else accs[a0] + xr0
            accs[a1] = xr1 if accs[a1] is None else accs[a1] + xr1
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] = acc


def call_chunked(cols, KB, packed):
    nb, K = cols.shape
    if packed:
        K2 = K // 2
        c0 = cols[:, 0::2]
        c1 = cols[:, 1::2]
        flat = jax.lax.bitwise_or(
            c0, jax.lax.shift_left(c1, jnp.int32(16))
        ).reshape(-1)
        body = functools.partial(_body_unit_packed, K2, KB, G)
        grid = (1, nb // G, K2 // KB)
    else:
        flat = cols.reshape(-1)
        body = functools.partial(_body_unit, K, KB, G)
        grid = (1, nb // G, K // KB)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (ROWS_PAD, NB), lambda j, i, t, *_s: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, NB), lambda j, i, t, *_s: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        body,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nb, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
    )(flat, x)


def call_full(cols, packed):
    nb, K = cols.shape
    if packed:
        K2 = K // 2
        c0 = cols[:, 0::2]
        c1 = cols[:, 1::2]
        flat = jax.lax.bitwise_or(
            c0, jax.lax.shift_left(c1, jnp.int32(16))
        ).reshape(-1)
        body = functools.partial(_body_full_packed, K2, G)
    else:
        flat = cols.reshape(-1)
        body = functools.partial(_body_full, K, G)
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(1, nb // G),
        in_specs=[
            pl.BlockSpec(
                (ROWS_PAD, NB), lambda j, i, *_s: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, NB), lambda j, i, *_s: (i, j), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        body,
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((nb, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
    )(flat, x)


configs = {}
cols128 = cols_for(TOTAL // 128, 128, 1)
cols64 = cols_for(TOTAL // 64, 64, 2)
cols32 = cols_for(TOTAL // 32, 32, 3)
cols_oh = cols_for(8, 8, 4)

variants = {
    "chunk16": lambda: call_chunked(cols128, 16, False),
    "chunk32": lambda: call_chunked(cols128, 32, False),
    "chunk64": lambda: call_chunked(cols128, 64, False),
    "pack32": lambda: call_chunked(cols128, 32, True),
    "full64": lambda: call_full(cols64, False),
    "fullpack64": lambda: call_full(cols64, True),
    "fullpack32": lambda: call_full(cols32, True),
    "overhead": lambda: call_full(cols_oh, False),
}

# correctness vs reference (dense): check full64 and fullpack64 agree
ref64 = np.add.reduce(
    np.asarray(x)[np.asarray(cols64)], axis=1
)
got = np.asarray(call_full(cols64, True))
assert np.allclose(got, ref64, rtol=1e-5, atol=1e-4), "fullpack64 wrong"
print("fullpack64 parity ok")

# time_scan: per-dispatch walls through the tunnel floor at ~0.18 ms,
# masking every variant faster than that (first run of this probe read
# chunk32 == pack32 == fullpack32 == the tiny-kernel overhead floor).
# Chained loops measure device time; x is the carrier.
res = {}
for it in range(3):
    for tag, fn in variants.items():
        def chained(xc, fn=fn):
            global x
            old = x
            x = xc
            try:
                return fn()
            finally:
                x = old
        t = time_scan(chained, x, iters=128)
        res.setdefault(tag, []).append(t)
        slots = TOTAL if tag != "overhead" else 64
        print(f"{tag:11s} {t*1e3:8.3f} ms  {t/slots*1e9:7.3f} ns/slot")

print("\n== mins ==")
for tag, v in res.items():
    slots = TOTAL if tag != "overhead" else 64
    t = min(v)
    print(f"{tag:11s} {t*1e3:8.3f} ms  {t/slots*1e9:7.3f} ns/slot")
