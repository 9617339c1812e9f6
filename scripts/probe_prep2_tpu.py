"""Probe v2: end-to-end headline with (a) light chain coupling and
(b) 3-separate-plane prep + 3-ref mono kernel (round 5 task #1).

probe_prep_tpu found: prep 0.056 ms of which ~0.02 is the plane-concat
materialization, and the time_scan coupling reduce re-reads the full
(50k, 128) Y (~25.6 MB ≈ 40-50 us) — harness overhead charged to every
busy number. A pallas_call is atomic (XLA cannot push a slice INTO it),
so coupling on an 8-row slice of a Pallas output still forces full
execution while reading only 4 KB.

Variants (same process, interleaved):
  full/full8     — current op.matmat, full-sum vs 8-row coupling
  kern8          — kernel-only (fixed planes), 8-row coupling
  full3ref8      — prep as 3 separate plane outputs + 3-x-ref kernel
"""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.ops.bsr_ops import _quant3_carry  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

import time  # noqa: E402


def fetch_scalar(x):
    return float(jnp.sum(jax.tree.leaves(x)[0]))


def time_scan2(fn, x0, iters=512, batches=5, couple_rows=None):
    eps = jnp.asarray(1e-38, jnp.float32)

    def body(_, x):
        y = fn(x)
        if couple_rows is None:
            s = jnp.sum(jnp.square(y.astype(jnp.float32)))
        else:
            s = jnp.sum(jnp.square(y[:couple_rows].astype(jnp.float32)))
        return x.at[:1, :1].add((eps * s).astype(x.dtype))

    def loop(n):
        g = jax.jit(lambda x: jax.lax.fori_loop(0, n, body, x))
        fetch_scalar(g(x0))

        def run():
            t0 = time.perf_counter()
            fetch_scalar(g(x0))
            return time.perf_counter() - t0

        return min(run() for _ in range(batches))

    t1 = loop(iters)
    t2 = loop(2 * iters)
    return max((t2 - t1) / iters, 1e-9)


rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
A = op.fwd
b = A.buckets[0]
TK = A.tile_k
TM = A.tile_m
K_pad = b.n_windows * b.win_slabs * TK
NB = 128
win_rows = b.win_slabs * TK
out_rows = max(b.out_strips, A.n_strips) * TM
print("tm", TM, "W", b.width, "win", b.win_slabs, "ni", b.strip_ids.shape[0])

N = 128
X = jnp.asarray(rng.standard_normal((mb.shape[1], N)), jnp.float32)


# ---- 3-separate-plane prep (one fused multi-output elementwise) --------
@jax.jit
def prep3sep(Xin):
    Xp = jnp.zeros((K_pad, NB), jnp.float32).at[: Xin.shape[0]].set(Xin)
    q0, q1, q2, s = _quant3_carry(Xp)
    return (
        q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8), s
    )


# ---- 3-x-ref mono kernel (fold="i8" specialization) --------------------
def _i8_dot(a, xs):
    d = jax.lax.dot_general(
        a, xs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32)


def _mono3_body(PK, TK, TM, NB, win_ref, strip_ref, start_ref, first_ref,
                panels_ref, x0_ref, x1_ref, x2_ref, s_ref, o_ref):
    del win_ref, strip_ref
    i = pl.program_id(1)
    a = panels_ref[0]
    st = start_ref[i]
    acc = None
    for ref, w in ((x0_ref, 65536.0), (x1_ref, 256.0), (x2_ref, 1.0)):
        xs = ref[pl.ds(st * TK, PK), :]
        df = _i8_dot(a, xs) * w
        acc = df if acc is None else acc + df
    d = acc * s_ref[0:1, :]
    f = first_ref[i]

    @pl.when(f == 1)
    def _():
        o_ref[:] = d

    @pl.when(f == 0)
    def _():
        o_ref[:] += d


@jax.jit
def mono3(q0, q1, q2, s):
    PK = b.width * TK
    xspec = pl.BlockSpec(
        (win_rows, NB),
        lambda j, i, sw, ss, sr, sf: (sw[i], j),
        memory_space=pltpu.VMEM,
    )
    gs = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1, b.strip_ids.shape[0]),
        in_specs=[
            pl.BlockSpec(
                (1, TM, b.panels.shape[-1]),
                lambda j, i, sw, ss, sr, sf: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            xspec, xspec, xspec,
            pl.BlockSpec(
                (8, NB),
                lambda j, i, sw, ss, sr, sf: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (TM, NB),
            lambda j, i, sw, ss, sr, sf: (ss[i], j),
            memory_space=pltpu.VMEM,
        ),
    )
    return pl.pallas_call(
        functools.partial(_mono3_body, b.width * TK, TK, TM, NB),
        grid_spec=gs,
        out_shape=jax.ShapeDtypeStruct((out_rows, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary"),
        ),
    )(b.window, b.strip_ids, b.start_rel, b.first, b.panels,
      q0, q1, q2, jnp.broadcast_to(s, (8, NB)))


def full3ref(Xin):
    q0, q1, q2, s = prep3sep(Xin)
    return mono3(q0, q1, q2, s)[: mb.shape[0]]


# parity check
ref = (mb @ np.asarray(X)).astype(np.float64)
got = np.asarray(full3ref(X))
rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
print("3ref rel", rel)
assert rel < 1e-6

got0 = np.asarray(op.matmat(X))
rel0 = np.abs(got0 - ref).max() / np.abs(ref).max()
print("cur rel", rel0)

# kernel-only with fixed planes
q0f, q1f, q2f, sf = prep3sep(X)


def kern_only(s):
    return mono3(q0f, q1f, q2f, s)


res = {}


def run(tag, fn, x0, couple_rows):
    t = time_scan2(fn, x0, couple_rows=couple_rows)
    res.setdefault(tag, []).append(t * 1e3)
    print(f"{tag:11s} {t*1e3:8.4f} ms")


for it in range(3):
    run("full", lambda X: op.matmat(X), X, None)
    run("full8", lambda X: op.matmat(X), X, 8)
    run("full3ref8", full3ref, X, 8)
    run("kern8", kern_only, sf * 1.0, 8)

print("\n== mins ==")
for k, v in res.items():
    print(f"{k:11s} {min(v):8.4f} ms")
