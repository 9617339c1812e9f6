"""int8-quantized X planes + grouped/halo mono — headline kernel A/B.

Motivation (probe_exact_out 2026-08-20): Mosaic lowers s8xs8->s32 dots at
313 TOPS vs bf16's 174 on v5e, and the headline mono kernel is MXU-pass
bound (~0.21 ms of the 0.254 busy; 3 bf16 planes over 41M padded slots =
181 us at the measured dense rate). Candidates:

  A. baseline: prefold bf16-3plane mono @ tm=256 (production today)
  B. int8-X 4-plane (28-bit) mono @ tm=256 — 21G int8 MAC = 134 us floor
  C. int8-X 3-plane (21-bit) — 100 us floor, parity margin thinner
  D. grouped G=8 + HALO windows @ tm=128 (zero spill by construction:
     X windows materialized with an H-slab halo so no group straddles)
     in bf16-3plane and int8-4plane variants.

X quantization: per-column scale s_j = colmax_j/(127*2^(7(P-1)));
plane p holds round(residual/(s*2^(7(P-1-p)))) in [-127,127]; the
kernel combines int32 accumulators in f32 (acc0<2^24: exact) and scales
by s_j — worst-case element error colmax*2^-29 (P=4), below the bf16
3-plane path's 2^-24-relative element error for everything but tiny
elements in huge columns.
"""
import sys
import time

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import functools

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import fetch_scalar, time_fn_stats, time_scan
from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()
assert jax.default_backend() == "tpu"

N = 128
NB = 128
TK = 128
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
mcsr = mb.tocsr()
Xh = rng.standard_normal((mb.shape[0], N)).astype(np.float32)
X = jnp.asarray(Xh)
ref = mcsr @ Xh.astype(np.float64)
refmax = np.abs(ref).max()


def rel(Y):
    return float(np.abs(np.asarray(Y)[: ref.shape[0]] - ref).max() / refmax)


# ---------------- quantized X prep ----------------
def quant_planes(Xp, planes):
    """f32 (K, NB) -> (int8 (K, planes*NB), f32 scale (1, NB))."""
    m = jnp.max(jnp.abs(Xp), axis=0, keepdims=True)
    s = jnp.where(m > 0, m, 1.0) / (127.0 * 2.0 ** (7 * (planes - 1)))
    r = Xp
    qs = []
    for p in range(planes):
        step = s * (2.0 ** (7 * (planes - 1 - p)))
        q = jnp.clip(jnp.round(r / step), -127, 127)
        r = r - q * step
        qs.append(q.astype(jnp.int8))
    return jnp.concatenate(qs, axis=1), s


# ---------------- per-item int8 mono kernel ----------------
def _mono_i8_body(PLANES, PK, TK, TM, NB,
                  win_ref, strip_ref, start_ref, first_ref,
                  panels_ref, x_ref, s_ref, o_ref):
    del strip_ref
    i = pl.program_id(1)
    a = panels_ref[0]  # int8 (TM, PK)
    st = start_ref[i]
    acc = None
    for p in range(PLANES):
        xs = x_ref[pl.ds(st * TK, PK), p * NB:(p + 1) * NB]
        d = jax.lax.dot_general(
            a, xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        w = 2.0 ** (7 * (PLANES - 1 - p))
        df = d.astype(jnp.float32) * w
        acc = df if acc is None else acc + df
    d = acc * s_ref[0:1, :]
    f = first_ref[i]

    @pl.when(f == 1)
    def _():
        o_ref[:] = d

    @pl.when(f == 0)
    def _():
        o_ref[:] += d


@functools.partial(jax.jit, static_argnames=(
    "tile_m", "width", "win_slabs", "planes", "out_rows"))
def mono_i8_spmm(window, strip_ids, start_rel, first, panels, xq, scale,
                 *, tile_m, width, win_slabs, planes, out_rows):
    ni = strip_ids.shape[0]
    PK = width * TK
    win_rows = win_slabs * TK
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(1, ni),
        in_specs=[
            pl.BlockSpec((1, tile_m, PK),
                         lambda j, i, sw, ss, sr, sf: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((win_rows, planes * NB),
                         lambda j, i, sw, ss, sr, sf: (sw[i], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NB), lambda j, i, sw, ss, sr, sf: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tile_m, NB),
                               lambda j, i, sw, ss, sr, sf: (ss[i], 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        functools.partial(_mono_i8_body, planes, PK, TK, tile_m, NB),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((out_rows, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(window, strip_ids, start_rel, first, panels, xq,
      jnp.broadcast_to(scale, (8, NB)))


# ---------------- grouped (G strips/step) kernels, halo windows --------
def _grp_i8_body(PLANES, PK, TK, TM, NB, G,
                 win_ref, start_ref, panels_ref, x_ref, s_ref, o_ref):
    del win_ref
    i = pl.program_id(1)
    for g in range(G):
        a = panels_ref[g]
        st = start_ref[i * G + g]
        acc = None
        for p in range(PLANES):
            xs = x_ref[pl.ds(st * TK, PK), p * NB:(p + 1) * NB]
            d = jax.lax.dot_general(
                a, xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            w = 2.0 ** (7 * (PLANES - 1 - p))
            df = d.astype(jnp.float32) * w
            acc = df if acc is None else acc + df
        o_ref[pl.ds(g * TM, TM), :] = acc * s_ref[0:1, :]


def _grp_bf16_body(PK, TK, TM, NB, G,
                   win_ref, start_ref, panels_ref, x_ref, o_ref):
    del win_ref
    i = pl.program_id(1)
    for g in range(G):
        a = panels_ref[g].astype(jnp.bfloat16)
        st = start_ref[i * G + g]
        xs = x_ref[pl.ds(st * TK, PK), :]
        d3 = jnp.dot(a, xs, preferred_element_type=jnp.float32)
        o_ref[pl.ds(g * TM, TM), :] = (
            d3[:, :NB] + d3[:, NB:2 * NB] + d3[:, 2 * NB:]
        )


@functools.partial(jax.jit, static_argnames=(
    "tile_m", "width", "win_rows_slabs", "planes", "group", "mode"))
def grp_spmm(windows, start_rel, panels, xq, scale,
             *, tile_m, width, win_rows_slabs, planes, group, mode):
    ns = start_rel.shape[0]
    PK = width * TK
    win_rows = win_rows_slabs * TK
    G = group
    xnb = planes * NB if mode == "i8" else 3 * NB
    in_specs = [
        pl.BlockSpec((G, tile_m, PK), lambda j, i, sw, ss: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((win_rows, xnb), lambda j, i, sw, ss: (sw[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [windows, start_rel, panels, xq]
    if mode == "i8":
        body = functools.partial(_grp_i8_body, planes, PK, TK, tile_m, NB, G)
        in_specs.append(
            pl.BlockSpec((8, NB), lambda j, i, sw, ss: (0, 0),
                         memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(scale, (8, NB)))
    else:
        body = functools.partial(_grp_bf16_body, PK, TK, tile_m, NB, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(1, ns // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G * tile_m, NB),
                               lambda j, i, sw, ss: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns * tile_m, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(*args)


# ---------------- A: baseline ----------------
op = fs.operator(mcsr, format="bsr", transpose=False)
A = op.fwd
b = A.buckets[0]
print("A: baseline", type(b).__name__, "tm", A.tile_m, "W", b.width,
      "ni", b.ns, flush=True)
busyA = time_scan(lambda X: op.matmat(X), X, iters=256)
# NOTE: op.matmat must be jit-WRAPPED on TPU: the standalone compile of
# the prefold mono kernel at win=80 is 16.10M scoped vmem (over the 16M
# wall); embedded in a jit graph it compiles. Production fragility —
# round-4 fix pending.
relA = rel(jax.jit(lambda X: op.matmat(X))(X))
print(f"A busy {busyA*1e3:.3f} ms  rel {relA:.2e}", flush=True)

# ---------------- B/C: int8-X planes on the SAME tm=256 item list ------
K_pad = b.n_windows * b.win_slabs * TK
Xp_f = jnp.zeros((K_pad, NB), jnp.float32).at[: mb.shape[0]].set(X)
rows_out = max(b.out_strips, A.n_strips) * A.tile_m
for planes in (4, 3):
    xq, s = jax.jit(functools.partial(quant_planes, planes=planes))(Xp_f)

    def full(Xin, planes=planes):
        Xp = jnp.zeros((K_pad, NB), jnp.float32).at[: mb.shape[0]].set(Xin)
        xq, s = quant_planes(Xp, planes)
        return mono_i8_spmm(
            b.window, b.strip_ids, b.start_rel, b.first, b.panels, xq, s,
            tile_m=A.tile_m, width=b.width, win_slabs=b.win_slabs,
            planes=planes, out_rows=rows_out)[: mb.shape[0]]

    try:
        Y = jax.jit(full)(X)
        r = rel(Y)
        busy = time_scan(full, X, iters=256)
        kfn = lambda *a, p=planes: mono_i8_spmm(
            *a, tile_m=A.tile_m, width=b.width,
            win_slabs=b.win_slabs, planes=p, out_rows=rows_out)
        kw = time_fn_stats(
            kfn, b.window, b.strip_ids, b.start_rel, b.first,
            b.panels, xq, s, batches=3, reps=30)
        print(f"B{planes}: int8-{planes}plane tm256 busy {busy*1e3:.3f} ms "
              f"(kernel wall min {kw['min_ms']:.3f}) rel {r:.2e}", flush=True)
    except Exception as e:
        print(f"B{planes} FAILED:", repr(e)[:250], flush=True)

# ---------------- D: grouped + halo @ tm=128 ----------------
TM = 128
n_strips = -(-mb.shape[0] // TM)
n_slabs = -(-mb.shape[1] // TK)
coo = mcsr.tocoo()
smin = np.full(n_strips, 1 << 60, np.int64)
smax = np.zeros(n_strips, np.int64)
strip = coo.row // TM
slab = coo.col // TK
np.minimum.at(smin, strip, slab)
np.maximum.at(smax, strip, slab)
smin[smin == 1 << 60] = 0
W = int((smax - smin + 1).max())
G = 8
WIN, H = 64, 24  # window grid + halo (group span must fit win start+H+..)
ns_pad = -(-n_strips // G) * G
gmin = np.full(ns_pad, 1 << 60, np.int64)
gmin[:n_strips] = smin
gmin = gmin.reshape(-1, G).min(axis=1)
gmin[gmin == 1 << 60] = 0
gwin = gmin // WIN
n_windows = int(gwin.max()) + 1
# check halo covers every group's span
gmax = np.zeros(ns_pad, np.int64)
gmax[:n_strips] = smax
gspan_ok = (gmax.reshape(-1, G).max(axis=1) - gwin * WIN + W <= WIN + H).all()
print(f"D: tm128 W={W} G={G} WIN={WIN} H={H} windows={n_windows} "
      f"halo_covers={bool(gspan_ok)}", flush=True)
start_abs = np.minimum(smin, 0 + (np.repeat(gwin, G)[:n_strips]) * WIN + WIN + H - W)
start_abs = np.maximum(start_abs, np.repeat(gwin, G)[:n_strips] * WIN)
start_rel = start_abs - np.repeat(gwin, G)[:n_strips] * WIN
start_rel = np.concatenate([start_rel, np.zeros(ns_pad - n_strips, np.int64)])
# panels fill (host, int8)
PK = W * TK
panels = np.zeros((ns_pad, TM, PK), np.int8)
lcol = coo.col - start_abs[strip] * TK
panels[strip, coo.row % TM, lcol] = 1
panels_d = jnp.asarray(panels)
windows_d = jnp.asarray(gwin, jnp.int32)
start_d = jnp.asarray(start_rel, jnp.int32)

# halo X: windows of (WIN+H) slabs
def make_halo(Xp_full, planes=None, mode="i8"):
    # Xp_full: (rows, NB) f32 padded to cover (n_windows-1)*WIN + WIN+H slabs
    segs = [jax.lax.dynamic_slice(
        Xp_full, (w * WIN * TK, 0), ((WIN + H) * TK, Xp_full.shape[1]))
        for w in range(n_windows)]
    return jnp.concatenate(segs, axis=0)

rows_need = ((n_windows - 1) * WIN + WIN + H) * TK
Xp_full0 = jnp.zeros((rows_need, NB), jnp.float32).at[: mb.shape[0]].set(X)

def full_grp_i8(Xin):
    Xp_full = jnp.zeros((rows_need, NB), jnp.float32).at[: mb.shape[0]].set(Xin)
    xq, s = quant_planes(Xp_full, 4)
    xh = make_halo(xq)
    Y = grp_spmm(windows_d, start_d, panels_d, xh, s,
                 tile_m=TM, width=W, win_rows_slabs=WIN + H, planes=4,
                 group=G, mode="i8")
    return Y[: mb.shape[0]]

def full_grp_bf16(Xin):
    Xp_full = jnp.zeros((rows_need, NB), jnp.float32).at[: mb.shape[0]].set(Xin)
    # 3 bf16 planes stacked along lanes
    u = jax.lax.bitcast_convert_type(Xp_full, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = Xp_full - hi
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(u1 & jnp.uint32(0xFFFF0000), jnp.float32)
    x2 = r1 - h1
    xp = jnp.concatenate([hi.astype(jnp.bfloat16), h1.astype(jnp.bfloat16),
                          x2.astype(jnp.bfloat16)], axis=1)
    xh = make_halo(xp)
    Y = grp_spmm(windows_d, start_d, panels_d, xh, None,
                 tile_m=TM, width=W, win_rows_slabs=WIN + H, planes=3,
                 group=G, mode="bf16")
    return Y[: mb.shape[0]]

for name, fn in (("D-i8x4", full_grp_i8), ("D-bf16", full_grp_bf16)):
    try:
        Y = jax.jit(fn)(X)
        r = rel(Y)
        busy = time_scan(fn, X, iters=256)
        print(f"{name}: grouped tm128 busy {busy*1e3:.3f} ms rel {r:.2e}",
              flush=True)
    except Exception as e:
        print(f"{name} FAILED:", repr(e)[:250], flush=True)

# prep-only costs
busy_q = time_scan(lambda Xin: quant_planes(
    jnp.zeros((K_pad, NB), jnp.float32).at[: mb.shape[0]].set(Xin), 4)[0],
    X, iters=256)
print(f"quant4 prep busy {busy_q*1e3:.3f} ms", flush=True)
