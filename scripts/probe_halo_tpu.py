"""Halo-window grouped mono probe (G strips/step, ZERO spill).

The round-3 grouped-mono loss was the spill side bucket (group-window
clamp); this layout materializes X windows WITH a halo (window w holds
slabs [w·WIN, w·WIN + WIN + H)) so every G-strip group fits its window
whenever H >= group span - 1 — no clamp, no side bucket, no spill, by
construction on banded structure. Measures SpMV (narrow int8 planes,
X fully tiny) and N=128 (wide int8 planes) against the plain per-item
mono production numbers (0.153 / 0.176 ms busy, 2026-08-20).
"""
import sys
import functools

sys.path.insert(0, ".")
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_scan
from fastsparse.ops.bsr_ops import _quant3_carry
from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()
assert jax.default_backend() == "tpu"

TK = 128
NB = 128
TM = 256
G = 4
WIN, H = 120, 12
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
mcsr = mb.tocsr()
coo = mcsr.tocoo()

n_strips = -(-mb.shape[0] // TM)
n_slabs = -(-mb.shape[1] // TK)
smin = np.full(n_strips, 1 << 60, np.int64)
smax = np.zeros(n_strips, np.int64)
strip = coo.row // TM
slab = coo.col // TK
np.minimum.at(smin, strip, slab)
np.maximum.at(smax, strip, slab)
smin[smin == 1 << 60] = 0
W = int((smax - smin + 1).max())
ns_pad = -(-n_strips // G) * G
gmin = np.full(ns_pad, 1 << 60, np.int64)
gmin[:n_strips] = smin
gmin = gmin.reshape(-1, G).min(axis=1)
gmin[gmin == 1 << 60] = 0
gwin = np.minimum(gmin // WIN, max(-(-n_slabs // WIN) - 1, 0))
n_windows = int(gwin.max()) + 1
gmax = np.zeros(ns_pad, np.int64)
gmax[:n_strips] = smax
ok = (gmax.reshape(-1, G).max(axis=1) - gwin * WIN <= WIN + H - 1).all()
print(f"W={W} G={G} WIN={WIN} H={H} windows={n_windows} steps={ns_pad//G} "
      f"covers={bool(ok)}", flush=True)
assert ok
start_abs = np.minimum(np.repeat(gwin, G)[:n_strips] * WIN + WIN + H - W,
                       smin)
start_abs = np.maximum(start_abs, np.repeat(gwin, G)[:n_strips] * WIN)
assert (smax - start_abs + 1 <= W).all()
start_rel = np.zeros(ns_pad, np.int64)
start_rel[:n_strips] = start_abs - np.repeat(gwin, G)[:n_strips] * WIN

PK = W * TK
panels = np.zeros((ns_pad, TM, PK), np.int8)
lcol = coo.col - start_abs[strip] * TK
panels[strip, coo.row % TM, lcol] = 1
panels_d = jnp.asarray(panels)
windows_d = jnp.asarray(gwin, jnp.int32)
start_d = jnp.asarray(start_rel, jnp.int32)

rows_need = ((n_windows - 1) * WIN + WIN + H) * TK


def halo(Xe):
    return jnp.concatenate(
        [jax.lax.slice_in_dim(Xe, w * WIN * TK, (w * WIN + WIN + H) * TK)
         for w in range(n_windows)], axis=0)


def _grp_body(PLANES, PK, TM, NB, G, narrow,
              win_ref, start_ref, panels_ref, x_ref, *rest):
    if narrow:
        (o_ref,) = rest
    else:
        s_ref, o_ref = rest
    del win_ref
    i = pl.program_id(1)
    for g in range(G):
        a = panels_ref[g]
        st = start_ref[i * G + g]
        if narrow:
            xs = x_ref[pl.ds(st * TK, PK), :]
            d = jax.lax.dot_general(
                a, xs, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32).astype(jnp.float32)
        else:
            acc = None
            for p, w in ((0, 65536.0), (1, 256.0), (2, 1.0)):
                xs = x_ref[pl.ds(st * TK, PK), p * NB:(p + 1) * NB]
                dd = jax.lax.dot_general(
                    a, xs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32).astype(jnp.float32)
                acc = dd * w if acc is None else acc + dd * w
            d = acc * s_ref[0:1, :]
        o_ref[pl.ds(g * TM, TM), :] = d


@functools.partial(jax.jit, static_argnames=("nb", "narrow"))
def grp(windows, start_rel, panels, xh, scale, *, nb, narrow):
    ns = start_rel.shape[0]
    win_rows = (WIN + H) * TK
    in_specs = [
        pl.BlockSpec((G, TM, PK), lambda j, i, sw, ss: (i, 0, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((win_rows, nb if narrow else 3 * NB),
                     lambda j, i, sw, ss: (sw[i], 0),
                     memory_space=pltpu.VMEM),
    ]
    args = [windows, start_rel, panels, xh]
    if not narrow:
        in_specs.append(pl.BlockSpec((8, NB), lambda j, i, sw, ss: (0, 0),
                                     memory_space=pltpu.VMEM))
        args.append(jnp.broadcast_to(scale, (8, NB)))
    out_nb = nb if narrow else NB
    return pl.pallas_call(
        functools.partial(_grp_body, 3, PK, TM, NB, G, narrow),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(1, ns // G),
            in_specs=in_specs,
            out_specs=pl.BlockSpec((G * TM, out_nb),
                                   lambda j, i, sw, ss: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((ns * TM, out_nb), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary", "arbitrary")),
    )(*args)


# ---- SpMV (narrow nb=32: 3 planes x nq=8 + pad) ----
xh_np = rng.standard_normal(mb.shape[0]).astype(np.float32)
x1 = jnp.asarray(xh_np)
refv = mcsr @ xh_np.astype(np.float64)


def spmv(xin):
    Xf = jnp.zeros((rows_need, 8), jnp.float32).at[: mb.shape[0], 0].set(xin)
    q0, q1, q2, s = _quant3_carry(Xf)
    planes = jnp.concatenate(
        [q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8),
         jnp.zeros((rows_need, 8), jnp.int8)], axis=1)
    xhh = halo(planes)
    Y = grp(windows_d, start_d, panels_d, xhh, None, nb=32, narrow=True)
    y = (Y[:, :8] * 65536.0 + Y[:, 8:16] * 256.0 + Y[:, 16:24]) * s
    return y[: mb.shape[0], 0]


yv = np.asarray(jax.jit(spmv)(x1))
rv = np.abs(yv - refv).max() / np.abs(refv).max()
busyv = time_scan(lambda x: spmv(x)[:, None] * 1.0, x1[:, None] * 1.0
                  if False else x1, iters=512) if False else None
# time_scan carry must be 2-D for the .at[:1,:1]; wrap
busyv = time_scan(lambda x: spmv(x[:, 0])[:, None], x1[:, None], iters=512)
print(f"halo SpMV busy {busyv*1e3:.3f} ms rel {rv:.2e}", flush=True)

# ---- N=128 wide ----
Xw = jnp.asarray(rng.standard_normal((mb.shape[0], NB)), jnp.float32)
refw = mcsr @ np.asarray(Xw, np.float64)


def wide(Xin):
    Xf = jnp.zeros((rows_need, NB), jnp.float32).at[: mb.shape[0]].set(Xin)
    q0, q1, q2, s = _quant3_carry(Xf)
    planes = jnp.concatenate(
        [q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8)],
        axis=1)
    xhh = halo(planes)
    Y = grp(windows_d, start_d, panels_d, xhh, s, nb=NB, narrow=False)
    return Y[: mb.shape[0]]


Yw = np.asarray(jax.jit(wide)(Xw))
rw = np.abs(Yw - refw).max() / np.abs(refw).max()
busyw = time_scan(wide, Xw, iters=256)
print(f"halo N=128 busy {busyw*1e3:.3f} ms rel {rw:.2e}", flush=True)
