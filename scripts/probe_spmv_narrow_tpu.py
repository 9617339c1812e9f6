"""SpMV narrow-lane probe: today the nq-narrow mono path pads X/Y to 128
lanes (X bf16 12.8 MB, Y f32 25.6 MB for a 200 KB vector). If Mosaic
accepts blocks whose lane dim equals a narrow array lane dim (24/32),
the X+Y traffic drops ~28 MB (~52 us at measured bw).

Compares, same-process on the real chip, banded 50k bw512 SpMV:
  a) current operator path (nq=8 packing into 128 lanes)
  b) mono_panel_spmm called directly with 24-lane X/out
  c) same with 32-lane X/out (3 planes at nq=8 + 8 pad lanes)
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_fn  # noqa: E402
from fastsparse.ops.bsr_ops import _split_bf16_planes  # noqa: E402
from fastsparse.ops.pallas.bsr_spmm import mono_panel_spmm  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

mat = banded(50_000, 512, seed=0)
mat.data[:] = 1.0
op = fs.operator(mat, format="bsr")
A = op.fwd
b = A.buckets[0]
assert A.is_mono and len(A.buckets) == 1, (A.is_mono, len(A.buckets))
TM, TK = A.tile_m, A.tile_k
K_pad = b.n_windows * b.win_slabs * TK
rng = np.random.default_rng(1)
x = jnp.asarray(rng.standard_normal(mat.shape[1]), jnp.float32)
ref = mat @ np.asarray(x, np.float64)
scale = np.abs(ref).max()

# a) current path
f = jax.jit(lambda op, x: op.matvec(x))
y = np.asarray(f(op, x))
rel = np.abs(y - ref).max() / scale
dt = time_fn(f, op, x, reps=20)
print(f"a) operator path: {dt*1e3:.3f} ms rel {rel:.1e}", flush=True)


def pack(xv, nq, nb):
    Xf = jnp.pad(xv[:, None].astype(jnp.float32),
                 ((0, K_pad - xv.shape[0]), (0, nq - 1)))
    hi, h1, x2 = _split_bf16_planes(Xf)
    tail = jnp.zeros((K_pad, nb - 3 * nq), jnp.bfloat16)
    return jnp.concatenate([hi, h1, x2, tail], axis=1)


def run_narrow(nb, nq=8):
    @jax.jit
    def g(xv):
        Xp = pack(xv, nq, nb)
        Y = mono_panel_spmm(
            b.window, b.strip_ids, b.start_rel, b.first, b.panels, Xp,
            tile_m=TM, tile_k=TK, width=b.width, win_slabs=b.win_slabs,
            binary=A.binary, n_block=nb, fold=False, precision="highest",
            out_rows=max(b.out_strips, A.n_strips) * TM,
        )
        return (Y[:, :nq] + Y[:, nq:2*nq] + Y[:, 2*nq:3*nq])[:mat.shape[0], 0]

    y = np.asarray(g(x))
    rel = np.abs(y - ref).max() / scale
    dt = time_fn(g, x, reps=20)
    print(f"nb={nb}: {dt*1e3:.3f} ms rel {rel:.1e}", flush=True)


for nb in (24, 32):
    try:
        run_narrow(nb)
    except Exception as e:  # noqa: BLE001
        print(f"nb={nb}: FAILED {type(e).__name__}: {str(e)[:300]}",
              flush=True)
