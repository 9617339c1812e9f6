"""A/B the narrow-packing lane width per RHS count, same-process.

First sweep showed N<=4 at nb=3nq clearly winning (0.19-0.21 ms vs
0.28-0.46) but N=8 (nb=24) at 0.467 and N=32 (nb=96) at 0.366 looking
worse than the old 128-lane numbers — is that HBM row-stride alignment
(48/192 B rows) or hour noise? Interleaved A/B, two rounds each.
"""
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")
import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_fn  # noqa: E402
from fastsparse.ops.bsr_ops import _pack_narrow_planes  # noqa: E402
from fastsparse.ops.pallas.bsr_spmm import mono_panel_spmm  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()

mat = banded(50_000, 512, seed=0)
mat.data[:] = 1.0
op = fs.operator(mat, format="bsr")
A = op.fwd
b = A.buckets[0]
TM, TK = A.tile_m, A.tile_k
K_pad = b.n_windows * b.win_slabs * TK
rng = np.random.default_rng(1)


def make(n, nb, nq):
    X = jnp.asarray(rng.standard_normal((mat.shape[1], n)), jnp.float32)
    ref = mat @ np.asarray(X, np.float64)

    @jax.jit
    def g(X):
        Xp = _pack_narrow_planes(X, K_pad, nq, nb)
        Y = mono_panel_spmm(
            b.window, b.strip_ids, b.start_rel, b.first, b.panels, Xp,
            tile_m=TM, tile_k=TK, width=b.width, win_slabs=b.win_slabs,
            binary=A.binary, n_block=nb, fold=False, precision="highest",
            out_rows=max(b.out_strips, A.n_strips) * TM,
        )
        return (Y[:, :nq] + Y[:, nq:2*nq] + Y[:, 2*nq:3*nq])[:mat.shape[0], :n]

    rel = float(np.abs(np.asarray(g(X)) - ref).max() / np.abs(ref).max())
    return g, X, rel


cases = []
for n, nbs in ((8, (24, 32, 64, 128)), (32, (96, 128))):
    nq = max(8, -(-n // 8) * 8)
    for nb in nbs:
        g, X, rel = make(n, nb, nq)
        cases.append((f"N={n} nb={nb}", g, X, rel))

for rnd in range(2):
    for name, g, X, rel in cases:
        dt = time_fn(g, X, reps=20)
        print(f"r{rnd} {name}: {dt*1e3:.3f} ms rel {rel:.1e}", flush=True)
