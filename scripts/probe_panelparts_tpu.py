"""Headline decomposition (banded 50k bw512 N=128, ColSegmented panels):
time the full op, the per-segment panel kernels alone, and the assembly,
in ONE process. Also sweep reorderings for VERDICT #7 on the powerlaw
SpMV config (hilbert vs degree vs tilepack vs none)."""
import time
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, powerlaw
from fastsparse.bench.timing import time_fn
from fastsparse.ops import bsr_ops

assert jax.default_backend() == "tpu"
assert float(jnp.ones((8, 128)).sum()) == 1024.0
rng = np.random.default_rng(0)

mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
A = op.fwd
segs = getattr(A, "segments", None)
print("format:", type(A).__name__,
      "nseg:", len(segs) if segs else 1)
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)

f_full = jax.jit(lambda op, X: op.matmat(X))
Y = np.asarray(f_full(op, X))
ref = (mb @ np.asarray(X)).astype(np.float64)
rel = float(np.abs(Y - ref).max() / np.abs(ref).max())
dt_full = time_fn(f_full, op, X, reps=20)
print(f"full matmat: {dt_full*1e3:.3f} ms rel {rel:.1e}")

if segs:
    # kernels only: per-segment panel parts, no assembly
    def kernels_only(A, X):
        outs = []
        for off, seg in zip(A.col_offsets, A.segments):
            Xs = X[off: off + seg.shape[1]]
            _, parts, _, _ = bsr_ops.bsr_spmm(
                seg, Xs, precision="highest", _parts=True)
            outs.append(sum(p.sum() for p in parts))
        return sum(outs)

    fk = jax.jit(kernels_only)
    fk(A, X)
    dt_k = time_fn(fk, A, X, reps=20)
    print(f"panel kernels only (+tiny sums): {dt_k*1e3:.3f} ms")
    for i, seg in enumerate(A.segments):
        widths = [b.width for b in seg.buckets]
        ns = [b.start_slab.shape[0] if hasattr(b, 'start_slab') else
              b.strip_ids.shape[0] for b in seg.buckets]
        print(f"  seg{i}: shape {seg.shape} strips/bucket {ns} widths {widths}"
              f" panel={seg.is_panel}")
