"""A/B panel class merging on the real headline op (ONE process):
default (2 classes/segment: w4+w5) vs forced single class (all w5).
Also re-time tm=192 with forced merge."""
import dataclasses
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_fn
from fastsparse.bench.metrics import tree_nbytes
from fastsparse.config import DEFAULT
from fastsparse.formats import bsr as bsr_mod

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
ref = (mb @ np.asarray(X)).astype(np.float64)

def run(tag, tm):
    cfg = dataclasses.replace(DEFAULT, tile_m=tm)
    op = fs.operator(mb, format="bsr", transpose=False, config=cfg)
    nlaunch = sum(len(s.buckets) for s in op.fwd.segments)
    f = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(f(op, X))
    rel = float(np.abs(Y - ref).max() / np.abs(ref).max())
    dt = time_fn(f, op, X, reps=30)
    ab = tree_nbytes(op.fwd) / mb.nnz
    print(f"{tag} tm={tm}: {dt*1e3:.3f} ms rel {rel:.1e} "
          f"a_bytes/nnz {ab:.2f} launches {nlaunch}")

run("default", 128)

orig = bsr_mod._merge_panel_classes
def force_merge(wq, ne):
    wq = wq.copy()
    if ne.any():
        wq[ne] = int(wq[ne].max())
    return wq
bsr_mod._merge_panel_classes = force_merge
run("merged ", 128)
run("merged ", 192)
bsr_mod._merge_panel_classes = orig
run("default", 192)
