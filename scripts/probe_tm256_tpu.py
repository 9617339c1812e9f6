"""A/B tile_m 128 vs 192/256 on the real headline op (ONE process).
Per-strip overhead dominates panels; taller strips halve strip count."""
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

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
ref = (mb @ np.asarray(X)).astype(np.float64)

for tm in (128, 192, 256, 384):
    cfg = dataclasses.replace(DEFAULT, tile_m=tm)
    op = fs.operator(mb, format="bsr", transpose=False, config=cfg)
    f = jax.jit(lambda op, X: op.matmat(X))
    Y = np.asarray(f(op, X))
    rel = float(np.abs(Y - ref).max() / np.abs(ref).max())
    dt = time_fn(f, op, X, reps=30)
    ab = tree_nbytes(op.fwd) / mb.nnz
    print(f"tm={tm}: {dt*1e3:.3f} ms rel {rel:.1e} a_bytes/nnz {ab:.2f}")
