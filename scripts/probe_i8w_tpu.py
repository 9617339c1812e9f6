"""Probe: fold='i8' (3 dots/item) vs 'i8w' (one wide dot + in-kernel
fold) on the headline, same process."""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
import fastsparse.ops.bsr_ops as bo  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
ref = (mb @ np.asarray(X)).astype(np.float64)
b0 = op.fwd.buckets[0]
k_pad = b0.n_windows * b0.win_slabs * op.fwd.tile_k
Xp = jnp.zeros((k_pad, 128), jnp.float32).at[: mb.shape[1]].set(X)

fns = {}
for mode in ("i8", "i8w"):
    bo.MONO_I8_FOLD = mode
    Y = np.asarray(op.matmat(X))
    rel = np.abs(Y - ref).max() / np.abs(ref).max()
    print(f"{mode} rel {rel:.2e}")
    assert rel < 1e-6

for it in range(3):
    for mode in ("i8", "i8w"):
        bo.MONO_I8_FOLD = mode
        t = time_scan(lambda X: op.matmat(X), Xp, iters=256, couple_rows=64)
        print(f"{mode} busy {t*1e3:.4f} ms", flush=True)
