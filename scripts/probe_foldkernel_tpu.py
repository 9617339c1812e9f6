"""A/B in-kernel plane fold vs pre-split planes on the real headline op
(ONE process) + parity check at the BASELINE 1e-6 bar."""
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_fn
from fastsparse.ops import bsr_ops

assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
ref = (mb @ np.asarray(X)).astype(np.float64)
op = fs.operator(mb, format="bsr", transpose=False)

for flag in (False, True, False, True):
    bsr_ops.PANEL_FOLD_IN_KERNEL = flag
    f = jax.jit(lambda op, X, tag=flag: op.matmat(X))
    Y = np.asarray(f(op, X))
    rel = float(np.abs(Y - ref).max() / np.abs(ref).max())
    dt = time_fn(f, op, X, reps=30)
    print(f"in_kernel={flag}: {dt*1e3:.3f} ms rel {rel:.2e}")
