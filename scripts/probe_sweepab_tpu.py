"""A/B: sweep launches vs one-call-per-chunk on powerlaw 65k^2.

Sweep kernels measured ~2.4 ns/slot vs 1.0 for singleton full-body
chunks — suspect the per-grid-step `pl.when` part ladder. Two operator
builds (layout plans key on USE_SWEEP), interleaved time_scan.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
import fastsparse.ops.ell_ops as eo  # noqa: E402
from fastsparse.bench.matrices import powerlaw  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)
mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
X = jnp.asarray(rng.standard_normal((mp.shape[1], 128)), jnp.float32)
refp = (mp @ np.asarray(X)).astype(np.float64)

ops = {}
for flag in (True, False):
    eo.USE_SWEEP = flag
    op = fs.operator(mp, transpose=False, reorder="degree")
    Y = np.asarray(op.matmat(X))
    rel = np.abs(Y - refp).max() / np.abs(refp).max()
    segs = getattr(op.fwd.sparse, "segments", [op.fwd.sparse])
    n_items = sum(1 for seg in segs for _ in eo._seg_layout(seg))
    print(f"sweep={flag}: rel {rel:.2e} launches={n_items}", flush=True)
    assert rel < 1e-5
    ops[flag] = op
eo.USE_SWEEP = True

for it in range(3):
    for flag, op in ops.items():
        eo.USE_SWEEP = flag  # layout fns consult it at trace time
        t = time_scan(lambda X: op.matmat(X), X, iters=64)
        print(f"sweep={flag} busy {t*1e3:.3f} ms", flush=True)
