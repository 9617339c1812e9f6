"""Probe: halo group size G for SpMV (round 5 task #4).

The halo grouped engine plateaued at ~0.120 ms SpMV; per-grid-step
sequencing is the diagnosed residue. G=8 came from a conservative 4 MB
panel allowance — the real scoped-VMEM budget fits G=16 (panels
2*16*196KB = 6.3 MB + X window ~1.4 MB + out 0.5 MB < 16 MB). Builds
the headline operator at G=8 / G=16 and times SpMV same-process.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
import fastsparse.formats.bsr as fbsr  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
x = jnp.asarray(rng.standard_normal((mb.shape[1], 1)), jnp.float32)
refv = (mb @ np.asarray(x)).astype(np.float64)

ops = {}
for G, vmem in ((8, 4 * 2**20), (16, 16 * 2**20)):
    fbsr.MONO_GROUP_MAX = G
    fbsr.HALO_PANEL_VMEM = vmem
    op = fs.operator(mb, format="bsr", transpose=False)
    b = op.fwd.narrow
    assert b is not None
    print(f"G={G}: built group={b.group} win={b.win_slabs} "
          f"stride={b.win_stride} ns={b.panels.shape[0]}")
    y = np.asarray(op.matmat(x))
    rel = np.abs(y - refv).max() / np.abs(refv).max()
    print(f"  rel {rel:.2e}")
    assert rel < 1e-6
    ops[G] = op
fbsr.MONO_GROUP_MAX = 8
fbsr.HALO_PANEL_VMEM = 4 * 2**20

for it in range(3):
    for G, op in ops.items():
        t = time_scan(lambda X: op.matmat(X), x, iters=512, couple_rows=64)
        print(f"G={G} spmv busy {t*1e3:.4f} ms", flush=True)
