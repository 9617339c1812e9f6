"""Probe: quant3 kernel block-size tuning (headline prep, task #1).

The Pallas quant kernel traced 0.039 ms on the (51200, 128) headline X
— 2.3x its 17 us read+write floor. Same-process A/B over block heights
plus colmax, and the full headline busy with the best setting.
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.ops.pallas import bsr_spmm as bs  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

import functools  # noqa: E402

from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

rng = np.random.default_rng(0)
K, NB = 51200, 128
Xp = jnp.asarray(rng.standard_normal((K, NB)), jnp.float32)
m8 = bs.colmax_pallas(Xp)
s8 = jnp.where(m8 > 0, m8, 1.0) * (1.0 / (127.0 * 65536.0))
sinv = 1.0 / s8


def quant_br(BR):
    def f(X):
        return pl.pallas_call(
            functools.partial(bs._quant3_body, NB),
            grid=(K // BR, 1),
            in_specs=[
                pl.BlockSpec((BR, NB), lambda i, j: (i, j),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((8, NB), lambda i, j: (0, j),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((BR, 3 * NB), lambda i, j: (i, j),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((K, 3 * NB), jnp.int8),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
        )(X, sinv)
    return f


res = {}


def run(tag, fn, x0, iters=512):
    t = time_scan(fn, x0, iters=iters)
    res.setdefault(tag, []).append(t * 1e3)
    print(f"{tag:10s} {t*1e3:8.4f} ms", flush=True)


for it in range(3):
    for BR in (256, 512, 1024, 2048):
        run(f"q{BR}", quant_br(BR), Xp)
    run("colmax", lambda X: bs.colmax_pallas(X), Xp)

print("== mins ==")
for k, v in res.items():
    print(f"{k:10s} {min(v):8.4f}")

# headline busy with the current default, same process
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
Y = np.asarray(op.matmat(X))
ref = (mb @ np.asarray(X)).astype(np.float64)
rel = np.abs(Y - ref).max() / np.abs(ref).max()
print("headline rel", rel)
for it in range(3):
    b = time_scan(lambda X: op.matmat(X), X, iters=256, couple_rows=64)
    print(f"headline busy {b*1e3:.4f} ms", flush=True)
