"""Probe: quant kernel store shape — 3 lane-slice stores vs one
concatenated store; plus end-to-end headline busy for each."""
import functools
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.ops.pallas import bsr_spmm as bs  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

K, NB = 51200, 128
rng = np.random.default_rng(0)
Xp = jnp.asarray(rng.standard_normal((K, NB)), jnp.float32)
m8 = bs.colmax_pallas(Xp)
s8 = jnp.where(m8 > 0, m8, 1.0) * (1.0 / (127.0 * 65536.0))
sinv = 1.0 / s8


def _body_cat(NB, x_ref, sinv_ref, o_ref):
    X = x_ref[:]
    i = jnp.round(X * sinv_ref[0:1, :]).astype(jnp.int32)
    q2 = ((i + 128) & 255) - 128
    i1 = (i - q2) >> 8
    q1 = ((i1 + 128) & 255) - 128
    q0 = (i1 - q1) >> 8
    o_ref[:] = jnp.concatenate(
        [q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8)],
        axis=1,
    )


def quant(body, BR):
    def f(X):
        return pl.pallas_call(
            functools.partial(body, NB),
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


a = quant(bs._quant3_body, 1024)
b = quant(_body_cat, 1024)
assert np.array_equal(np.asarray(a(Xp)), np.asarray(b(Xp)))
print("store variants identical", flush=True)
for it in range(4):
    for tag, fn in (("slices", a), ("concat", b)):
        t = time_scan(fn, Xp, iters=512)
        print(f"{tag:7s} {t*1e3:.4f} ms", flush=True)
