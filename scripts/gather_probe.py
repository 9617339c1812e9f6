"""Probe: wide-operand lane gather in Pallas (the ELL SpMV enabler).

If take_along_axis(axis=1) works with a wide (8, ncol) operand and
arbitrary per-lane indices, an ELL SpMV kernel can gather x directly:
replicate x across 8 sublanes, put 8 rows' column indices in (8, K)
blocks, gather, multiply, row-reduce.
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def probe(width, K=512, rows=512):
    rng = np.random.default_rng(0)
    x2d = jnp.asarray(
        np.broadcast_to(rng.standard_normal(width).astype(np.float32), (8, width))
    )
    idx = jnp.asarray(rng.integers(0, width, (rows, K)), jnp.int32)

    def kernel(x_ref, i_ref, o_ref):
        blk = i_ref[:]  # (8, K) per grid step
        o_ref[:] = jnp.take_along_axis(
            jnp.broadcast_to(x_ref[:], (8, x_ref.shape[1]))[:, : x_ref.shape[1]],
            blk,
            axis=1,
        )

    f = pl.pallas_call(
        kernel,
        grid=(rows // 8,),
        in_specs=[
            pl.BlockSpec((8, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, K), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((rows, K), jnp.float32),
    )
    try:
        out = jax.jit(f)(x2d, idx)
        jax.block_until_ready(out)
        ok = np.allclose(
            np.asarray(out), np.asarray(x2d)[0][np.asarray(idx)], atol=0
        )
        t0 = time.perf_counter()
        for _ in range(20):
            out = jax.jit(f)(x2d, idx)
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 20
        gath_s = rows * K / dt
        tick(f"width={width}: OK correct={ok}  {dt*1e6:.0f} us  {gath_s/1e9:.2f} Ggather/s")
        return True
    except Exception as e:
        tick(f"width={width}: FAILED {str(e)[:120]}")
        return False


def main():
    assert jax.default_backend() == "tpu"
    for width in [128, 256, 1024, 8192, 65536]:
        if not probe(width):
            break
    tick("done")


if __name__ == "__main__":
    main()
