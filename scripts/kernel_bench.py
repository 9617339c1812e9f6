"""Microbench the BSR SpMM kernel: isolate cost centers on the TPU.

Sweeps: tiles-per-step batching, MXU precision, binary expansion.
One synthetic bucket, fixed shapes for compile-cache reuse.
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


TM, TK, NB = 8, 128, 128
NS, T = 4096, 16  # 64k tiles
NSL = 128  # column slabs


def run_variant(name, body, tiles, x, slab_ids, SG, TB, reps=30):
    grid = (NS // SG, T // TB)
    f = pl.pallas_call(
        body,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (SG, TB, TM, tiles.shape[-1]),
                    lambda i, t, s: (i, t, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (SG * TM, NB), lambda i, t, s: (i, 0), memory_space=pltpu.VMEM
            ),
        ),
        out_shape=jax.ShapeDtypeStruct((NS * TM, NB), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
    )
    from fastsparse.bench.timing import time_fn

    g = jax.jit(lambda s_, t_, x_: f(s_.reshape(-1), t_, x_))
    out = g(slab_ids, tiles, x)
    dt = time_fn(g, slab_ids, tiles, x, reps=reps)
    ntile = NS * T
    tick(f"{name}: {dt*1e3:7.3f} ms  {dt/ntile*1e9:6.1f} ns/tile  "
         f"{ntile*TM*TK*2*NB/dt/1e12:5.2f} eff-TFLOP/s")
    return out


def mk_valued_body(SG, TB, precision):
    def body(slab_ref, tiles_ref, x_ref, o_ref):
        t = pl.program_id(1)
        i = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for g in range(SG):
            acc = None
            for u in range(TB):
                slab = slab_ref[(i * SG + g) * T + t * TB + u]
                xs = x_ref[pl.ds(slab * TK, TK), :]
                d = jnp.dot(tiles_ref[g, u], xs,
                            preferred_element_type=jnp.float32,
                            precision=precision)
                acc = d if acc is None else acc + d
            o_ref[pl.ds(g * TM, TM), :] += acc
    return body


def mk_binary_body(SG, TB, mode):
    W = TK // 32

    def expand(words):
        rep = jnp.concatenate([words] * 32, axis=1)
        col = jax.lax.broadcasted_iota(jnp.int32, (TM, TK), 1)
        bit = (col // W).astype(jnp.uint32)
        on = ((rep >> bit) & jnp.uint32(1)) != 0
        return on

    def body(slab_ref, tiles_ref, x_ref, o_ref):
        t = pl.program_id(1)
        i = pl.program_id(0)

        @pl.when(t == 0)
        def _():
            o_ref[:] = jnp.zeros_like(o_ref)

        for g in range(SG):
            acc = None
            for u in range(TB):
                slab = slab_ref[(i * SG + g) * T + t * TB + u]
                xs = x_ref[pl.ds(slab * TK, TK), :]
                on = expand(tiles_ref[g, u])
                if mode == "3pass":
                    a = jnp.where(on, jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
                    x0 = xs.astype(jnp.bfloat16)
                    r1 = xs - x0.astype(jnp.float32)
                    x1 = r1.astype(jnp.bfloat16)
                    x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
                    d = jnp.dot(a, x0, preferred_element_type=jnp.float32)
                    d = d + jnp.dot(a, x1, preferred_element_type=jnp.float32)
                    d = d + jnp.dot(a, x2, preferred_element_type=jnp.float32)
                elif mode == "2pass":
                    a = jnp.where(on, jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
                    hi = xs.astype(jnp.bfloat16)
                    lo = (xs - hi.astype(jnp.float32)).astype(jnp.bfloat16)
                    d = jnp.dot(a, hi, preferred_element_type=jnp.float32)
                    d = d + jnp.dot(a, lo, preferred_element_type=jnp.float32)
                elif mode == "1pass-bf16":
                    a = jnp.where(on, jnp.float32(1), jnp.float32(0)).astype(jnp.bfloat16)
                    d = jnp.dot(a, xs.astype(jnp.bfloat16),
                                preferred_element_type=jnp.float32)
                else:  # f32 highest
                    a = jnp.where(on, jnp.float32(1), jnp.float32(0))
                    d = jnp.dot(a, xs, preferred_element_type=jnp.float32,
                                precision=jax.lax.Precision.HIGHEST)
                acc = d if acc is None else acc + d
            o_ref[pl.ds(g * TM, TM), :] += acc
    return body


def main():
    assert jax.default_backend() == "tpu"
    rng = np.random.default_rng(0)
    slab_ids = jnp.asarray(rng.integers(0, NSL, (NS, T)), jnp.int32)
    x = jnp.asarray(rng.standard_normal((NSL * TK, NB)), jnp.float32)
    tiles_f32 = jnp.asarray(rng.standard_normal((NS, T, TM, TK)) *
                            (rng.random((NS, T, TM, TK)) < 0.05), jnp.float32)
    tiles_bits = jnp.asarray(rng.integers(0, 2**32, (NS, T, TM, TK // 32),
                                          dtype=np.uint64), jnp.uint32)
    tick(f"tiles f32 {tiles_f32.nbytes/1e6:.0f} MB, bits {tiles_bits.nbytes/1e6:.0f} MB")

    P = jax.lax.Precision
    for SG, TB in [(8, 4), (8, 8), (8, 16)]:
        run_variant(f"valued SG{SG} TB{TB} HIGHEST", mk_valued_body(SG, TB, P.HIGHEST),
                    tiles_f32, x, slab_ids, SG, TB)
    run_variant("valued SG8 TB4 DEFAULT", mk_valued_body(8, 4, P.DEFAULT),
                tiles_f32, x, slab_ids, 8, 4)
    for mode in ["f32-highest", "3pass", "1pass-bf16"]:
        run_variant(f"binary SG8 TB4 {mode}", mk_binary_body(8, 4, mode),
                    tiles_bits, x, slab_ids, 8, 4)
    run_variant("binary SG8 TB16 3pass", mk_binary_body(8, 16, "3pass"),
                tiles_bits, x, slab_ids, 8, 16)
    # accuracy of 3pass vs f32-highest
    o_ref = run_variant("binary ref", mk_binary_body(8, 4, "f32-highest"),
                        tiles_bits, x, slab_ids, 8, 4, reps=1)
    o_3p = run_variant("binary 3p", mk_binary_body(8, 4, "3pass"),
                       tiles_bits, x, slab_ids, 8, 4, reps=1)
    err = float(jnp.max(jnp.abs(o_ref - o_3p)) / (jnp.max(jnp.abs(o_ref)) + 1e-30))
    tick(f"3pass rel err vs highest: {err:.2e}")
    # production kernels (block-batched expansion)
    from fastsparse.ops.pallas.bsr_spmm import bucket_spmm, bucket_spmv
    from fastsparse.bench.timing import time_fn

    for prec in ["highest", "default"]:
        f = lambda s_, t_, x_: bucket_spmm(
            s_, t_, x_, tile_m=TM, tile_k=TK, binary=False,
            n_block=NB, strategy="resident", precision=prec)
        out = f(slab_ids, tiles_f32, x)
        dt = time_fn(f, slab_ids, tiles_f32, x, reps=30)
        tick(f"PROD valued {prec}: {dt*1e3:7.3f} ms  {dt/(NS*T)*1e9:6.1f} ns/tile")
    for prec in ["highest", "default"]:
        f = lambda s_, t_, x_: bucket_spmm(
            s_, t_, x_, tile_m=TM, tile_k=TK, binary=True,
            n_block=NB, strategy="resident", precision=prec)
        out = f(slab_ids, tiles_bits, x)
        dt = time_fn(f, slab_ids, tiles_bits, x, reps=30)
        tick(f"PROD binary {prec}: {dt*1e3:7.3f} ms  {dt/(NS*T)*1e9:6.1f} ns/tile")
    xv = x[:, 0].reshape(NSL, TK)
    f = lambda s_, t_, x_: bucket_spmv(
        s_, t_, x_, tile_m=TM, tile_k=TK, binary=True)
    out = f(slab_ids, tiles_bits, xv)
    dt = time_fn(f, slab_ids, tiles_bits, xv, reps=30)
    tick(f"PROD binary spmv: {dt*1e3:7.3f} ms  {dt/(NS*T)*1e9:6.1f} ns/tile")
    tick("done")


if __name__ == "__main__":
    main()
