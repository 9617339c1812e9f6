"""Per-tile cost breakdown for the binary BSR headline (roadmap item 2).

Headline config (banded 50k bw512 binary, N=128, auto tile_m=128) runs
~1.0 us/tile vs ~0.1 us of pure MXU work. A/B the candidate costs in ONE
process:

  1. bitmask tiles + expansion, binary_path planes_n   (current headline)
  2. bitmask tiles + expansion, binary_path planes_k
  3. bitmask tiles + expansion, binary_path expand (HIGHEST, 6 passes)
  4. bf16 VALUED tiles (no expansion, exact for 0/1), wide path
  5. bitmask tiles, precision DEFAULT 1-pass (parity loss — bound only)

(4) isolates the mask-expansion VPU cost at 4x the A-tile DMA bytes;
(5) bounds the MXU-pass count cost.
"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded
from fastsparse.bench.timing import time_fn
from fastsparse.ops.bsr_ops import bsr_spmm

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")

    rng = np.random.default_rng(0)
    mb = banded(50_000, 512, seed=4, density=0.39)
    mb.data[:] = 1.0
    nnz = int(mb.nnz)
    X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
    ref = mb[:256] @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30

    coo = fs.binary_coo_from_scipy(mb.tocoo())
    cfg = fs.Config(tile_m=128)
    A_bits = fs.build_bsr(coo, config=cfg, binary=True)
    n_tiles = sum(b.slab_ids.size for b in A_bits.buckets)
    tick(f"built: {n_tiles} tiles ({nnz} nnz)")

    def run(tag, f, parity=True):
        Y = np.asarray(f(X))
        err = float(np.abs(Y[:256] - ref).max() / sc)
        dt = time_fn(lambda X: f(X), X, reps=20)
        tick(
            f"{tag:>28}: {dt*1e3:7.3f} ms  {dt/n_tiles*1e9:7.1f} ns/tile "
            f"rel={err:.1e}"
        )
        if parity:
            assert err < 2e-6, (tag, err)

    for path in ("planes_n", "planes_k", "expand"):
        run(
            f"bits/{path}",
            jax.jit(lambda X, p=path: bsr_spmm(A_bits, X, binary_path=p)),
        )

    A_bf = fs.build_bsr(coo, config=cfg, binary=False, dtype="bfloat16")
    run("bf16 tiles (no expand)", jax.jit(lambda X: bsr_spmm(A_bf, X)))

    run(
        "bits DEFAULT 1-pass (bound)",
        jax.jit(
            lambda X: bsr_spmm(
                A_bits, X, precision="default", binary_path="expand"
            )
        ),
        parity=False,
    )

    # --- bounding variants through the operator (ColSegmented resident X,
    # the bench.py path — direct unsegmented builds drop out of the
    # resident strategy and mislead) --------------------------------------
    op = fs.operator(mb, format="bsr", transpose=False)
    run(
        "op bf16 tiles 3-plane (bench)",
        jax.jit(lambda X: op.matmat(X)),
    )
    # single bf16 X plane: 1 MXU pass, bf16 output — bounds what removing
    # the 3-plane parity split could ever buy
    run(
        "op bf16 tiles, bf16 X 1-plane",
        jax.jit(lambda X: op.matmat(X.astype(jnp.bfloat16))),
        parity=False,
    )

    # taller tiles: fixed per-tile cost dominates at tm=128 (172 vs
    # 137 ns bound) — tm=256 halves the tile count on banded structure
    for tm in (256, 512):
        cfg_t = fs.Config(tile_m=tm)
        op_t = fs.operator(mb, format="bsr", transpose=False, config=cfg_t)
        run(
            f"op bf16 tiles tm={tm}",
            jax.jit(lambda X, o=op_t: o.matmat(X)),
        )

    tick("done")


if __name__ == "__main__":
    main()
