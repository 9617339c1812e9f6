"""Probe: dense-column extraction economics (round 5 tasks #2/#3).

Power-law/R-MAT matrices concentrate nnz in high-degree columns (rmat
s18: top-1024 cols hold 31% of nnz). Moving those columns out of the
~1.3-2 ns/slot gather engine into a DENSE (nrow, D) int8 0/1 block makes
them an MXU matmul. This probe measures the end-to-end dense-block
product cost on v5e so the format-selection model gets a measured
per-column constant:

  i8dot    — (nrow, D) s8 block @ (D, 3N) s8 planes -> s32 (XLA dot)
  bf16dot  — bf16 block @ (D, 3N) bf16 planes (fallback if s8 is slow)
  gatherq  — X[col_ids] gather + radix-256 quantization of (D, N)
  full     — gather + quant + 3-plane dot + recombine (the real path)
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.ops.bsr_ops import _quant3_carry  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
N = 128

for NROW, D in ((65536, 1024), (262144, 1024), (262144, 2048)):
    B = jnp.asarray(
        (rng.random((NROW, D)) < 0.03).astype(np.int8)
    )
    Bb = B.astype(jnp.bfloat16)
    cids = jnp.asarray(
        np.sort(rng.choice(NROW, D, replace=False)), jnp.int32
    )
    X = jnp.asarray(rng.standard_normal((NROW, N)), jnp.float32)

    def quant(Xs):
        q0, q1, q2, s = _quant3_carry(Xs)
        return (
            q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8), s
        )

    q0f, q1f, q2f, sf = quant(X[:D])

    def i8dot(X):
        # carrier X; fixed planes (cost of the dots alone)
        d0 = jax.lax.dot_general(
            B, q0f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d1 = jax.lax.dot_general(
            B, q1f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d2 = jax.lax.dot_general(
            B, q2f, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        y = (
            d0.astype(jnp.float32) * 65536.0
            + d1.astype(jnp.float32) * 256.0
            + d2.astype(jnp.float32)
        ) * sf
        return y

    x0f = q0f.astype(jnp.bfloat16)

    def bf16dot(X):
        y = jnp.dot(Bb, x0f, preferred_element_type=jnp.float32)
        return y

    def gatherq(X):
        Xs = X[cids]
        q0, q1, q2, s = _quant3_carry(Xs)
        return q0 + q1 + q2

    def full(X):
        Xs = X[cids]
        q0, q1, q2, s = _quant3_carry(Xs)
        q0, q1, q2 = (
            q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8)
        )
        d0 = jax.lax.dot_general(
            B, q0, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d1 = jax.lax.dot_general(
            B, q1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        d2 = jax.lax.dot_general(
            B, q2, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        return (
            d0.astype(jnp.float32) * 65536.0
            + d1.astype(jnp.float32) * 256.0
            + d2.astype(jnp.float32)
        ) * s

    # parity of the full path vs fp64
    Xs_h = np.asarray(X)[np.asarray(cids)].astype(np.float64)
    ref = np.asarray(B, np.float64) @ Xs_h
    got = np.asarray(full(X))
    rel = np.abs(got - ref).max() / (np.abs(ref).max() + 1e-30)
    print(f"NROW={NROW} D={D} full-path rel {rel:.2e}")
    assert rel < 1e-6

    for tag, fn in (("i8dot", i8dot), ("bf16x1", bf16dot),
                    ("gatherq", gatherq), ("full", full)):
        t = time_scan(fn, X, iters=128)
        per_col = t / D
        print(f"  {tag:8s} {t*1e3:8.3f} ms   {per_col*1e9:8.2f} ns/col"
              f"   ({t/ (NROW*D) * 1e12:6.3f} ps/cell)")
