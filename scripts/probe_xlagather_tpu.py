"""XLA row-slice gather SpMM vs the Pallas gather engine (hypersparse).

probe_escgather showed XLA gathers of short row slices run near
bandwidth (6.4x scalar gathers). The ELL gather engine is
instruction-bound at ~2.2 ns/slot (N-independent); an XLA
gather-multiply-reduce over (nb, K) buckets moves nnz·N·4 B — at N=128
that is ~bandwidth-bound and could beat the engine.
"""
import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import powerlaw
from fastsparse.bench.timing import measure_rtt, time_fn

assert jax.default_backend() == "tpu"
print(f"rtt={measure_rtt() * 1e3:.1f} ms", flush=True)

rng = np.random.default_rng(0)
mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
op = fs.operator(mp, transpose=False, reorder="degree")
X = jnp.asarray(rng.standard_normal((65_536, 128)), jnp.float32)
ref = (mp @ np.asarray(X)).astype(np.float64)

f0 = jax.jit(lambda op, X: op.matmat(X))
Y0 = np.asarray(f0(op, X))
e0 = float(np.abs(Y0 - ref).max() / np.abs(ref).max())
dt0 = time_fn(f0, op, X, reps=10)
print(f"pallas gather engine N=128: {dt0 * 1e3:.3f} ms rel={e0:.2e} "
      f"fmt={type(op.fwd).__name__}", flush=True)

# XLA row-gather formulation over the same ELL buckets
A = op.fwd
segs = A.segments if hasattr(A, "segments") else (A,)
offs = A.col_offsets if hasattr(A, "segments") else (0,)
print("buckets:", [(b.width, b.nb) for s in segs for b in s.buckets],
      flush=True)


def xla_ell(op, X):
    A = op.fwd
    Xp = X if op.col_perm is None else X[op.col_perm]
    segs = A.segments if hasattr(A, "segments") else (A,)
    offs = A.col_offsets if hasattr(A, "segments") else (0,)
    nrow = A.shape[0]
    Y = jnp.zeros((nrow, X.shape[1]), jnp.float32)
    for off, seg in zip(offs, segs):
        xs = jax.lax.dynamic_slice_in_dim(
            Xp, off, min(seg.shape[1], Xp.shape[0] - off), axis=0
        )
        for b in seg.buckets:
            g = xs[jnp.clip(b.cols, 0, xs.shape[0] - 1)]  # (nb, K, N)
            contrib = jnp.einsum(
                "bk,bkn->bn", b.vals.astype(jnp.float32), g
            )
            Y = Y.at[b.row_ids].add(contrib)
    return Y if op.row_inv is None else Y[op.row_inv]


f1 = jax.jit(xla_ell)
Y1 = np.asarray(f1(op, X))
e1 = float(np.abs(Y1 - ref).max() / np.abs(ref).max())
dt1 = time_fn(f1, op, X, reps=10)
print(f"xla row-gather      N=128: {dt1 * 1e3:.3f} ms rel={e1:.2e}",
      flush=True)


# variant 2: scan over k — no (nb, K, N) temp, gather (nb, N) per step
def xla_ell_scan(op, X):
    A = op.fwd
    Xp = X if op.col_perm is None else X[op.col_perm]
    segs = A.segments if hasattr(A, "segments") else (A,)
    offs = A.col_offsets if hasattr(A, "segments") else (0,)
    nrow = A.shape[0]
    Y = jnp.zeros((nrow, X.shape[1]), jnp.float32)
    for off, seg in zip(offs, segs):
        xs = jax.lax.dynamic_slice_in_dim(
            Xp, off, min(seg.shape[1], Xp.shape[0] - off), axis=0
        )
        for b in seg.buckets:
            cols = jnp.clip(b.cols, 0, xs.shape[0] - 1)
            vals = b.vals.astype(jnp.float32)

            def body(acc, k):
                ck = jax.lax.dynamic_index_in_dim(
                    cols, k, axis=1, keepdims=False
                )
                vk = jax.lax.dynamic_index_in_dim(
                    vals, k, axis=1, keepdims=False
                )
                return acc + vk[:, None] * xs[ck], None

            acc, _ = jax.lax.scan(
                body,
                jnp.zeros((b.nb, X.shape[1]), jnp.float32),
                jnp.arange(b.width, dtype=jnp.int32),
            )
            Y = Y.at[b.row_ids].add(acc)
    return Y if op.row_inv is None else Y[op.row_inv]


f2 = jax.jit(xla_ell_scan)
Y2 = np.asarray(f2(op, X))
e2 = float(np.abs(Y2 - ref).max() / np.abs(ref).max())
dt2 = time_fn(f2, op, X, reps=10)
print(f"xla scan-gather     N=128: {dt2 * 1e3:.3f} ms rel={e2:.2e}",
      flush=True)
