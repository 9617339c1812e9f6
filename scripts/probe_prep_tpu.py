"""Probe: where do the headline prep's 61 us go? (round 5 task #1)

Round-4 stage split (BENCH.md): headline busy 0.176 ms = i8-quant prep
0.061 + mono kernel ~0.115. The prep's pure-bandwidth floor is ~26 us
(colmax read + quant read/write at ~11 B/elem), so up to ~35 us of the
busy time is prep overhead. This probe times, same-process interleaved:

  full     — op.matmat busy (reference)
  kernel   — mono kernel with fixed prequantized planes (scale carrier)
  prep     — _quant3_planes as-is (concat layout)
  prep3    — planes written as (3, K, NB) stacked-leading (no lane concat)
  prepflat — q0-only write (pure elementwise + 1-plane write floor)
  colmax   — the per-column max reduction alone
  prepg    — global (scalar) scale instead of per-column max
"""
import sys

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded  # noqa: E402
from fastsparse.bench.timing import time_scan  # noqa: E402
from fastsparse.ops.bsr_ops import _quant3_carry, _quant3_planes  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"

rng = np.random.default_rng(0)
mb = banded(50_000, 512, seed=4, density=0.39)
mb.data[:] = 1.0
op = fs.operator(mb, format="bsr", transpose=False)
A = op.fwd
b = A.buckets[0]
TK = A.tile_k
K_pad = b.n_windows * b.win_slabs * TK
print("mono:", A.is_mono, "tm", A.tile_m, "W", b.width, "win", b.win_slabs,
      "K_pad", K_pad, "ni", b.strip_ids.shape[0])

N = 128
X = jnp.asarray(rng.standard_normal((mb.shape[1], N)), jnp.float32)
Xp = jnp.zeros((K_pad, N), jnp.float32).at[: mb.shape[1]].set(X)

res = {}


def run(tag, fn, x0, iters=512):
    t = time_scan(fn, x0, iters=iters)
    res.setdefault(tag, []).append(t * 1e3)
    print(f"{tag:10s} {t*1e3:8.4f} ms")


# --- kernel-only: fixed planes, scale is the carrier ---------------------
planes_fixed, s_fixed = _quant3_planes(Xp, 128, 128)
planes_fixed = jax.device_put(planes_fixed)
from fastsparse.ops.pallas.bsr_spmm import mono_panel_spmm  # noqa: E402


def kernel_only(s):
    return mono_panel_spmm(
        b.window, b.strip_ids, b.start_rel, b.first, b.panels,
        planes_fixed,
        tile_m=A.tile_m, tile_k=TK, width=b.width, win_slabs=b.win_slabs,
        binary=A.binary, n_block=128, fold="i8", precision="highest",
        out_rows=max(b.out_strips, A.n_strips) * A.tile_m,
        scale=s,
    )


# --- prep variants -------------------------------------------------------

def prep_cur(X):
    q, s = _quant3_planes(X, 128, 128)
    return q


def prep3(X):
    q0, q1, q2, s = _quant3_carry(X)
    return jnp.stack(
        [q.astype(jnp.int8) for q in (q0, q1, q2)], axis=0
    )


def prepflat(X):
    q0, q1, q2, s = _quant3_carry(X)
    return q0.astype(jnp.int8) + q1.astype(jnp.int8) + q2.astype(jnp.int8)


def colmax(X):
    return jnp.max(jnp.abs(X), axis=0, keepdims=True)


def prepg(X):
    m = jnp.max(jnp.abs(X))
    s = jnp.where(m > 0, m, 1.0) * (1.0 / (127.0 * 65536.0))
    i = jnp.round(X * (1.0 / s)).astype(jnp.int32)
    q2 = ((i + 128) & 255) - 128
    i1 = (i - q2) >> 8
    q1 = ((i1 + 128) & 255) - 128
    q0 = (i1 - q1) >> 8
    return jnp.concatenate(
        [q.astype(jnp.int8) for q in (q0, q1, q2)], axis=1
    )


for it in range(3):
    run("full", lambda X: op.matmat(X), X)
    run("kernel", kernel_only, jnp.broadcast_to(s_fixed, (1, 128)) * 1.0)
    run("prep", prep_cur, Xp)
    run("prep3", prep3, Xp)
    run("prepflat", prepflat, Xp)
    run("colmax", colmax, Xp, iters=1024)
    run("prepg", prepg, Xp)

print("\n== mins over interleaved runs ==")
for k, v in res.items():
    print(f"{k:10s} {min(v):8.4f} ms")
