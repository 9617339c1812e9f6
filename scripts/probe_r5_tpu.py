"""Round-5 end-to-end check: quant-kernel headline + new gather engine.

Measures driver-style numbers for the three matrices the VERDICT bars
name, after the round-5 changes (Pallas quant prep, sub-row splitting +
packed-full gather body, dense-column extraction):

  headline — banded 50k bw512 N=128 mono/int8 (target busy <= 0.160 ms)
  powerlaw — 65536^2 4M nnz N=128, reorder=degree (target <= 6 ms)
  rmat     — s18 N=128, reorder=auto (target <= 9.5 ms)
"""
import sys
import time

import numpy as np

sys.path.insert(0, ".")
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import fastsparse as fs  # noqa: E402
from fastsparse.bench.matrices import banded, powerlaw, rmat  # noqa: E402
from fastsparse.bench.timing import time_fn, time_scan  # noqa: E402
from fastsparse.utils.cache import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
assert jax.default_backend() == "tpu"
rng = np.random.default_rng(0)

which = set(sys.argv[1:]) or {"headline", "powerlaw", "rmat"}

if "headline" in which:
    mb = banded(50_000, 512, seed=4, density=0.39)
    mb.data[:] = 1.0
    op = fs.operator(mb, format="bsr", transpose=False)
    X = jnp.asarray(rng.standard_normal((mb.shape[1], 128)), jnp.float32)
    Y = np.asarray(op.matmat(X))
    ref = (mb @ np.asarray(X)).astype(np.float64)
    rel = np.abs(Y - ref).max() / np.abs(ref).max()
    print(f"headline rel {rel:.2e}")
    assert rel < 1e-6
    for it in range(3):
        b = time_scan(lambda X: op.matmat(X), X, iters=256, couple_rows=64)
        print(f"headline busy {b*1e3:.4f} ms")

if "powerlaw" in which:
    t0 = time.time()
    mp = powerlaw(65_536, 65_536, 4_000_000, seed=0, binary=True)
    opp = fs.operator(mp, transpose=False, reorder="degree")
    print(f"powerlaw build {time.time()-t0:.0f}s fmt={type(opp.fwd).__name__}")
    fwd = opp.fwd
    if hasattr(fwd, "dense_cols") and fwd.dense_cols is not None:
        print(f"  dense_cols D={fwd.dense_cols.col_ids.shape[0]} "
              f"nnz={fwd.dense_cols.nnz} ({fwd.dense_cols.nnz/mp.nnz:.3f})")
    if hasattr(fwd, "dense_nnz"):
        print(f"  dense_tiles nnz={fwd.dense_nnz} ({fwd.dense_nnz/mp.nnz:.3f})")
    print(f"  perms: row={opp.row_perm is not None} col={opp.col_perm is not None}")
    Xp = jnp.asarray(rng.standard_normal((mp.shape[1], 128)), jnp.float32)
    stepp = jax.jit(lambda op, X: op.matmat(X))
    Yp = np.asarray(stepp(opp, Xp))
    refp = (mp @ np.asarray(Xp)).astype(np.float64)
    errp = np.abs(Yp - refp).max() / np.abs(refp).max()
    print(f"powerlaw rel {errp:.2e}")
    assert errp < 1e-5
    for it in range(2):
        dtp = time_fn(stepp, opp, Xp, reps=10)
        print(f"powerlaw wall {dtp*1e3:.3f} ms")
    try:
        b = time_scan(lambda X: opp.matmat(X), Xp, iters=64)
        print(f"powerlaw busy {b*1e3:.3f} ms")
    except Exception as e:
        print("powerlaw busy failed:", repr(e)[:120])

if "rmat" in which:
    t0 = time.time()
    mr = rmat(18, 16, seed=3)
    opr = fs.operator(mr, reorder="auto", transpose=False)
    print(f"rmat build {time.time()-t0:.0f}s fmt={type(opr.fwd).__name__}")
    fwd = opr.fwd
    if hasattr(fwd, "dense_cols") and fwd.dense_cols is not None:
        print(f"  dense_cols D={fwd.dense_cols.col_ids.shape[0]} "
              f"nnz={fwd.dense_cols.nnz} ({fwd.dense_cols.nnz/mr.nnz:.3f})")
    if hasattr(fwd, "dense_nnz"):
        print(f"  dense_tiles nnz={fwd.dense_nnz} ({fwd.dense_nnz/mr.nnz:.3f})")
    print(f"  perms: row={opr.row_perm is not None} col={opr.col_perm is not None}")
    Xr = jnp.asarray(rng.standard_normal((mr.shape[1], 128)), jnp.float32)
    stepr = jax.jit(lambda op, X: op.matmat(X))
    Yr = np.asarray(stepr(opr, Xr))
    refr = (mr @ np.asarray(Xr)).astype(np.float64)
    errr = np.abs(Yr - refr).max() / np.abs(refr).max()
    print(f"rmat rel {errr:.2e}")
    assert errr < 1e-5
    for it in range(2):
        dtr = time_fn(stepr, opr, Xr, reps=5)
        print(f"rmat wall {dtr*1e3:.3f} ms")
    try:
        b = time_scan(lambda X: opr.matmat(X), Xr, iters=32)
        print(f"rmat busy {b*1e3:.3f} ms")
    except Exception as e:
        print("rmat busy failed:", repr(e)[:120])
