"""TPU verify + A/B: panel-bucket BSR vs round-1 tile buckets.

Run (one TPU process at a time):
    PYTHONPATH=/root/repo:/root/.axon_site JAX_PLATFORMS=axon \
        python scripts/verify_panels_tpu.py

Covers: Mosaic compile of `panel_spmm` (bf16 + bitmask, wide + narrow),
fp32 parity at the 1e-6 bar on the headline banded config, and timed
A/B headline (panels vs tiles), SpMV, and narrow SpMM.
"""
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import banded, powerlaw
from fastsparse.bench.metrics import format_stats, tree_nbytes
from fastsparse.bench.sol import measure_hbm_bw, spmm_sol_seconds, spmv_sol_seconds
from fastsparse.bench.timing import time_fn
from fastsparse.utils.cache import enable_persistent_cache


def rel_err(Y, ref):
    return float(np.abs(np.asarray(Y, np.float64) - ref).max() / (np.abs(ref).max() + 1e-30))


def main():
    enable_persistent_cache()
    print("backend:", jax.default_backend(), flush=True)
    t0 = time.time()
    rng = np.random.default_rng(0)

    # --- small correctness first (fast compile feedback) ----------------
    mb_s = banded(3000, 512, seed=4, density=0.39)
    mb_s.data[:] = 1.0
    ref_s = mb_s.toarray()
    op_s = fs.operator(mb_s, format="bsr", transpose=False)
    print("small format:", type(op_s.fwd).__name__,
          "panel:", getattr(op_s.fwd, "is_panel", None), flush=True)
    Xs = jnp.asarray(rng.standard_normal((3000, 128)), jnp.float32)
    Ys = np.asarray(op_s.matmat(Xs))
    print("small spmm rel:", rel_err(Ys, ref_s @ np.asarray(Xs, np.float64)),
          f"[{time.time()-t0:.0f}s]", flush=True)
    xs = jnp.asarray(rng.standard_normal(3000), jnp.float32)
    ys = np.asarray(op_s.matvec(xs))
    print("small spmv rel:", rel_err(ys, ref_s @ np.asarray(xs, np.float64)), flush=True)
    Xn = jnp.asarray(rng.standard_normal((3000, 8)), jnp.float32)
    Yn = np.asarray(op_s.matmat(Xn))
    print("small narrow rel:", rel_err(Yn, ref_s @ np.asarray(Xn, np.float64)), flush=True)

    # bitmask variant compile check
    from fastsparse.formats.coo import binary_coo_from_scipy
    from fastsparse.formats.bsr import build_bsr
    from fastsparse.config import Config
    from fastsparse.ops.bsr_ops import bsr_spmm

    Ab = build_bsr(binary_coo_from_scipy(mb_s.tocoo()), config=Config(tile_m=128), binary=True)
    print("bitmask panel:", Ab.is_panel, flush=True)
    Yb = np.asarray(bsr_spmm(Ab, Xs))
    print("bitmask spmm rel:", rel_err(Yb, ref_s @ np.asarray(Xs, np.float64)),
          f"[{time.time()-t0:.0f}s]", flush=True)

    # --- headline A/B: banded 50k bw512, N=128 --------------------------
    mb = banded(50_000, 512, seed=4, density=0.39)
    mb.data[:] = 1.0
    nnz = int(mb.nnz)
    X = jnp.asarray(rng.standard_normal((50_000, 128)), jnp.float32)
    ref = None  # full dense too big? 50k x 128 result fine; use scipy matmul
    refY = (mb @ np.asarray(X)).astype(np.float64)

    bw = measure_hbm_bw()
    print("bw GB/s:", round(bw / 1e9, 1), flush=True)
    sol = spmm_sol_seconds(*mb.shape, nnz, 128, bw, binary=True)

    results = {}
    for name, kwargs in [
        ("panels", {}),
        ("tiles", dict(panels=False)),
    ]:
        t1 = time.time()
        if kwargs.get("panels") is False:
            # force classic tiles through a config copy
            import dataclasses
            from fastsparse.config import DEFAULT
            cfg = dataclasses.replace(DEFAULT, bsr_panels="off")
            op = fs.operator(mb, format="bsr", transpose=False, config=cfg)
        else:
            op = fs.operator(mb, format="bsr", transpose=False)
        st = format_stats(op.fwd) if not hasattr(op.fwd, "segments") else {
            "format": "ColSegmented",
            "a_bytes": tree_nbytes(op.fwd),
            "padded_tiles": sum(s.padded_tiles for s in op.fwd.segments),
            "panel": [getattr(s, "is_panel", None) for s in op.fwd.segments],
        }
        step = jax.jit(lambda op, X: op.matmat(X))
        Y = np.asarray(step(op, X))
        r = rel_err(Y, refY)
        assert r < 1e-6, (name, r)
        dt = time_fn(step, op, X, reps=20)
        results[name] = dt
        print(f"{name}: {dt*1e3:.3f} ms  rel={r:.2e}  "
              f"a_bytes/nnz={st.get('a_bytes', 0)/nnz:.2f} "
              f"sol_frac={sol/dt:.3f} [{time.time()-t1:.0f}s]", flush=True)

        # SpMV on the same operator
        x = jnp.asarray(rng.standard_normal(50_000), jnp.float32)
        refy = (mb @ np.asarray(x)).astype(np.float64)
        stepv = jax.jit(lambda op, x: op.matvec(x))
        y = np.asarray(stepv(op, x))
        rv = rel_err(y, refy)
        dtv = time_fn(stepv, op, x, reps=20)
        solv = spmv_sol_seconds(*mb.shape, nnz, bw, binary=True)
        print(f"{name} SpMV: {dtv*1e3:.3f} ms rel={rv:.2e} "
              f"nnz/s={nnz/dtv:.3e} sol_frac={solv/dtv:.4f}", flush=True)

        # narrow N=32
        X32 = jnp.asarray(rng.standard_normal((50_000, 32)), jnp.float32)
        ref32 = (mb @ np.asarray(X32)).astype(np.float64)
        Y32 = np.asarray(step(op, X32))
        r32 = rel_err(Y32, ref32)
        dt32 = time_fn(step, op, X32, reps=20)
        sol32 = spmm_sol_seconds(*mb.shape, nnz, 32, bw, binary=True)
        print(f"{name} N=32: {dt32*1e3:.3f} ms rel={r32:.2e} "
              f"sol_frac={sol32/dt32:.3f}", flush=True)

    if "panels" in results and "tiles" in results:
        print(f"A/B: tiles {results['tiles']*1e3:.3f} -> panels "
              f"{results['panels']*1e3:.3f} ms "
              f"({results['tiles']/results['panels']:.2f}x)", flush=True)
    print("total", round(time.time() - t0), "s")


if __name__ == "__main__":
    main()
