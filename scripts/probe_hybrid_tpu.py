"""TPU probe: where does the hybrid ECFP SpMM time go?

Times the same ECFP-like matrix through (a) segmented-ELL gather engine,
(b) hybrid with tilepack, and the hybrid's dense/sparse halves separately.
"""
import time

import numpy as np

import fastsparse as fs
from fastsparse.bench.matrices import ecfp_like
from fastsparse.bench.timing import fetch_scalar, time_fn
from fastsparse.utils.cache import enable_persistent_cache


def main():
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    fetch_scalar(jnp.ones((8,)) + 1)
    print(f"probe fetch ok ({time.perf_counter() - t0:.1f}s)", flush=True)

    m = ecfp_like(20000, 16384, bits_per_compound=64, n_scaffolds=120)
    nnz = int(m.nnz)
    X = jnp.asarray(
        np.random.default_rng(0).standard_normal((16384, 128)), jnp.float32
    )
    want = m @ np.asarray(X)

    def run(tag, op):
        step = jax.jit(lambda o, x: o.matmat(x))
        got = np.asarray(step(op, X))
        rel = np.abs(got - want).max() / np.abs(want).max()
        sec = time_fn(step, op, X, reps=10)
        print(
            f"{tag:28s} {sec * 1e3:9.3f} ms  {nnz / sec / 1e9:6.2f} Gnnz/s "
            f"rel={rel:.1e}",
            flush=True,
        )
        return sec

    run("ell-seg (no reorder)", fs.operator(m, format="ell-seg", transpose=False))
    run("ell-seg tilepack", fs.operator(m, format="ell-seg", transpose=False,
                                        reorder="tilepack"))
    oph = fs.operator(m, format="hybrid", transpose=False, reorder="tilepack")
    run("hybrid tilepack", oph)
    h = oph.fwd
    print(
        f"hybrid split: dense_nnz={h.dense_nnz} ({h.dense_fraction:.1%}), "
        f"dense type={type(h.dense).__name__}, sparse type={type(h.sparse).__name__}",
        flush=True,
    )
    if h.dense is not None:
        from fastsparse.ops import spmm as spmm_mod

        stepd = jax.jit(lambda d, x: spmm_mod.spmm(d, x))
        fetch_scalar(stepd(h.dense, X))
        sd = time_fn(stepd, h.dense, X, reps=10)
        print(f"  dense part alone: {sd * 1e3:9.3f} ms", flush=True)
        if hasattr(h.dense, "buckets"):
            for b in h.dense.buckets:
                print(f"    bucket T={b.ntiles} ns={b.ns}", flush=True)
    if h.sparse is not None:
        from fastsparse.ops import spmm as spmm_mod

        steps = jax.jit(lambda s, x: spmm_mod.spmm(s, x))
        fetch_scalar(steps(h.sparse, X))
        ss = time_fn(steps, h.sparse, X, reps=10)
        print(f"  sparse part alone: {ss * 1e3:9.3f} ms", flush=True)
        segs = getattr(h.sparse, "segments", [h.sparse])
        for sgi, sg in enumerate(segs):
            ws = [(b.width, b.nb) for b in sg.buckets]
            print(f"    seg{sgi} buckets (w, nb): {ws}", flush=True)


if __name__ == "__main__":
    main()
