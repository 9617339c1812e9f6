"""TPU probe: hybrid threshold sweep + bench configs with the new
single-segment gather and auto threshold (validates bench.model constants).
"""
import time

import numpy as np

import fastsparse as fs
from fastsparse.bench.matrices import ecfp_like, rmat
from fastsparse.bench.timing import fetch_scalar, time_fn
from fastsparse.utils.cache import enable_persistent_cache


def run(tag, op, m, X, want):
    import jax

    nnz = int(m.nnz)
    step = jax.jit(lambda o, x: o.matmat(x))
    got = np.asarray(step(op, X))[: want.shape[0]]
    rel = np.abs(got - want).max() / np.abs(want).max()
    sec = time_fn(step, op, X, reps=10)
    fwd = op.fwd
    extra = ""
    if hasattr(fwd, "dense_nnz"):
        extra = f" th={fwd.threshold} dense={fwd.dense_fraction:.0%}"
    print(
        f"{tag:36s} {sec * 1e3:9.3f} ms  {nnz / sec / 1e9:5.2f} Gnnz/s "
        f"rel={rel:.1e} fmt={type(fwd).__name__}{extra}",
        flush=True,
    )


def main():
    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)
    t0 = time.perf_counter()
    fetch_scalar(jnp.ones((8,)) + 1)
    print(f"probe fetch ok ({time.perf_counter() - t0:.1f}s)", flush=True)
    rng = np.random.default_rng(0)

    # threshold sweep on the small ECFP (single segment, fast compiles)
    m = ecfp_like(20000, 16384, bits_per_compound=64, n_scaffolds=120)
    X = jnp.asarray(rng.standard_normal((16384, 128)), jnp.float32)
    want = m[:2048] @ np.asarray(X)
    from fastsparse.formats.hybrid import build_hybrid
    from fastsparse.linops import SparseOperator
    from fastsparse.reorder.cluster import invert_perm, permute_coo, tilepack_perms

    coo = fs.binary_coo_from_scipy(m.tocoo())
    rp, cp = tilepack_perms(coo)
    ri, ci = invert_perm(rp), invert_perm(cp)
    pcoo = permute_coo(coo, rp, cp)
    for th in (8, 16, 32, 64, "auto"):
        h = build_hybrid(pcoo, threshold=th)
        op = SparseOperator(fwd=h, bwd=None, row_perm=rp, col_perm=cp,
                            row_inv=ri, col_inv=ci, shape=tuple(coo.shape))
        run(f"ecfp20k hybrid th={th}", op, m, X, want)

    # bench config: ecfp 50k x 20k through the public API (auto everything)
    m2 = ecfp_like(50_000, 20_000, 64, 400, seed=2)
    X2 = jnp.asarray(rng.standard_normal((20_000, 128)), jnp.float32)
    want2 = m2[:2048] @ np.asarray(X2)
    op2 = fs.operator(m2, reorder="auto", transpose=False)
    run("BENCH ecfp 50k x 20k auto", op2, m2, X2, want2)

    # bench config: rmat s18 (65536 cols -> 3 balanced segments)
    m3 = rmat(18, 16, seed=3)
    X3 = jnp.asarray(rng.standard_normal((m3.shape[1], 128)), jnp.float32)
    want3 = m3[:2048] @ np.asarray(X3)
    op3 = fs.operator(m3, reorder="auto", transpose=False)
    run("BENCH rmat s18 auto", op3, m3, X3, want3)


if __name__ == "__main__":
    main()
