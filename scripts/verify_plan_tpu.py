"""Verify + A/B the gather-plan Y assembly (`ops.assemble`) on real TPU.

Hypersparse configs (powerlaw 65k^2/4M, rmat s18) through
`operator().matmat`: plan-assembled vs scatter-assembled, one process.
"""
import dataclasses
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import powerlaw, rmat
from fastsparse.bench.timing import time_fn
from fastsparse.ops.assemble import attach_plan

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def _strip_plan(fmt):
    from fastsparse.formats.ell import EllMatrix, SegmentedEll

    if fmt is None:
        return None
    if type(fmt).__name__ == "HybridMatrix":
        return dataclasses.replace(fmt, sparse=_strip_plan(fmt.sparse))
    if isinstance(fmt, (EllMatrix, SegmentedEll)):
        return dataclasses.replace(fmt, plan=None)
    return fmt


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    rng = np.random.default_rng(7)

    for name, mat in (
        ("powerlaw 65k^2 4M", powerlaw(65_536, 65_536, 4_000_000, seed=0,
                                       binary=True)),
        ("rmat s18", rmat(18, seed=1)),
    ):
        t0 = time.perf_counter()
        op = fs.operator(mat, transpose=False, reorder="degree")
        tick(f"{name}: operator built in {time.perf_counter()-t0:.1f}s "
             f"(plan attached: "
             f"{getattr(getattr(op.fwd, 'sparse', op.fwd), 'plan', None) is not None})")
        Xb = jnp.asarray(
            rng.standard_normal((mat.shape[1], 128)), jnp.float32
        )
        refb = mat[:256] @ np.asarray(Xb)
        scb = np.abs(refb).max() + 1e-30

        op0 = dataclasses.replace(op, fwd=_strip_plan(op.fwd))
        f0 = jax.jit(lambda op, X: op.matmat(X))
        Y0 = np.asarray(f0(op0, Xb))
        e0 = np.abs(Y0[:256] - refb).max() / scb
        dt0 = time_fn(f0, op0, Xb, reps=10)
        tick(f"{name} scatter: {dt0*1e3:8.3f} ms rel={e0:.2e}")

        f1 = jax.jit(lambda op, X: op.matmat(X))
        Y1 = np.asarray(f1(op, Xb))
        e1 = np.abs(Y1[:256] - refb).max() / scb
        dt1 = time_fn(f1, op, Xb, reps=10)
        tick(
            f"{name} plan   : {dt1*1e3:8.3f} ms rel={e1:.2e} "
            f"speedup={dt0/dt1:.2f}x bitwise={np.array_equal(Y0, Y1)}"
        )
        assert e1 < 5e-6

    tick("done")


if __name__ == "__main__":
    main()
