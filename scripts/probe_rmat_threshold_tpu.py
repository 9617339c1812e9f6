"""rmat s18 hybrid threshold sweep with bf16 tiles + plan assembly
(one process): is the modeled breakeven (~60 nnz/tile, calibrated on
bitmask-era tile costs) still right now that dense tiles skip the mask
expansion?"""
import time

import numpy as np

from fastsparse.utils.cache import enable_persistent_cache

enable_persistent_cache()

import jax
import jax.numpy as jnp

import fastsparse as fs
from fastsparse.bench.matrices import rmat
from fastsparse.bench.timing import time_fn
from fastsparse.formats.hybrid import build_hybrid
from fastsparse.ops.assemble import attach_plan
from fastsparse.reorder.cluster import degree_perms, invert_perm, permute_coo

T0 = time.perf_counter()


def tick(msg):
    print(f"[{time.perf_counter()-T0:7.1f}s] {msg}", flush=True)


def main():
    assert jax.default_backend() == "tpu", jax.default_backend()
    assert float(jnp.sum(jnp.ones((8, 128)))) == 1024.0
    tick("tunnel ok")
    rng = np.random.default_rng(3)
    mat = rmat(18, 16, seed=3)
    X = jnp.asarray(rng.standard_normal((mat.shape[1], 128)), jnp.float32)
    ref = mat[:256] @ np.asarray(X)
    sc = np.abs(ref).max() + 1e-30

    coo = fs.binary_coo_from_scipy(mat.tocoo())
    rp, cp = degree_perms(coo)
    pcoo = permute_coo(coo, rp, cp)
    ri = np.asarray(invert_perm(rp))
    Xp = jnp.asarray(np.asarray(X)[np.asarray(cp)])
    tick(f"built perms ({mat.nnz} nnz)")

    for th in ("auto", 16, 32, 64, 96):
        t0 = time.perf_counter()
        H = attach_plan(build_hybrid(pcoo, threshold=th))
        tb = time.perf_counter() - t0
        f = jax.jit(lambda H, X: fs.spmm(H, X))
        Yp = np.asarray(f(H, Xp))
        err = float(np.abs(Yp[ri][:256] - ref).max() / sc)
        dt = time_fn(f, H, Xp, reps=10)
        tick(
            f"th={th!s:>5}: {dt*1e3:8.3f} ms dense_frac={H.dense_fraction:.3f} "
            f"(eff th={H.threshold}) rel={err:.1e} build {tb:.0f}s"
        )
        assert err < 6e-6

    tick("done")


if __name__ == "__main__":
    main()
