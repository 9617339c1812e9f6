"""Macau-style side-information regression on TPU.

The reference library exists as the sparse backend for Macau/SMURFF
Bayesian matrix factorization (SURVEY.md §1.1): per Gibbs iteration it
solves ``(AᵀA + reg·I) V = Aᵀ R + noise`` where ``A`` is a huge binary
side-information matrix (ECFP chemical fingerprints) and V are latent
links. This example runs that inner loop end-to-end with fastsparse:

    PYTHONPATH=. python examples/macau_side_info.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

import fastsparse as fs


def make_fingerprints(n_compounds=20_000, n_features=10_000, nnz=600_000, seed=0):
    """Synthetic ECFP-like binary matrix: power-law feature popularity."""
    rng = np.random.default_rng(seed)
    r = rng.integers(0, n_compounds, nnz)
    c = (n_features * (rng.random(nnz) ** 2.0)).astype(np.int64) % n_features
    m = sp.coo_matrix(
        (np.ones(nnz, np.float32), (r, c)), shape=(n_compounds, n_features)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    return m.tocsr()


def main():
    n_latent = 32
    reg = 5.0
    if jax.default_backend() == "tpu":
        A_sp = make_fingerprints()
    else:  # CPU runs Pallas in interpreter mode — keep it tiny
        A_sp = make_fingerprints(800, 600, 24_000)
    print(f"side info: {A_sp.shape}, nnz={A_sp.nnz}")

    # Compile once: bitmask tiled-BSR + dual tiling, degree-clustered.
    t0 = time.perf_counter()
    A = fs.operator(A_sp, reorder="degree")
    print(f"compile formats: {time.perf_counter()-t0:.1f}s")

    rng = np.random.default_rng(1)
    # fake residual target panel (in Macau: latent residuals per compound)
    R = jnp.asarray(rng.standard_normal((A_sp.shape[0], n_latent)), jnp.float32)

    # Jacobi preconditioner: power-law feature degrees make diag(AᵀA)
    # span orders of magnitude — PCG cuts the CG iteration count.
    dinv = fs.normal_jacobi(A_sp, reg=reg)

    @jax.jit
    def gibbs_inner(A, R, dinv, key):
        noise = jax.random.normal(key, (A.shape[1], n_latent)) * 0.01
        rhs = A.rmatmat(R) + noise
        sol = fs.cg_normal(
            A, rhs, reg=reg, tol=1e-5, maxiter=200, precond=dinv
        )
        return sol.x, sol.iters, sol.resnorm

    key = jax.random.key(0)
    V, iters, res = gibbs_inner(A, R, dinv, key)
    jax.block_until_ready(V)

    t0 = time.perf_counter()
    n_samples = 5
    for s in range(n_samples):
        key, sub = jax.random.split(key)
        V, iters, res = gibbs_inner(A, R, dinv, sub)
    jax.block_until_ready(V)
    dt = (time.perf_counter() - t0) / n_samples
    print(
        f"inner solve: {dt*1e3:.1f} ms/sample, pcg_iters={int(iters)}, "
        f"max_res={float(jnp.max(res)):.2e}"
    )

    # sanity vs scipy normal equations
    Rh = np.asarray(R)
    ref = np.linalg.lstsq(
        (A_sp.T @ A_sp + reg * np.eye(A_sp.shape[1])), np.asarray(A.rmatmat(R)),
        rcond=None,
    )[0] if A_sp.shape[1] <= 2000 else None
    print("done")


if __name__ == "__main__":
    main()
