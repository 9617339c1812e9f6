"""CG solver tests: the Macau/SMURFF inner solve (SURVEY.md §3.3)."""
import jax.numpy as jnp
import numpy as np

import conftest as C

from fastsparse import operator
from fastsparse.solvers import cg, cg_normal


def test_cg_normal_single_rhs():
    m = C.random_csr(200, 120, 0.08, seed=0, dtype=np.float64)
    op = operator(m, format="ell")
    rng = np.random.default_rng(1)
    b = rng.standard_normal(120)
    res = cg_normal(op, jnp.asarray(b), reg=0.5, tol=1e-12, maxiter=500)
    ref = np.linalg.solve(m.T @ m + 0.5 * np.eye(120), b)
    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=1e-8, atol=1e-8)
    assert int(res.iters) < 500


def test_cg_normal_multi_rhs():
    m = C.powerlaw_csr(256, 100, 3000, seed=2, dtype=np.float64)
    op = operator(m, format="ell")
    rng = np.random.default_rng(3)
    B = rng.standard_normal((100, 8))
    res = cg_normal(op, jnp.asarray(B), reg=1.0, tol=1e-12, maxiter=800)
    ref = np.linalg.solve(m.T @ m + np.eye(100), B)
    np.testing.assert_allclose(np.asarray(res.x), ref, rtol=1e-7, atol=1e-7)


def test_cg_generic_spd():
    rng = np.random.default_rng(4)
    Q = rng.standard_normal((50, 50))
    M = Q @ Q.T + 50 * np.eye(50)
    b = rng.standard_normal(50)
    Mj = jnp.asarray(M)
    res = cg(lambda v: Mj @ v, jnp.asarray(b), tol=1e-12, maxiter=300)
    np.testing.assert_allclose(np.asarray(res.x), np.linalg.solve(M, b), rtol=1e-8)


def test_cg_no_retrace():
    m = C.random_csr(100, 60, 0.1, seed=5, dtype=np.float64)
    op = operator(m, format="ell")
    rng = np.random.default_rng(6)
    r1 = cg_normal(op, jnp.asarray(rng.standard_normal(60)), reg=0.1)
    r2 = cg_normal(op, jnp.asarray(rng.standard_normal(60)), reg=0.2)
    assert r1.x.shape == r2.x.shape
