"""CG solver tests: the Macau/SMURFF inner solve (SURVEY.md §3.3)."""
import jax.numpy as jnp
import numpy as np

import conftest as C

import fastsparse as fs

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


def test_pcg_normal_jacobi_fewer_iters():
    from fastsparse.solvers.cg import normal_jacobi

    # power-law columns: wildly varying normal-equation diagonal
    m = C.powerlaw_csr(3000, 800, 40000, seed=20, dtype=np.float64)
    op = fs.operator(m, format="ell", transpose=True)
    rng = np.random.default_rng(21)
    b = rng.standard_normal(800)
    reg = 1e-3
    plain = fs.cg_normal(op, b, reg=reg, tol=1e-10, maxiter=4000)
    dinv = normal_jacobi(m, reg=reg)
    pcg = fs.cg_normal(op, b, reg=reg, tol=1e-10, maxiter=4000, precond=dinv)
    want = np.linalg.solve(
        (m.T @ m).toarray() + reg * np.eye(800), b
    )
    np.testing.assert_allclose(np.asarray(pcg.x), want, rtol=1e-6, atol=1e-8)
    assert int(pcg.iters) < int(plain.iters)


def test_pcg_multi_rhs():
    from fastsparse.solvers.cg import normal_jacobi

    m = C.powerlaw_csr(1500, 400, 15000, seed=22, dtype=np.float64)
    op = fs.operator(m, format="ell", transpose=True)
    B = np.random.default_rng(23).standard_normal((400, 3))
    reg = 1e-2
    dinv = normal_jacobi(m, reg=reg)
    res = fs.cg_normal(op, B, reg=reg, tol=1e-10, maxiter=3000, precond=dinv)
    want = np.linalg.solve((m.T @ m).toarray() + reg * np.eye(400), B)
    np.testing.assert_allclose(np.asarray(res.x), want, rtol=1e-6, atol=1e-8)
