"""Hybrid (dense-tile BSR + gather ELL) format tests."""
import numpy as np
import pytest

import conftest as C

import fastsparse as fs
from fastsparse.bench.matrices import banded, ecfp_like
from fastsparse.formats.hybrid import build_hybrid, dense_tile_fraction


def test_split_roundtrip_valued():
    m = banded(1024, 96, seed=0) + C.random_csr(1024, 1024, 0.002, seed=1, dtype=np.float32)
    m = m.tocsr().astype(np.float32)
    H = build_hybrid(fs.coo_from_scipy(m, dtype=np.float32), threshold=32)
    assert H.dense is not None and H.sparse is not None
    assert 0 < H.dense_fraction < 1
    np.testing.assert_allclose(np.asarray(H.todense()), m.toarray(), rtol=1e-5, atol=1e-5)


def test_hybrid_spmm_spmv():
    m = banded(512, 64, seed=2) + C.random_csr(512, 512, 0.004, seed=3, dtype=np.float32)
    m = m.tocsr().astype(np.float32)
    H = build_hybrid(fs.coo_from_scipy(m, dtype=np.float32), threshold=32)
    rng = np.random.default_rng(4)
    X = rng.standard_normal((512, 16)).astype(np.float32)
    ref = m @ X
    scale = max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(np.asarray(fs.spmm(H, X)), ref, rtol=2e-5, atol=2e-6 * scale)
    x = rng.standard_normal(512).astype(np.float32)
    refv = m @ x
    scv = max(float(np.abs(refv).max()), 1.0)
    np.testing.assert_allclose(np.asarray(fs.spmv(H, x)), refv, rtol=2e-5, atol=2e-6 * scv)


def test_hybrid_binary():
    m = ecfp_like(400, 600, bits_per_compound=48, n_scaffolds=8, seed=5)
    H = build_hybrid(fs.binary_coo_from_scipy(m), threshold=16)
    X = np.random.default_rng(6).standard_normal((600, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fs.spmm(H, X)), m @ X, rtol=2e-5, atol=1e-4)


def test_operator_hybrid_format():
    m = banded(512, 64, seed=7) + C.random_csr(512, 512, 0.004, seed=8, dtype=np.float32)
    m = m.tocsr().astype(np.float32)
    op = fs.operator(m, format="hybrid", dtype=np.float32)
    x = np.random.default_rng(9).standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), m @ x, rtol=2e-4, atol=2e-4)
    y = np.random.default_rng(10).standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)), m.T @ y, rtol=2e-4, atol=2e-4)


def test_dense_tile_fraction_bounds():
    m = C.random_csr(256, 256, 0.01, seed=11, dtype=np.float32)
    f = dense_tile_fraction(fs.coo_from_scipy(m, dtype=np.float32))
    assert 0.0 <= f <= 1.0


def test_integration_macau_loop():
    """End-to-end auto pipeline + CG on a clustered binary matrix (the
    Macau/SMURFF inner loop, SURVEY.md §3.3) — integration test."""
    import jax
    import jax.numpy as jnp
    import fastsparse as fs

    m = ecfp_like(500, 300, bits_per_compound=24, n_scaffolds=10, seed=20)
    op = fs.operator(m, reorder="auto")
    rng = np.random.default_rng(21)
    R = jnp.asarray(rng.standard_normal((500, 8)), jnp.float32)

    @jax.jit
    def inner(op, R):
        rhs = op.rmatmat(R)
        sol = fs.cg_normal(op, rhs, reg=2.0, tol=1e-6, maxiter=200)
        return sol.x, sol.iters

    V, iters = inner(op, R)
    # verify against dense solve
    A = m.toarray()
    ref = np.linalg.solve(A.T @ A + 2.0 * np.eye(300), A.T @ np.asarray(R))
    np.testing.assert_allclose(np.asarray(V), ref, rtol=5e-3, atol=5e-3)
    assert int(iters) < 200
