"""SparseOperator (dual-tiling) tests vs scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest as C

from fastsparse import operator


@pytest.fixture(scope="module")
def prob():
    m = C.powerlaw_csr(300, 240, 4000, seed=21, dtype=np.float32)
    return m


@pytest.mark.parametrize("fmt", ["bsr", "ell", "coo"])
def test_matvec_rmatvec(prob, fmt):
    m = prob
    op = operator(m, format=fmt, dtype=np.float32)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(240).astype(np.float32)
    y = rng.standard_normal(300).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), m @ x, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(op.rmatvec(y)), m.T @ y, rtol=2e-5, atol=2e-5
    )


def test_matmat_normal(prob):
    m = prob
    op = operator(m, format="bsr", dtype=np.float32)
    rng = np.random.default_rng(1)
    X = rng.standard_normal((240, 32)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.matmat(X)), m @ X, rtol=2e-5, atol=2e-5)
    ref = m.T @ (m @ X) + 0.3 * X
    np.testing.assert_allclose(
        np.asarray(op.normal_matmat(X, reg=0.3)), ref, rtol=2e-4, atol=2e-4
    )


def test_binary_auto(prob):
    m = prob.copy()
    m.data[:] = 1.0
    op = operator(m)  # auto: binary -> bitmask BSR
    from fastsparse import BsrMatrix

    assert isinstance(op.fwd, BsrMatrix) and op.fwd.binary
    x = np.random.default_rng(2).standard_normal(240).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), m @ x, rtol=2e-5, atol=2e-5)


def test_fp64_auto_ell(prob):
    m = prob.astype(np.float64)
    op = operator(m)
    from fastsparse import EllMatrix

    assert isinstance(op.fwd, EllMatrix)
    x = np.random.default_rng(3).standard_normal(240)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), m @ x, rtol=1e-10)
    y = np.random.default_rng(4).standard_normal(300)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)), m.T @ y, rtol=1e-10)


def test_transpose_property(prob):
    op = operator(prob, format="bsr", dtype=np.float32)
    x = np.random.default_rng(5).standard_normal(300).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op.T.matvec(x)), prob.T @ x, rtol=2e-5, atol=2e-5
    )


def test_jit_through_operator(prob):
    op = operator(prob, format="bsr", dtype=np.float32)
    X = np.random.default_rng(6).standard_normal((240, 16)).astype(np.float32)

    @jax.jit
    def f(op, X):
        return op.normal_matmat(X, reg=0.1)

    out = f(op, jnp.asarray(X))
    ref = prob.T @ (prob @ X) + 0.1 * X
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-4, atol=2e-4)


def test_graft_entry():
    import sys, pathlib

    sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1536, 128)
    ge.dryrun_multichip(8)
