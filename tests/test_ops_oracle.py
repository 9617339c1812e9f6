"""Kernel-vs-scipy oracle tests (SURVEY.md §4.1, N5): every kernel against
scipy.sparse on random + power-law + adversarial matrices, fp64 rtol 1e-10
and fp32 rtol 1e-6 (BASELINE.json:5)."""
import jax.numpy as jnp
import numpy as np
import pytest

import fastsparse as fs
from conftest import adversarial_cases, powerlaw_csr, random_csr

RTOL = {np.float32: 1e-6, np.float64: 1e-10}


def _formats(m, dtype):
    coo = fs.coo_from_scipy(m, dtype=dtype)
    yield "coo", coo
    yield "csr", fs.to_csr(coo)
    yield "ell", fs.build_ell(coo)
    yield "ell_hilbert", fs.build_ell(fs.sort_coo(coo, "hilbert"))


def _check(got, want, dtype):
    rtol = RTOL[np.dtype(dtype).type]
    atol = rtol * max(1.0, float(np.abs(want).max()) if want.size else 1.0)
    np.testing.assert_allclose(np.asarray(got), want, rtol=rtol, atol=atol)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize(
    "mat_name,m",
    [("random", random_csr(200, 160, 0.05, 10)),
     ("powerlaw", powerlaw_csr(300, 250, 4000, 11))],
)
def test_spmv_oracle(dtype, mat_name, m):
    m = m.astype(dtype)
    rng = np.random.default_rng(42)
    x = rng.standard_normal(m.shape[1]).astype(dtype)
    want = m @ x
    for name, A in _formats(m, dtype):
        _check(fs.spmv(A, jnp.asarray(x)), want, dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_spmv_t_oracle(dtype):
    m = random_csr(150, 220, 0.04, 12).astype(dtype)
    rng = np.random.default_rng(43)
    x = rng.standard_normal(m.shape[0]).astype(dtype)
    want = m.T @ x
    for name, A in _formats(m, dtype):
        _check(fs.spmv_t(A, jnp.asarray(x)), want, dtype)


@pytest.mark.parametrize("name,m", adversarial_cases())
def test_spmv_adversarial(name, m):
    m = m.astype(np.float64)
    x = np.linspace(-1, 1, m.shape[1])
    want = m @ x
    for fname, A in _formats(m, np.float64):
        _check(fs.spmv(A, jnp.asarray(x)), want, np.float64)
    xt = np.linspace(-1, 1, m.shape[0])
    for fname, A in _formats(m, np.float64):
        _check(fs.spmv_t(A, jnp.asarray(xt)), m.T @ xt, np.float64)


def test_spmv_binary_formats():
    m = random_csr(100, 90, 0.08, 13, binary=True)
    x = np.random.default_rng(3).standard_normal(90)
    want = m @ x
    bcoo = fs.binary_coo_from_scipy(m)
    bcsr = fs.to_csr(bcoo)
    _check(fs.spmv(bcoo, jnp.asarray(x)), want, np.float64)
    _check(fs.spmv(bcsr, jnp.asarray(x)), want, np.float64)
    xt = np.random.default_rng(4).standard_normal(100)
    _check(fs.spmv_t(bcoo, jnp.asarray(xt)), m.T @ xt, np.float64)
    _check(fs.spmv_t(bcsr, jnp.asarray(xt)), m.T @ xt, np.float64)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("ncols", [2, 4, 32])
def test_spmm_oracle(dtype, ncols):
    """Multi-RHS SpMM — the reference's bcsr_A_mul_B2/4/n (SURVEY.md §3.3)."""
    m = random_csr(180, 140, 0.05, 14).astype(dtype)
    X = np.random.default_rng(5).standard_normal((140, ncols)).astype(dtype)
    want = m @ X
    for name, A in _formats(m, dtype):
        _check(fs.spmm(A, jnp.asarray(X)), want, dtype)
    Xt = np.random.default_rng(6).standard_normal((180, ncols)).astype(dtype)
    want_t = m.T @ Xt
    for name, A in _formats(m, dtype):
        _check(fs.spmm_t(A, jnp.asarray(Xt)), want_t, dtype)


@pytest.mark.parametrize("dtype", [np.float32, np.float64])
def test_ata_oracle(dtype):
    """Normal equations (A'A+reg)x — the reference's bcsr_AA_mul_B."""
    m = random_csr(120, 100, 0.06, 15).astype(dtype)
    x = np.random.default_rng(7).standard_normal(100).astype(dtype)
    reg = 0.5
    want = m.T @ (m @ x) + reg * x
    coo = fs.coo_from_scipy(m, dtype=dtype)
    A = fs.build_ell(coo)
    At = fs.build_ell(fs.transpose_coo(coo))
    _check(fs.ata_x(A, jnp.asarray(x), At=At, reg=reg), want, dtype)
    _check(fs.ata_x(A, jnp.asarray(x), reg=reg), want, dtype)  # scatter path
    X = np.random.default_rng(8).standard_normal((100, 8)).astype(dtype)
    wantX = m.T @ (m @ X) + reg * X
    _check(fs.ata_X(A, jnp.asarray(X), At=At, reg=reg), wantX, dtype)


def test_property_transpose_consistency():
    """<Ax, y> == <x, A'y> (SURVEY.md §4.4)."""
    m = random_csr(90, 110, 0.07, 16)
    rng = np.random.default_rng(9)
    x = rng.standard_normal(110)
    y = rng.standard_normal(90)
    A = fs.build_ell(fs.coo_from_scipy(m))
    lhs = float(jnp.dot(fs.spmv(A, x), jnp.asarray(y)))
    rhs = float(jnp.dot(jnp.asarray(x), fs.spmv_t(A, y)))
    assert abs(lhs - rhs) < 1e-9 * max(1.0, abs(lhs))


def test_property_linearity():
    m = random_csr(60, 70, 0.1, 17)
    A = fs.to_csr(fs.coo_from_scipy(m))
    rng = np.random.default_rng(10)
    x1 = rng.standard_normal(70)
    x2 = rng.standard_normal(70)
    lhs = fs.spmv(A, jnp.asarray(2.0 * x1 + 3.0 * x2))
    rhs = 2.0 * fs.spmv(A, jnp.asarray(x1)) + 3.0 * fs.spmv(A, jnp.asarray(x2))
    np.testing.assert_allclose(np.asarray(lhs), np.asarray(rhs), rtol=1e-10, atol=1e-12)


def test_ata_helpers():
    """ops.ata convenience functions (reference bcsr_AA_mul_B parity)."""
    import fastsparse as fs

    m = random_csr(120, 90, 0.08, seed=51)
    coo = fs.coo_from_scipy(m)
    x = np.random.default_rng(52).standard_normal(90)
    y = np.random.default_rng(53).standard_normal(120)
    np.testing.assert_allclose(
        np.asarray(fs.ata_x(coo, x, reg=0.5)),
        m.T @ (m @ x) + 0.5 * x, rtol=1e-10
    )
    X = np.random.default_rng(54).standard_normal((90, 4))
    np.testing.assert_allclose(
        np.asarray(fs.ata_X(coo, X, reg=0.25)),
        m.T @ (m @ X) + 0.25 * X, rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(fs.aat_x(coo, y, reg=0.1)),
        m @ (m.T @ y) + 0.1 * y, rtol=1e-10
    )
