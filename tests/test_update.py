"""Incremental value updates (`fastsparse.update`): same pattern, new
values, across every value-bearing execution format."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import fastsparse as fs
from fastsparse.update import value_updater


def _rand(nrow=300, ncol=200, nnz=2500, seed=0, dtype=np.float32):
    rng = np.random.default_rng(seed)
    r = rng.integers(0, nrow, nnz)
    c = rng.integers(0, ncol, nnz)
    m = sp.coo_matrix((rng.standard_normal(nnz).astype(dtype), (r, c)),
                      shape=(nrow, ncol))
    m.sum_duplicates()
    return m


def _entry_coo(m):
    m = m.tocoo()
    return fs.COO.from_arrays(m.row, m.col, m.data, m.shape)


@pytest.mark.parametrize("fmt", ["ell", "bsr", "coo", "csr", "hybrid"])
def test_update_matches_rebuild(fmt):
    m = _rand()
    coo = _entry_coo(m)
    upd = value_updater(coo, format=fmt, transpose=True)
    rng = np.random.default_rng(1)
    new_vals = rng.standard_normal(coo.n_valid).astype(np.float32)
    op2 = upd.update(new_vals)

    m2 = sp.coo_matrix((new_vals, (m.tocoo().row, m.tocoo().col)), shape=m.shape)
    x = rng.standard_normal(m.shape[1]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op2.matvec(x)), m2 @ x, rtol=2e-5, atol=1e-4
    )
    y = rng.standard_normal(m.shape[0]).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(op2.rmatvec(y)), m2.T @ y, rtol=2e-5, atol=1e-4
    )


def test_update_with_reorder_and_segmentation():
    m = _rand(nrow=800, ncol=600, nnz=6000, seed=2)
    coo = _entry_coo(m)
    upd = value_updater(coo, format="ell-seg", reorder="degree")
    new_vals = np.arange(1, coo.n_valid + 1, dtype=np.float32)
    op2 = upd.update(new_vals)
    m2 = sp.coo_matrix((new_vals, (m.tocoo().row, m.tocoo().col)), shape=m.shape)
    X = np.random.default_rng(3).standard_normal((600, 4)).astype(np.float32)
    # arange values reach ~6000: f32 accumulation-order differences vs
    # scipy's f64 accumulator dominate the error here
    np.testing.assert_allclose(
        np.asarray(op2.matmat(X)), m2 @ X, rtol=5e-4, atol=1e-2
    )


def test_update_custom_build_fn():
    m = _rand(seed=4)
    coo = _entry_coo(m)
    upd = value_updater(coo, build_fn=lambda c: fs.build_ell(c))
    new_vals = np.random.default_rng(5).standard_normal(coo.n_valid).astype(np.float32)
    ell2 = upd.update(new_vals)
    m2 = sp.coo_matrix((new_vals, (m.tocoo().row, m.tocoo().col)), shape=m.shape)
    np.testing.assert_allclose(
        np.asarray(ell2.todense()), m2.toarray(), rtol=1e-6, atol=1e-6
    )


def test_update_f64_exact():
    m = _rand(dtype=np.float64, seed=6)
    coo = _entry_coo(m)
    upd = value_updater(coo, format="ell")
    new_vals = np.random.default_rng(7).standard_normal(coo.n_valid)
    op2 = upd.update(new_vals)
    m2 = sp.coo_matrix((new_vals, (m.tocoo().row, m.tocoo().col)), shape=m.shape)
    x = np.random.default_rng(8).standard_normal(m.shape[1])
    np.testing.assert_allclose(np.asarray(op2.matvec(x)), m2 @ x, rtol=1e-10)


def test_update_inside_scan():
    """Updates are jit/scan-safe: a value sweep entirely on device."""
    m = _rand(nrow=100, ncol=80, nnz=500, seed=9)
    coo = _entry_coo(m)
    upd = value_updater(coo, format="ell", transpose=False)
    x = jnp.ones((80,), jnp.float32)
    base = jnp.asarray(np.asarray(m.tocoo().data))

    def step(carry, scale):
        op = upd.update(base * scale)
        return carry + op.matvec(x), None

    out, _ = jax.lax.scan(step, jnp.zeros((100,)), jnp.arange(1.0, 4.0))
    want = (1.0 + 2.0 + 3.0) * (m @ np.ones(80, np.float32))
    np.testing.assert_allclose(np.asarray(out), want, rtol=2e-5, atol=1e-4)


def test_update_rejects_binary():
    r, c = [0, 1], [1, 0]
    coo = fs.BinaryCOO.from_arrays(r, c, (4, 4))
    with pytest.raises(TypeError):
        value_updater(coo)


def test_update_wrong_length_raises():
    m = _rand(seed=10)
    upd = value_updater(_entry_coo(m), format="ell", transpose=False)
    with pytest.raises(ValueError):
        upd.update(np.zeros(3, np.float32))
