"""Format construction / conversion / round-trip tests (SURVEY.md §4.2:
round-trips preserve the (row, col, val) multiset; all formats agree)."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import fastsparse as fs
from conftest import adversarial_cases, random_csr


def _entry_set(scipy_mat):
    m = scipy_mat.tocoo()
    return sorted(zip(m.row.tolist(), m.col.tolist(), m.data.tolist()))


@pytest.mark.parametrize("seed", [0, 1])
def test_coo_scipy_roundtrip(seed):
    m = random_csr(64, 48, 0.1, seed)
    coo = fs.coo_from_scipy(m)
    assert _entry_set(coo.to_scipy()) == _entry_set(m)
    np.testing.assert_allclose(np.asarray(coo.todense()), m.toarray())


def test_binary_coo_roundtrip():
    m = random_csr(64, 48, 0.1, 3, binary=True)
    coo = fs.binary_coo_from_scipy(m)
    np.testing.assert_allclose(np.asarray(coo.todense(jnp.float64)), m.toarray())


@pytest.mark.parametrize("binary", [False, True])
def test_to_csr_matches_scipy(binary):
    m = random_csr(100, 80, 0.07, 4, binary=binary)
    coo = fs.binary_coo_from_scipy(m) if binary else fs.coo_from_scipy(m)
    csr = fs.to_csr(coo)
    ms = m.tocsr()
    ms.sum_duplicates()
    ms.sort_indices()
    np.testing.assert_array_equal(np.asarray(csr.row_ptr), ms.indptr)
    got = csr.to_scipy().toarray()
    np.testing.assert_allclose(got, m.toarray())


def test_to_csr_with_padding():
    m = random_csr(32, 32, 0.1, 5)
    coo = fs.coo_from_scipy(m).pad_to(m.nnz + 17)
    csr = fs.to_csr(coo)
    assert csr.n_valid == m.nnz
    assert int(np.asarray(csr.row_ptr)[-1]) == m.nnz
    np.testing.assert_allclose(np.asarray(csr.todense()), m.toarray())


def test_transpose_coo():
    m = random_csr(40, 60, 0.1, 6)
    t = fs.transpose_coo(fs.coo_from_scipy(m))
    assert t.shape == (60, 40)
    np.testing.assert_allclose(np.asarray(t.todense()), m.toarray().T)


@pytest.mark.parametrize("order", ["hilbert", "morton", "row"])
def test_ell_roundtrip_after_reorder(order):
    m = random_csr(120, 90, 0.05, 7)
    coo = fs.sort_coo(fs.coo_from_scipy(m), order)
    ell = fs.build_ell(coo)
    np.testing.assert_allclose(np.asarray(ell.todense()), m.toarray())
    assert ell.nnz == m.nnz
    assert ell.padding_ratio >= 1.0


@pytest.mark.parametrize("name,m", adversarial_cases())
def test_ell_adversarial(name, m):
    ell = fs.build_ell(fs.coo_from_scipy(m))
    np.testing.assert_allclose(np.asarray(ell.todense()), m.toarray())


def test_ell_binary_input():
    m = random_csr(50, 50, 0.1, 8, binary=True)
    ell = fs.build_ell(fs.binary_coo_from_scipy(m), dtype=jnp.float64)
    np.testing.assert_allclose(np.asarray(ell.todense()), m.toarray())


def test_ell_bucket_shapes_are_pow2_and_aligned():
    m = random_csr(200, 200, 0.03, 9)
    ell = fs.build_ell(fs.coo_from_scipy(m))
    allowed = set(fs.DEFAULT.ell_bucket_widths)
    for b in ell.buckets:
        # widths come from the config ladder (denser than pow2 since
        # round 4 — the gather engine is slot-bound, padding is the cost)
        assert b.width in allowed or b.width >= max(allowed)
        assert b.nb % 8 == 0  # kernel 8-row group aligned


def test_bcoo_interop_roundtrip():
    import scipy.sparse as sp
    from jax.experimental import sparse as jsparse

    from fastsparse.formats.convert import from_bcoo, to_bcoo

    m = sp.random(60, 40, density=0.1, random_state=5, dtype=np.float32)
    coo = fs.coo_from_scipy(m.tocoo())
    b = to_bcoo(coo)
    assert isinstance(b, jsparse.BCOO)
    np.testing.assert_allclose(np.asarray(b.todense()), m.toarray(), rtol=1e-6)
    back = from_bcoo(b)
    x = np.random.default_rng(6).standard_normal(40).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fs.spmv(back, x)), m @ x, rtol=2e-5, atol=1e-5
    )
