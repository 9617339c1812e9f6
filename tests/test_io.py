"""I/O round-trip tests (SBM/SDM raw binary, MatrixMarket, npz cache)."""
import numpy as np
import pytest

import conftest as C

from fastsparse import build_bsr, build_ell, coo_from_scipy, binary_coo_from_scipy
from fastsparse.io import (
    load_npz,
    read_mtx,
    read_sbm,
    read_sdm,
    save_npz,
    write_mtx,
    write_sbm,
    write_sdm,
)


def test_sbm_roundtrip(tmp_path):
    m = C.random_csr(60, 50, 0.1, seed=0, binary=True)
    coo = binary_coo_from_scipy(m)
    p = tmp_path / "a.sbm"
    write_sbm(p, coo)
    back = read_sbm(p)
    assert back.shape == coo.shape
    assert (back.to_scipy() != m).nnz == 0


def test_sdm_roundtrip(tmp_path):
    m = C.random_csr(60, 50, 0.1, seed=1, dtype=np.float64)
    coo = coo_from_scipy(m)
    p = tmp_path / "a.sdm"
    write_sdm(p, coo)
    back = read_sdm(p)
    np.testing.assert_allclose(
        np.asarray(back.todense()), m.toarray(), rtol=1e-15
    )


def test_mtx_roundtrip(tmp_path):
    m = C.random_csr(40, 30, 0.1, seed=2, dtype=np.float64)
    coo = coo_from_scipy(m)
    p = tmp_path / "a.mtx"
    write_mtx(p, coo)
    back = read_mtx(p)
    np.testing.assert_allclose(
        np.asarray(back.todense()), m.toarray(), rtol=1e-12
    )


def test_npz_cache_formats(tmp_path):
    m = C.powerlaw_csr(128, 96, 1500, seed=3, dtype=np.float32)
    for build in (build_ell, build_bsr):
        A = build(coo_from_scipy(m, dtype=np.float32))
        p = tmp_path / "fmt.npz"
        save_npz(p, A)
        B = load_npz(p)
        assert type(B) is type(A)
        np.testing.assert_allclose(
            np.asarray(B.todense()), np.asarray(A.todense()), rtol=1e-6
        )
