"""I/O round-trip tests (SBM/SDM raw binary, MatrixMarket, npz cache)."""
import jax
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


def test_native_mtx_parser(tmp_path):
    """Native C++ parser vs scipy on general/pattern/symmetric files."""
    import scipy.sparse as sp
    from scipy.io import mmwrite

    from fastsparse.io.native import read_mtx_native

    rng = np.random.default_rng(0)
    m = sp.random(80, 60, density=0.1, random_state=rng, format="coo")
    p = tmp_path / "g.mtx"
    mmwrite(p, m)
    out = read_mtx_native(p)
    if out is None:
        import pytest

        pytest.skip("no native compiler available")
    rows, cols, vals, shape, sym = out
    ref = sp.coo_matrix((vals, (rows, cols)), shape=shape)
    assert (ref.tocsr() != m.tocsr()).nnz == 0

    # symmetric
    s = m.tocsr()[:60, :60]
    s = s + s.T
    p2 = tmp_path / "s.mtx"
    mmwrite(p2, s.tocoo(), symmetry="symmetric")
    out2 = read_mtx_native(p2)
    rows, cols, vals, shape, sym = out2
    assert sym
    ref2 = sp.coo_matrix((vals, (rows, cols)), shape=shape)
    ref2.sum_duplicates()
    d = (ref2.tocsr() - s.tocsr())
    assert abs(d).max() < 1e-12

    # wrapper dispatch
    back = read_mtx(p)
    np.testing.assert_allclose(
        np.asarray(back.todense()), m.toarray(), rtol=1e-12
    )


def test_npz_cache_all_formats(tmp_path):
    """Every execution format (incl. nested/segmented/operator pytrees)
    round-trips through the npz cache."""
    import fastsparse as fs

    m = C.powerlaw_csr(96, 200, 1200, seed=9, dtype=np.float32)
    coo = coo_from_scipy(m, dtype=np.float32)
    objs = {
        "hybrid": fs.build_hybrid(coo, threshold=8),
        "seg_ell": fs.build_ell_segmented(coo, seg_cols=64),
        "seg_bsr": fs.build_bsr_segmented(coo, seg_cols=64),
        "operator": fs.operator(m, format="bsr", dtype=np.float32),
    }
    x = np.random.default_rng(10).standard_normal(200).astype(np.float32)
    for name, A in objs.items():
        p = tmp_path / f"{name}.npz"
        save_npz(p, A)
        B = load_npz(p)
        assert type(B) is type(A)
        if name == "operator":
            np.testing.assert_allclose(
                np.asarray(B.matvec(x)), np.asarray(A.matvec(x)), rtol=1e-6
            )
        else:
            np.testing.assert_allclose(
                np.asarray(B.todense()), np.asarray(A.todense()), rtol=1e-6
            )


def test_bf16_tiles():
    import jax.numpy as jnp
    import fastsparse as fs

    m = C.random_csr(128, 160, 0.08, seed=11, dtype=np.float32)
    A = fs.build_bsr(coo_from_scipy(m, dtype=np.float32), dtype=jnp.bfloat16)
    X = np.random.default_rng(12).standard_normal((160, 16)).astype(np.float32)
    Y = np.asarray(fs.spmm(A, X))
    # bf16 tile values: ~8-bit mantissa accuracy
    np.testing.assert_allclose(Y, m @ X, rtol=2e-2, atol=2e-2)


def test_sharded_npz_roundtrip(tmp_path):
    import scipy.sparse as sp
    from fastsparse.io import load_npz_sharded, save_npz_sharded
    from fastsparse.parallel import partition_rows

    rng = np.random.default_rng(0)
    m = sp.random(64, 48, density=0.1, random_state=1, dtype=np.float32)
    part = partition_rows(m, 4)
    prefix = str(tmp_path / "ckpt")
    save_npz_sharded(prefix, part)

    back = load_npz_sharded(prefix)
    got = jax.tree.leaves(back)
    want = jax.tree.leaves(part)
    assert len(got) == len(want)
    for g, w in zip(got, want):
        np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
    assert back.n_shards == part.n_shards
    assert back.shape == part.shape


def test_sharded_npz_subset_load(tmp_path):
    import scipy.sparse as sp
    from fastsparse.io import load_npz_sharded, save_npz_sharded
    from fastsparse.parallel import partition_rows

    m = sp.random(64, 48, density=0.1, random_state=2, dtype=np.float32)
    part = partition_rows(m, 4)
    prefix = str(tmp_path / "ckpt")
    save_npz_sharded(prefix, part)

    one = load_npz_sharded(prefix, shards=2)
    np.testing.assert_array_equal(
        np.asarray(one.local.rows)[0], np.asarray(part.local.rows)[2]
    )
    assert np.asarray(one.local.rows).shape[0] == 1
