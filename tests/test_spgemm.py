"""SpGEMM tests vs scipy (BASELINE.json:10 capability)."""
import numpy as np
import pytest
import scipy.sparse as sp

import conftest as C

from fastsparse.ops.spgemm import spgemm, spgemm_info


CASES = [
    (
        "random",
        lambda: (
            C.random_csr(120, 90, 0.06, seed=0, dtype=np.float32),
            C.random_csr(90, 150, 0.06, seed=1, dtype=np.float32),
        ),
    ),
    (
        "powerlaw",
        lambda: (
            C.powerlaw_csr(200, 160, 2500, seed=2, dtype=np.float32),
            C.powerlaw_csr(160, 140, 2500, seed=3, dtype=np.float32),
        ),
    ),
    (
        "square",
        lambda: (
            C.random_csr(128, 128, 0.05, seed=4, dtype=np.float32),
            C.random_csr(128, 128, 0.05, seed=5, dtype=np.float32),
        ),
    ),
    (
        "empty",
        lambda: (
            sp.csr_matrix((64, 32), dtype=np.float32),
            sp.csr_matrix((32, 48), dtype=np.float32),
        ),
    ),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_spgemm_oracle(name, make):
    A, B = make()
    C_out, info = spgemm(A, B)
    ref = (A @ B).toarray()
    got = np.asarray(C_out.todense())
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert info["nnz"] == int((np.abs(ref) > 0).sum())
    assert info["est_nnz"] >= info["nnz"]


def test_estimation_is_fused_upper_bound():
    A = C.random_csr(100, 80, 0.05, seed=7, dtype=np.float32)
    B = C.random_csr(80, 100, 0.05, seed=8, dtype=np.float32)
    info = spgemm_info(A, B)
    exact = (A @ B).nnz
    assert info["est_nnz"] >= exact
    assert info["n_pairs"] > 0


def test_mismatched_dims():
    A = C.random_csr(10, 20, 0.1, seed=9)
    B = C.random_csr(30, 10, 0.1, seed=10)
    with pytest.raises(ValueError):
        spgemm(A, B)


def test_spgemm_bsr_output():
    import numpy as np

    A = C.random_csr(120, 90, 0.06, seed=20, dtype=np.float32)
    B = C.random_csr(90, 140, 0.06, seed=21, dtype=np.float32)
    Cb, info = spgemm(A, B, out_format="bsr")
    from fastsparse import BsrMatrix

    assert isinstance(Cb, BsrMatrix)
    ref = (A @ B).toarray()
    np.testing.assert_allclose(np.asarray(Cb.todense()), ref, rtol=1e-5, atol=1e-5)
    # usable directly for further products
    from fastsparse import spmm

    X = np.random.default_rng(22).standard_normal((140, 8)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(spmm(Cb, X)), ref @ X, rtol=1e-4, atol=1e-4)


def test_spgemm_device_matches_scipy():
    from fastsparse.ops.spgemm import spgemm_device

    rng = np.random.default_rng(11)
    A = sp.random(200, 150, density=0.05, random_state=1, dtype=np.float32)
    B = sp.random(150, 180, density=0.05, random_state=2, dtype=np.float32)
    C_tiles, uo_key, info = spgemm_device(A, B)
    assert info["n_pairs"] > 0
    assert info["est_nnz"] >= (A @ B).nnz

    # densify the tile output and compare
    TM, TK = 8, 128
    n_jslabs = info["n_jslabs"]
    ma, nb = info["shape"]
    dense = np.zeros((-(-ma // TM) * TM, n_jslabs * TK), np.float32)
    keys = np.asarray(uo_key)
    tiles = np.asarray(C_tiles)
    for t, k in enumerate(keys):
        if k == np.iinfo(np.int32).max:
            continue
        s, j = divmod(int(k), n_jslabs)
        dense[s * TM:(s + 1) * TM, j * TK:(j + 1) * TK] += tiles[t]
    want = (A @ B).toarray()
    np.testing.assert_allclose(dense[:ma, :nb], want, rtol=1e-5, atol=1e-5)


def test_spgemm_device_caps_reuse_and_overflow():
    from fastsparse.ops.spgemm import spgemm_device

    A = sp.random(100, 100, density=0.05, random_state=3, dtype=np.float32)
    B = sp.random(100, 100, density=0.05, random_state=4, dtype=np.float32)
    _, _, info = spgemm_device(A, B)
    # same structural class: explicit caps skip the host dry pass
    C_tiles, uo_key, info2 = spgemm_device(A, B, caps=info["caps"])
    assert info2["n_pairs"] == info["n_pairs"]
    with pytest.raises(ValueError, match="overflow"):
        spgemm_device(A, B, caps={"tiles_a": 4, "tiles_b": 4,
                                  "pairs": 4, "out_tiles": 4})


def test_spgemm_device_coo_compaction():
    from fastsparse.ops.spgemm import spgemm_device

    A = sp.random(180, 140, density=0.04, random_state=7, dtype=np.float32)
    B = sp.random(140, 160, density=0.04, random_state=8, dtype=np.float32)
    C, info = spgemm_device(A, B, out_format="coo")
    want = (A @ B).tocoo()
    assert info["nnz"] == want.nnz
    got = sp.coo_matrix(
        (
            np.asarray(C.vals)[: C.n_valid],
            (np.asarray(C.rows)[: C.n_valid], np.asarray(C.cols)[: C.n_valid]),
        ),
        shape=C.shape,
    )
    np.testing.assert_allclose(
        got.toarray(), want.toarray(), rtol=1e-5, atol=1e-6
    )
    # padding tail is all-zero values
    assert (np.asarray(C.vals)[C.n_valid:] == 0).all()


# ----------------------------------------------------------------------------
# ESC (expand-sort-compress) path — the default for COO output.
# ----------------------------------------------------------------------------

@pytest.mark.parametrize("name", [c[0] for c in CASES])
def test_spgemm_esc_matches_scipy(name):
    from fastsparse.ops.spgemm import spgemm_esc

    A, B = dict(CASES)[name]()
    C_out, info = spgemm_esc(A, B)
    ref = (A @ B).tocsr()
    assert info["nnz"] == ref.nnz  # structural nnz is exact
    assert info["est_nnz"] == ref.nnz  # fused estimation is exact for ESC
    got = C_out.to_scipy().tocsr()
    np.testing.assert_allclose(
        got.toarray(), ref.toarray(), rtol=1e-5, atol=1e-6
    )


def test_spgemm_esc_row_blocking_matches_single_shot():
    from fastsparse.ops.spgemm import spgemm_esc

    A = C.random_csr(300, 200, 0.05, seed=11, dtype=np.float32)
    B = C.random_csr(200, 250, 0.05, seed=12, dtype=np.float32)
    C1, i1 = spgemm_esc(A, B)
    C2, i2 = spgemm_esc(A, B, p_cap=512)  # forces many row blocks
    assert i2["n_blocks"] > 1
    assert i1["nnz"] == i2["nnz"]
    np.testing.assert_allclose(
        C1.to_scipy().toarray(), C2.to_scipy().toarray(), rtol=1e-6
    )


def test_spgemm_esc_empty_and_duplicates():
    from fastsparse.formats.coo import COO
    from fastsparse.ops.spgemm import spgemm_esc

    # empty product
    C0, i0 = spgemm_esc(sp.csr_matrix((40, 30)), sp.csr_matrix((30, 20)))
    assert i0["nnz"] == 0 and C0.shape == (40, 20)
    # duplicate COO input entries must sum before multiplying
    rows = np.array([0, 0, 1], np.int64)
    cols = np.array([1, 1, 0], np.int64)
    vals = np.array([2.0, 3.0, 4.0], np.float32)
    A = COO.from_arrays(rows, cols, vals, (2, 2))
    B = sp.csr_matrix(np.array([[1.0, 2.0], [3.0, 4.0]], np.float32))
    C1, _ = spgemm_esc(A, B)
    want = np.array([[15.0, 20.0], [4.0, 8.0]])
    np.testing.assert_allclose(C1.to_scipy().toarray(), want, rtol=1e-6)


def test_spgemm_default_method_is_esc():
    A = C.random_csr(100, 80, 0.05, seed=21, dtype=np.float32)
    B = C.random_csr(80, 90, 0.05, seed=22, dtype=np.float32)
    C_out, info = spgemm(A, B)
    assert "n_products" in info  # esc path ran
    ref = (A @ B).tocsr()
    assert info["nnz"] == ref.nnz
    # tile path still reachable
    C2, info2 = spgemm(A, B, method="tiles")
    assert "n_pairs" in info2
    np.testing.assert_allclose(
        C_out.to_scipy().toarray(), C2.to_scipy().toarray(),
        rtol=1e-4, atol=1e-5,
    )


def test_spgemm_esc_wide_dims_unpacked_keys():
    """ncol > 2^16 disables the packed 16:16 sort key — covers the
    (hi, lo) two-key sort and 4-operand compaction sort path."""
    from fastsparse.ops.spgemm import spgemm_esc

    rng = np.random.default_rng(21)
    A = sp.coo_matrix(
        (
            rng.standard_normal(500).astype(np.float32),
            (rng.integers(0, 80, 500), rng.integers(0, 300, 500)),
        ),
        shape=(80, 300),
    ).tocsr()
    B = sp.coo_matrix(
        (
            rng.standard_normal(900).astype(np.float32),
            (rng.integers(0, 300, 900), rng.integers(0, 70_000, 900)),
        ),
        shape=(300, 70_000),
    ).tocsr()
    C_out, info = spgemm_esc(A, B)
    ref = (A @ B).tocsr()
    assert info["nnz"] == ref.nnz
    got = C_out.to_scipy().tocsr()
    d = np.abs(got - ref)
    rel = float(d.max() / (np.abs(ref).max() + 1e-30)) if d.nnz else 0.0
    assert rel < 1e-5


def test_spgemm_esc_same_operand_squared():
    """A @ A with the SAME object: the symmetric prep (one sort) path."""
    from fastsparse.ops.spgemm import spgemm_esc
    import fastsparse as fs

    A = C.random_csr(250, 250, 0.04, seed=31, dtype=np.float32)
    A_dev = fs.coo_from_scipy(A.tocoo(), dtype=np.float32)
    C_out, info = spgemm_esc(A_dev, A_dev)
    ref = (A @ A).tocsr()
    assert info["nnz"] == ref.nnz
    got = C_out.to_scipy().tocsr()
    d = np.abs(got - ref)
    rel = float(d.max() / (np.abs(ref).max() + 1e-30)) if d.nnz else 0.0
    assert rel < 1e-5
