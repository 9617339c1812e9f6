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


def test_dense_cols_extraction_parity():
    """High-degree columns of a binary matrix move into the DenseCols
    block (round 5); products and todense match the oracle; validate()
    accepts the result."""
    import numpy as np
    import scipy.sparse as sp

    import fastsparse as fs
    from fastsparse.bench import model as bmodel
    from fastsparse.formats.hybrid import build_hybrid
    from fastsparse.utils.debug import validate

    rng = np.random.default_rng(60)
    n = 512
    # a few very dense columns + scattered tail
    hot = rng.integers(0, 8, 4000)  # columns 0..7 get ~500 entries each
    r1 = rng.integers(0, n, 4000)
    r2 = rng.integers(0, n, 3000)
    c2 = rng.integers(8, n, 3000)
    m = sp.coo_matrix(
        (np.ones(7000, np.float32),
         (np.concatenate([r1, r2]), np.concatenate([hot, c2]))),
        shape=(n, n),
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    m = m.tocsr()
    coo = fs.binary_coo_from_scipy(m.tocoo())
    # force extraction at test scale (the production breakeven constant
    # targets 65k-row matrices)
    orig_min_d = bmodel.DENSE_COL_MIN_D
    orig_cell = bmodel.DENSE_COL_CELL_S
    orig_rows = bmodel.DENSE_COL_MIN_ROWS
    bmodel.DENSE_COL_MIN_D = 4
    bmodel.DENSE_COL_CELL_S = 2.0e-10  # d* = 512*2e-10/2e-9 ~ 51
    bmodel.DENSE_COL_MIN_ROWS = 64
    try:
        H = build_hybrid(coo)
    finally:
        bmodel.DENSE_COL_MIN_D = orig_min_d
        bmodel.DENSE_COL_CELL_S = orig_cell
        bmodel.DENSE_COL_MIN_ROWS = orig_rows
    assert H.dense_cols is not None
    assert H.dense_cols.col_ids.shape[0] >= 4
    assert H.nnz == m.nnz
    validate(H)
    np.testing.assert_allclose(
        np.asarray(H.todense()), m.toarray(), rtol=1e-6, atol=1e-6
    )
    X = rng.standard_normal((n, 16)).astype(np.float32)
    from fastsparse.ops.spmm import spmm
    from fastsparse.ops.spmv import spmv

    Y = np.asarray(spmm(H, X))
    ref = (m @ X.astype(np.float64))
    rel = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
    assert rel < 1e-6, rel
    y = np.asarray(spmv(H, X[:, 0]))
    refv = m @ X[:, 0].astype(np.float64)
    assert np.abs(y - refv).max() / np.abs(refv).max() < 1e-6


def test_dense_cols_bf16_fallback_and_default_precision():
    import numpy as np

    import jax.numpy as jnp
    from fastsparse.formats.hybrid import DenseCols
    from fastsparse.ops.spmm import dense_cols_spmm

    rng = np.random.default_rng(61)
    blk = (rng.random((64, 8)) < 0.3).astype(np.int8)
    dc = DenseCols(
        col_ids=jnp.arange(8, dtype=jnp.int32),
        block=jnp.asarray(blk),
        shape=(64, 100),
        nnz=int(blk.sum()),
    )
    X = rng.standard_normal((100, 4)).astype(np.float32)
    ref = blk.astype(np.float64) @ X[:8].astype(np.float64)
    for prec in ("highest", "default"):
        Y = np.asarray(dense_cols_spmm(dc, jnp.asarray(X), precision=prec))
        rel = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
        bar = 1e-6 if prec == "highest" else 1e-2
        assert rel < bar, (prec, rel)
