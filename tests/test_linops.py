"""SparseOperator (dual-tiling) tests vs scipy."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import conftest as C

import fastsparse as fs

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
    op = operator(m)  # auto: binary -> BSR with bf16-exact 0/1 tiles
    import jax.numpy as jnp

    from fastsparse import BsrMatrix

    assert isinstance(op.fwd, BsrMatrix)
    assert not op.fwd.binary and op.fwd.dtype == jnp.bfloat16
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


def test_balanced_seg_cols_respects_caps():
    from fastsparse.linops import (
        BSR_SEG_COLS_BINARY3,
        BSR_SEG_COLS_F32,
        SEG_COLS,
        _balanced_seg_cols,
    )

    # the 2026-08-17 regression: widths above the binary3 cap silently
    # drop the BSR kernel to the streamed strategy — never exceed caps
    for ncol in (16385, 20000, 50000, 65536, 262144, 1_000_000):
        for cap in (BSR_SEG_COLS_BINARY3, BSR_SEG_COLS_F32, SEG_COLS):
            w = _balanced_seg_cols(ncol, cap)
            assert w <= cap
            assert w % 128 == 0
            nseg = -(-ncol // w)
            assert (nseg - 1) * w < ncol  # no empty trailing segment
    assert _balanced_seg_cols(50000, BSR_SEG_COLS_BINARY3) == 12544


def test_binary_bsr_segments_stay_resident():
    """Binary operator on a >16384-col matrix must segment under the
    binary3 cap (3 bf16 X planes = 6 B/element at the 12 MB budget)."""
    import scipy.sparse as sp

    from fastsparse.formats.segmented import ColSegmented
    from fastsparse.linops import BSR_SEG_COLS_BINARY3

    rng = np.random.default_rng(0)
    n = 18000
    r = rng.integers(0, 512, 40000)
    c = np.clip(r * 35 + rng.integers(0, 2000, 40000), 0, n - 1)
    m = sp.coo_matrix((np.ones(r.size, np.float32), (r, c)), shape=(512, n))
    m.sum_duplicates(); m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=False)
    assert isinstance(op.fwd, ColSegmented)
    for seg in op.fwd.segments:
        assert seg.shape[1] <= BSR_SEG_COLS_BINARY3
