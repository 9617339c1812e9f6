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
    # binary default: int8 panels on mono layouts, bf16 tiles elsewhere
    # (Config.binary_tiles="int8"; both exact for 0/1)
    assert not op.fwd.binary
    assert op.fwd.dtype in (jnp.bfloat16, jnp.int8)
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
    assert out.shape == (12_288, 128)
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
    """Panel-era X-residency policy. Panel kernels fold the fp32-parity
    planes IN-KERNEL on a plain f32 resident X (4 B/element), so all-panel
    binary layouts stay unsegmented up to the f32 cap; only layouts that
    would run the pre-split 3-plane tile kernels (6 B/element) need the
    tighter binary3 cap. Either way every segment's resident X window must
    fit the 12 MB VMEM budget at n_block=128."""
    import scipy.sparse as sp

    from fastsparse.formats.bsr import BsrMatrix
    from fastsparse.formats.segmented import ColSegmented
    from fastsparse.linops import BSR_SEG_COLS_BINARY3, BSR_SEG_COLS_F32

    rng = np.random.default_rng(0)

    def banded_binary(nrow, ncol, per_row=80, spread=2000):
        r = rng.integers(0, nrow, nrow * per_row)
        c = np.clip(
            (r * (ncol // nrow)) + rng.integers(0, spread, r.size),
            0, ncol - 1,
        )
        m = sp.coo_matrix(
            (np.ones(r.size, np.float32), (r, c)), shape=(nrow, ncol)
        )
        m.sum_duplicates()
        m.data[:] = 1.0
        return m

    def assert_resident(fmt):
        """Every piece's resident X window fits 12 MB f32 at n_block=128.

        Mono-panel layouts window X per item (windows replace column
        segmentation entirely): the VMEM-budget invariant is on the
        window, not the matrix width."""
        if getattr(fmt, "is_mono", False):
            b = fmt.buckets[0]
            assert b.win_slabs * fmt.tile_k * 128 * 4 <= 12.5 * 2**20
            return
        pieces = fmt.segments if isinstance(fmt, ColSegmented) else (fmt,)
        for seg in pieces:
            cap = (
                BSR_SEG_COLS_F32
                if getattr(seg, "is_panel", False)
                else BSR_SEG_COLS_BINARY3
            )
            assert seg.shape[1] <= cap
            assert seg.n_slabs * seg.tile_k * 128 * 4 <= 12.5 * 2**20

    # 18000 cols, banded: all-panel layout -> unsegmented at the f32 cap
    # (the old policy split it at 16384; panels make that split pure loss).
    m = banded_binary(512, 18000)
    op = fs.operator(m, format="bsr", transpose=False)
    assert isinstance(op.fwd, BsrMatrix) and op.fwd.is_panel
    assert_resident(op.fwd)
    X = np.asarray(rng.standard_normal((18000, 8)), np.float32)
    ref = (m @ X).astype(np.float64)
    err = np.abs(np.asarray(op.matmat(X)) - ref).max() / np.abs(ref).max()
    # normalized full-output error (the bench.py bar); plain 1e-6 allclose
    # trips on XLA:CPU's fp-contraction of the parity planes (CLAUDE.md)
    assert err < 1e-6, err

    # 30000 cols > f32 cap: mono (windowed X, one launch) or segmented —
    # never an unsegmented full-width class-panel/tile layout.
    m2 = banded_binary(512, 30000)
    op2 = fs.operator(m2, format="bsr", transpose=False)
    assert getattr(op2.fwd, "is_mono", False) or isinstance(
        op2.fwd, ColSegmented
    )
    assert_resident(op2.fwd)
    X2 = np.asarray(rng.standard_normal((30000, 8)), np.float32)
    ref2 = (m2 @ X2).astype(np.float64)
    err2 = np.abs(np.asarray(op2.matmat(X2)) - ref2).max() / np.abs(ref2).max()
    assert err2 < 1e-6, err2

    # the segmented policy is still exercised when mono is gated off
    import dataclasses

    from fastsparse.config import DEFAULT

    op3 = fs.operator(
        m2,
        format="bsr",
        transpose=False,
        config=dataclasses.replace(DEFAULT, bsr_mono="off"),
    )
    assert isinstance(op3.fwd, ColSegmented)
    assert_resident(op3.fwd)
