"""Gather-plan Y assembly (`ops.assemble`): the plan must reproduce the
scatter-add result exactly for every slot-layout shape (unsegmented,
segmented, chunked, SMEM-path buckets, valued and unit)."""
import numpy as np
import pytest
import scipy.sparse as sp

import conftest as C

import fastsparse as fs
import fastsparse.ops.assemble as asm
import fastsparse.ops.ell_ops as eo
from fastsparse.formats.ell import SegmentedEll, build_ell, build_ell_segmented


def _slot_contribs(A, X):
    """Per part-slot contribution rows, computed with numpy over the SAME
    shared layout (`ops.ell_ops._seg_layout`) the compute path uses."""
    segs = (
        list(zip(A.col_offsets, A.segments))
        if isinstance(A, SegmentedEll)
        else [(0, A)]
    )
    parts = []
    for off, seg in segs:
        unit = getattr(seg, "unit_vals", False)
        sentinel = seg.shape[1]
        Xs = np.zeros((sentinel + 1, X.shape[1]), X.dtype)
        Xs[:sentinel] = X[off : off + sentinel]
        for b, mode, s0, s1, n_pad in eo._seg_layout(seg):
            # sweep items = sub-parts concatenated (round 5)
            subs = b if mode == "sweep" else ((b, s0, s1, n_pad),)
            for bb, t0, t1, np_ in subs:
                cc = np.asarray(bb.cols)[t0:t1]
                if unit:
                    p = Xs[cc].sum(axis=1)
                else:
                    vv = np.asarray(bb.vals)[t0:t1]
                    p = (vv[..., None] * Xs[cc]).sum(axis=1)
                if t1 - t0 < np_:
                    p = np.concatenate(
                        [p, np.zeros((np_ - (t1 - t0), X.shape[1]), p.dtype)]
                    )
                parts.append(p)
    return np.concatenate(parts, axis=0) if parts else np.zeros((0, X.shape[1]))


def _check(m, A, X):
    plan = asm.build_assembly_plan(A)
    parts_cat = _slot_contribs(A, X)
    assert plan.n_slots == parts_cat.shape[0]
    Y = np.asarray(asm.apply_plan(plan, parts_cat.astype(np.float32)))
    ref = np.asarray(m @ X)
    np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("unit", [False, True])
def test_plan_unsegmented(unit):
    m = sp.random(700, 300, density=0.02, format="csr", random_state=1,
                  dtype=np.float32)
    m.data[:] = 1.0 if unit else m.data
    X = np.random.default_rng(0).standard_normal((300, 8)).astype(np.float32)
    coo = (
        fs.binary_coo_from_scipy(m.tocoo())
        if unit
        else fs.coo_from_scipy(m, dtype=np.float32)
    )
    _check(m, build_ell(coo), X)


@pytest.mark.parametrize("unit", [False, True])
def test_plan_segmented_and_chunked(unit, monkeypatch):
    m = sp.random(900, 600, density=0.05, format="csr", random_state=2,
                  dtype=np.float32)
    m.data[:] = 1.0 if unit else m.data
    X = np.random.default_rng(1).standard_normal((600, 8)).astype(np.float32)
    coo = (
        fs.binary_coo_from_scipy(m.tocoo())
        if unit
        else fs.coo_from_scipy(m, dtype=np.float32)
    )
    A = build_ell_segmented(coo, seg_cols=256)
    assert isinstance(A, SegmentedEll) and len(A.segments) > 1
    _check(m, A, X)

    # chunked scalar-prefetch layout (tiny budget, SMEM path off)
    with monkeypatch.context() as mp:
        mp.setattr(eo, "_SMEM_IDX_BUDGET_UNIT", 64)
        mp.setattr(eo, "_SMEM_IDX_BUDGET_VALUED", 64)
        mp.setattr(eo, "SMEM_BLOCK_K_UNIT", 0)
        mp.setattr(eo, "SMEM_BLOCK_K_VALUED", 0)
        _check(m, A, X)

    # SMEM-path layout (tiny budget, caps wide open)
    with monkeypatch.context() as mp:
        mp.setattr(eo, "USE_SMEM_PATH", True)
        mp.setattr(eo, "_SMEM_IDX_BUDGET_UNIT", 64)
        mp.setattr(eo, "_SMEM_IDX_BUDGET_VALUED", 64)
        _check(m, A, X)


def test_plan_layout_key_guard(monkeypatch):
    m = sp.random(200, 100, density=0.05, format="csr", random_state=3,
                  dtype=np.float32)
    A = build_ell(fs.coo_from_scipy(m, dtype=np.float32))
    plan = asm.build_assembly_plan(A)
    assert plan.layout_key == asm.layout_key()
    with monkeypatch.context() as mp:
        mp.setattr(eo, "_SMEM_IDX_BUDGET_VALUED", 64)
        assert plan.layout_key != asm.layout_key()


def test_plan_empty_rows():
    m = sp.csr_matrix((50, 40), dtype=np.float32)
    m[3, 5] = 2.0
    m[3, 7] = 1.0
    m[10, 0] = -1.0
    m = m.tocsr()
    A = build_ell(fs.coo_from_scipy(m, dtype=np.float32))
    X = np.random.default_rng(2).standard_normal((40, 8)).astype(np.float32)
    _check(m, A, X)


@pytest.mark.parametrize("unit", [False, True])
def test_ell_spmm_uses_plan(unit):
    """operator() attaches a plan; ell_spmm's planned assembly must match
    the scatter path bit-for-bit (same per-slot kernel outputs)."""
    import dataclasses

    from fastsparse.ops.ell_ops import ell_spmm

    m = sp.random(800, 500, density=0.03, format="csr", random_state=5,
                  dtype=np.float32)
    if unit:
        m.data[:] = 1.0
    coo = (
        fs.binary_coo_from_scipy(m.tocoo())
        if unit
        else fs.coo_from_scipy(m, dtype=np.float32)
    )
    A = build_ell(coo)
    Ap = asm.attach_plan(A)
    assert Ap.plan is not None
    X = np.random.default_rng(3).standard_normal((500, 16)).astype(np.float32)
    Y0 = np.asarray(ell_spmm(A, X))
    Y1 = np.asarray(ell_spmm(Ap, X))
    np.testing.assert_array_equal(Y0, Y1)
    ref = m @ X
    assert np.abs(Y1 - ref).max() / (np.abs(ref).max() + 1e-30) < 2e-6


def test_operator_attaches_plan():
    m = sp.random(600, 50_000, density=2e-4, format="csr", random_state=6,
                  dtype=np.float32)
    op = fs.operator(m, format="ell", transpose=False)
    fmt = op.fwd
    assert getattr(fmt, "plan", None) is not None
    X = np.random.default_rng(4).standard_normal((50_000, 8)).astype(
        np.float32
    )
    Y = np.asarray(op.matmat(X))
    ref = m @ X
    assert np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30) < 2e-6


def test_bsr_strip_plan():
    """bsr_spmm with a strip plan must equal the scatter path bit-for-bit
    (same per-chunk kernel outputs), including empty strips and chunked
    buckets."""
    import dataclasses

    import fastsparse.ops.bsr_ops as bo
    from fastsparse.formats.bsr import build_bsr
    from fastsparse.ops.bsr_ops import bsr_spmm

    m = C.powerlaw_csr(600, 300, 8000, seed=7, dtype=np.float32)
    m[40:80] = 0  # empty strips
    m.eliminate_zeros()
    # panels=False: this test covers the tile-bucket strip plan (mono/panel
    # layouts write Y in place and carry no plan)
    A = build_bsr(fs.coo_from_scipy(m, dtype=np.float32), panels=False)
    Ap = asm.attach_plan(A)
    assert Ap.strip_plan is not None
    X = np.random.default_rng(8).standard_normal((300, 16)).astype(np.float32)
    Y0 = np.asarray(bsr_spmm(A, X))
    Y1 = np.asarray(bsr_spmm(Ap, X))
    np.testing.assert_array_equal(Y0, Y1)
    ref = m @ X
    assert np.abs(Y1 - ref).max() / (np.abs(ref).max() + 1e-30) < 2e-5

    # chunked layout (tiny budget) — plan built under the same budget
    old = bo._SMEM_IDX_BUDGET
    bo._SMEM_IDX_BUDGET = 64
    try:
        Ap2 = asm.attach_plan(dataclasses.replace(A, strip_plan=None))
        Y2 = np.asarray(bsr_spmm(Ap2, X))
    finally:
        bo._SMEM_IDX_BUDGET = old
    np.testing.assert_allclose(Y2, ref, rtol=2e-5, atol=2e-5)
    # stale plan under a different budget must fall back to scatter
    Y3 = np.asarray(bsr_spmm(Ap2, X))
    np.testing.assert_allclose(Y3, ref, rtol=2e-5, atol=2e-5)


def test_operator_attaches_bsr_plans():
    m = C.powerlaw_csr(512, 50_000, 60_000, seed=9, dtype=np.float32)
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=False)
    fmt = op.fwd
    if getattr(fmt, "is_mono", False):
        # mono layouts write Y in place — plan-free by design
        assert fmt.strip_plan is None
    else:
        segs = fmt.segments if hasattr(fmt, "segments") else [fmt]
        assert all(s.strip_plan is not None for s in segs)
    X = np.random.default_rng(10).standard_normal((50_000, 8)).astype(
        np.float32
    )
    Y = np.asarray(op.matmat(X))
    ref = m @ X
    assert np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30) < 2e-5
