"""Panel-bucket BSR: build decision, round-trip, kernels, narrow RHS.

The panel layout is the TPU-native answer to the reference's contiguous
band/locality exploitation in its CSR row loop (SURVEY.md §3.2): one
(TM, W·TK) block per row-strip when the strip's occupied slabs are
contiguous. These tests pin the build decision, todense round-trip, and
fp32-parity products against dense oracles.
"""
import numpy as np
import pytest

import jax.numpy as jnp

import fastsparse as fs
from fastsparse.config import Config
from fastsparse.formats.bsr import PanelBucket, build_bsr
from fastsparse.formats.coo import BinaryCOO, binary_coo_from_scipy
from fastsparse.ops.bsr_ops import bsr_spmm, bsr_spmv
from fastsparse.bench.matrices import banded


RTOL = 1e-6


def _banded_coo(n=1536, bw=512, density=0.35, seed=3):
    m = banded(n, bw, seed=seed, density=density)
    m.data[:] = 1.0
    return binary_coo_from_scipy(m.tocoo()), m.toarray()


def test_panel_chosen_for_banded():
    from fastsparse.formats.bsr import MonoGroupBucket, MonoPanelBucket

    coo, _ = _banded_coo()
    A = build_bsr(coo, config=Config(tile_m=32), dtype=jnp.bfloat16, binary=False)
    assert A.is_panel
    assert all(
        isinstance(b, (PanelBucket, MonoPanelBucket, MonoGroupBucket))
        for b in A.buckets
    )
    # padding stays tight: ladder widths, ns rounded to 8 (not pow2)
    assert A.padded_tiles <= 1.6 * A.n_tiles
    # the class-panel layout stays available when mono is gated off
    import dataclasses

    A2 = build_bsr(
        coo,
        config=dataclasses.replace(Config(tile_m=32), bsr_mono="off"),
        dtype=jnp.bfloat16,
        binary=False,
    )
    assert all(isinstance(b, PanelBucket) for b in A2.buckets)
    assert A2.padded_tiles <= 1.6 * A2.n_tiles


def test_panel_not_chosen_for_scattered():
    rng = np.random.default_rng(0)
    rows = rng.integers(0, 512, 300)
    cols = rng.integers(0, 16384, 300)
    coo = BinaryCOO.from_arrays(rows, cols, (512, 16384))
    A = build_bsr(coo, config=Config(tile_m=8), dtype=jnp.bfloat16, binary=False)
    assert not A.is_panel  # few nnz spread over wide spans: tiles win


def test_panel_todense_roundtrip():
    coo, ref = _banded_coo()
    for kwargs in (
        dict(dtype=jnp.bfloat16, binary=False),
        dict(binary=True),
    ):
        A = build_bsr(coo, config=Config(tile_m=32), **kwargs)
        assert A.is_panel
        D = np.asarray(A.todense(), np.float32)
        np.testing.assert_array_equal(D, ref)


def test_panel_spmm_matches_dense():
    coo, ref = _banded_coo()
    rng = np.random.default_rng(1)
    X = rng.standard_normal((ref.shape[1], 128)).astype(np.float32)
    Yref = ref @ X
    for kwargs in (
        dict(dtype=jnp.bfloat16, binary=False),
        dict(binary=True),
    ):
        A = build_bsr(coo, config=Config(tile_m=32), **kwargs)
        assert A.is_panel
        Y = np.asarray(bsr_spmm(A, jnp.asarray(X)))
        rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
        assert rel < RTOL, (kwargs, rel)


@pytest.mark.parametrize("n_rhs", [1, 2, 4, 8, 32])
def test_panel_narrow_rhs(n_rhs):
    coo, ref = _banded_coo()
    rng = np.random.default_rng(2)
    X = rng.standard_normal((ref.shape[1], n_rhs)).astype(np.float32)
    A = build_bsr(coo, config=Config(tile_m=32), dtype=jnp.bfloat16, binary=False)
    assert A.is_panel
    Y = np.asarray(bsr_spmm(A, jnp.asarray(X)))
    Yref = ref @ X
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert rel < RTOL, rel


def test_panel_spmv():
    coo, ref = _banded_coo()
    rng = np.random.default_rng(3)
    x = rng.standard_normal(ref.shape[1]).astype(np.float32)
    A = build_bsr(coo, config=Config(tile_m=32), dtype=jnp.bfloat16, binary=False)
    y = np.asarray(bsr_spmv(A, jnp.asarray(x)))
    yref = ref @ x
    rel = np.abs(y - yref).max() / np.abs(yref).max()
    assert rel < RTOL, rel


def test_narrow_rhs_tile_path():
    """Narrow packing also serves classic tile buckets (bf16 tiles)."""
    rng = np.random.default_rng(4)
    rows = np.concatenate([rng.integers(0, 512, 300), np.arange(0, 512, 7)])
    cols = np.concatenate([rng.integers(0, 16384, 300),
                           rng.integers(0, 16384, len(range(0, 512, 7)))])
    coo = BinaryCOO.from_arrays(rows, cols, (512, 16384))
    ref = np.zeros((512, 16384), np.float32)
    ref[np.asarray(coo.rows)[: coo.n_valid], np.asarray(coo.cols)[: coo.n_valid]] = 1.0
    A = build_bsr(coo, config=Config(tile_m=8), dtype=jnp.bfloat16, binary=False)
    assert not A.is_panel
    for n_rhs in (1, 4):
        X = rng.standard_normal((ref.shape[1], n_rhs)).astype(np.float32)
        Y = np.asarray(bsr_spmm(A, jnp.asarray(X)))
        Yref = ref @ X
        rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
        assert rel < RTOL, (n_rhs, rel)


def test_panel_operator_auto_banded():
    """operator(format='bsr') on a banded binary matrix lands on panels
    and keeps products at the BASELINE fp32 bar."""
    m = banded(1536, 512, seed=5, density=0.3)
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=True)
    assert op.fwd.is_panel
    rng = np.random.default_rng(5)
    X = rng.standard_normal((1536, 64)).astype(np.float32)
    ref = m.toarray()
    Y = np.asarray(op.matmat(jnp.asarray(X)))
    rel = np.abs(Y - ref @ X).max() / np.abs(ref @ X).max()
    assert rel < RTOL
    Yt = np.asarray(op.rmatmat(jnp.asarray(X)))
    relt = np.abs(Yt - ref.T @ X).max() / np.abs(ref.T @ X).max()
    assert relt < RTOL


def test_colseg_plan_assembly():
    """Cross-segment strip plan: one multiplicity-class gather replaces
    nseg full-Y additions; boundary strips (multiplicity 2) still sum."""
    from fastsparse.formats.segmented import build_bsr_segmented
    from fastsparse.ops.assemble import attach_plan, colseg_layout_key
    from fastsparse.ops import spmm as spmm_mod, spmv as spmv_mod
    from fastsparse.ops.bsr_ops import colseg_spmm

    coo, ref = _banded_coo()
    A = build_bsr_segmented(
        coo, config=Config(tile_m=32), seg_cols=512, dtype=jnp.bfloat16
    )
    A = attach_plan(A)
    assert A.plan is not None
    assert A.plan.layout_key == colseg_layout_key()
    assert 2 in A.plan.widths  # band crosses segment boundaries
    rng = np.random.default_rng(7)
    X = rng.standard_normal((ref.shape[1], 128)).astype(np.float32)
    Y = colseg_spmm(A, jnp.asarray(X))
    assert Y is not None
    Yref = ref @ X
    rel = np.abs(np.asarray(Y) - Yref).max() / np.abs(Yref).max()
    assert rel < RTOL
    # dispatch routes through the plan; narrow + spmv too
    Y2 = np.asarray(spmm_mod.spmm(A, jnp.asarray(X)))
    np.testing.assert_array_equal(Y2, np.asarray(Y))
    x = rng.standard_normal(ref.shape[1]).astype(np.float32)
    y = np.asarray(spmv_mod.spmv(A, jnp.asarray(x)))
    relv = np.abs(y - ref @ x).max() / np.abs(ref @ x).max()
    assert relv < RTOL


def test_colseg_plan_fallback_without_plan():
    """No plan attached -> dispatch falls back to per-segment sums with
    identical results."""
    from fastsparse.formats.segmented import build_bsr_segmented
    from fastsparse.ops import spmm as spmm_mod

    coo, ref = _banded_coo()
    A = build_bsr_segmented(
        coo, config=Config(tile_m=32), seg_cols=512, dtype=jnp.bfloat16
    )
    assert A.plan is None
    rng = np.random.default_rng(8)
    X = rng.standard_normal((ref.shape[1], 64)).astype(np.float32)
    Y = np.asarray(spmm_mod.spmm(A, jnp.asarray(X)))
    Yref = ref @ X
    rel = np.abs(Y - Yref).max() / np.abs(Yref).max()
    assert rel < RTOL


def test_panel_validate():
    from fastsparse.utils.debug import validate

    coo, _ = _banded_coo()
    for kwargs in (dict(dtype=jnp.bfloat16, binary=False), dict(binary=True)):
        validate(build_bsr(coo, config=Config(tile_m=32), **kwargs))
