"""Gather-engine (Pallas ELL) tests, interpret mode on CPU."""
import numpy as np
import pytest
import scipy.sparse as sp

import conftest as C

from fastsparse.formats.coo import coo_from_scipy
from fastsparse.formats.ell import build_ell, build_ell_segmented
from fastsparse.ops.ell_ops import ell_spmm


CASES = [
    ("random", lambda: C.random_csr(200, 300, 0.05, seed=0, dtype=np.float32)),
    ("powerlaw", lambda: C.powerlaw_csr(256, 190, 3000, seed=1, dtype=np.float32)),
    ("empty", lambda: sp.csr_matrix((64, 64), dtype=np.float32)),
    ("dense_row", lambda: sp.csr_matrix(
        np.outer(np.arange(16) == 3, np.arange(40) + 1.0).astype(np.float32))),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_ell_gather_spmm(name, make):
    m = make()
    A = build_ell(coo_from_scipy(m, dtype=np.float32))
    X = np.random.default_rng(2).standard_normal((m.shape[1], 24)).astype(np.float32)
    Y = np.asarray(ell_spmm(A, X))
    ref = m @ X
    atol = 1e-6 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(Y, ref, rtol=2e-6, atol=atol)


def test_segmented_ell_spmm():
    m = C.powerlaw_csr(300, 500, 6000, seed=3, dtype=np.float32)
    S = build_ell_segmented(coo_from_scipy(m, dtype=np.float32), seg_cols=128)
    assert len(S.segments) == 4
    np.testing.assert_allclose(
        np.asarray(S.todense()), m.toarray(), rtol=1e-6, atol=1e-6
    )
    X = np.random.default_rng(4).standard_normal((500, 16)).astype(np.float32)
    Y = np.asarray(ell_spmm(S, X))
    ref = m @ X
    atol = 1e-6 * max(float(np.abs(ref).max()), 1.0)
    np.testing.assert_allclose(Y, ref, rtol=2e-6, atol=atol)


def test_spmm_dispatch_uses_gather():
    import fastsparse as fs

    m = C.random_csr(100, 120, 0.05, seed=5, dtype=np.float32)
    A = fs.build_ell(fs.coo_from_scipy(m, dtype=np.float32))
    X = np.random.default_rng(6).standard_normal((120, 8)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(fs.spmm(A, X)), m @ X, rtol=1e-6, atol=1e-6
    )


def test_binary_unit_gather():
    import fastsparse as fs

    m = C.random_csr(120, 140, 0.06, seed=7, binary=True)
    A = fs.build_ell(fs.binary_coo_from_scipy(m))
    assert A.unit_vals
    X = np.random.default_rng(8).standard_normal((140, 16)).astype(np.float32)
    np.testing.assert_allclose(
        np.asarray(ell_spmm(A, X)), m @ X, rtol=1e-6, atol=1e-5
    )
    S = build_ell_segmented(fs.binary_coo_from_scipy(m), seg_cols=64)
    assert all(seg.unit_vals for seg in S.segments)
    np.testing.assert_allclose(
        np.asarray(ell_spmm(S, X)), m @ X, rtol=1e-6, atol=1e-5
    )


def test_compensated_dd_gather():
    """fp64-class binary SpMM on f32 hardware (TwoSum planes)."""
    import fastsparse as fs
    from fastsparse.ops.ell_ops import ell_spmm_dd

    m = C.random_csr(90, 96, 0.08, seed=30, binary=True)
    A = fs.build_ell(fs.binary_coo_from_scipy(m))
    rng = np.random.default_rng(31)
    # values spanning many magnitudes so f32 would visibly fail
    X = rng.standard_normal((96, 8)) * (10.0 ** rng.integers(-6, 6, (96, 8)))
    ref = (m @ X).astype(np.float64)
    Y = ell_spmm_dd(A, X)
    scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300
    assert np.max(np.abs(Y - ref) / scale) < 1e-10
    # plain f32 engine would NOT meet this bar on the same data
    Y32 = np.asarray(ell_spmm(A, X.astype(np.float32)), np.float64)
    assert np.max(np.abs(Y32 - ref) / scale) > 1e-10

    S = build_ell_segmented(fs.binary_coo_from_scipy(m), seg_cols=48)
    Ys = ell_spmm_dd(S, X)
    assert np.max(np.abs(Ys - ref) / scale) < 1e-10


def test_spmm_dd_operator_level():
    """spmm_dd through a SparseOperator with permutations."""
    import fastsparse as fs

    m = C.random_csr(120, 100, 0.06, seed=40, binary=True)
    rng = np.random.default_rng(41)
    X = rng.standard_normal((100, 4)) * (10.0 ** rng.integers(-5, 5, (100, 4)))
    op = fs.operator(m, format="ell", reorder="degree", transpose=False)
    Y = fs.spmm_dd(op, X)
    ref = (m @ X).astype(np.float64)
    scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300
    assert np.max(np.abs(Y - ref) / scale) < 1e-10


def test_valued_dd_gather():
    """fp64-class VALUED SpMM on f32 hardware (Dekker TwoProd planes)."""
    import fastsparse as fs

    m = C.random_csr(90, 96, 0.08, seed=40, dtype=np.float64)
    # values spanning many magnitudes so f32 products visibly fail
    rng = np.random.default_rng(41)
    m.data[:] = rng.standard_normal(m.nnz) * (
        10.0 ** rng.integers(-6, 6, m.nnz)
    )
    A = fs.build_ell_dd(m)
    X = rng.standard_normal((96, 8)) * (10.0 ** rng.integers(-6, 6, (96, 8)))
    ref = (m @ X).astype(np.float64)
    Y = fs.spmm_dd(A, X)
    scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300
    # In-process bar is 1e-6, NOT the 1e-10 TPU bar: XLA:CPU's LLVM
    # backend contracts mul+add chains (fp-contract) in interpret mode,
    # which partially widens the compensated arithmetic and breaks the
    # TwoSum/TwoProd algebra at the ~1e-7 level. Only
    # --xla_backend_optimization_level=0 restores strict f32 semantics —
    # see test_valued_dd_strict_f32_semantics (subprocess) for the real
    # 1e-10 check; Mosaic on real TPU is verified by scripts/verify_*.
    assert np.max(np.abs(Y - ref) / scale) < 1e-6
    # plain f32 product would NOT meet this bar on the same data
    A32 = fs.build_ell(fs.coo_from_scipy(m.astype(np.float32)))
    from fastsparse.ops.ell_ops import ell_spmm

    Y32 = np.asarray(ell_spmm(A32, X.astype(np.float32)), np.float64)
    assert np.max(np.abs(Y32 - ref) / scale) > 1e-10


def test_valued_dd_segmented():
    """Segmented DdEll: auto-segmentation path + explicit seg_cols."""
    import fastsparse as fs
    from fastsparse.formats.ell import SegmentedEll

    m = C.random_csr(70, 120, 0.1, seed=42, dtype=np.float64)
    rng = np.random.default_rng(43)
    m.data[:] = rng.standard_normal(m.nnz) * (
        10.0 ** rng.integers(-5, 5, m.nnz)
    )
    A = fs.build_ell_dd(m, seg_cols=48)
    assert isinstance(A.hi, SegmentedEll) and isinstance(A.lo, SegmentedEll)
    X = rng.standard_normal((120, 4))
    ref = (m @ X).astype(np.float64)
    Y = fs.spmm_dd(A, X)
    scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300
    # 1e-6 in-process bar: see test_valued_dd_gather comment
    assert np.max(np.abs(Y - ref) / scale) < 1e-6


def test_valued_dd_strict_f32_semantics():
    """The 1e-10 fp64-parity bar for the valued dd path, under strict f32
    semantics (subprocess with --xla_backend_optimization_level=0 so the
    LLVM CPU backend cannot contract the compensated chains)."""
    import subprocess
    import sys
    import os

    script = (
        "import jax; jax.config.update('jax_platforms','cpu')\n"
        "import numpy as np, fastsparse as fs, scipy.sparse as sp\n"
        "rng = np.random.default_rng(7)\n"
        "m = sp.random(80, 90, 0.1, format='csr', random_state=5)\n"
        "m.data[:] = rng.standard_normal(m.nnz) * ("
        "10.0 ** rng.integers(-6, 6, m.nnz))\n"
        "A = fs.build_ell_dd(m)\n"
        "X = rng.standard_normal((90, 8)) * ("
        "10.0 ** rng.integers(-6, 6, (90, 8)))\n"
        "ref = (m @ X).astype(np.float64)\n"
        "Y = fs.spmm_dd(A, X)\n"
        "scale = np.abs(ref).max(axis=0, keepdims=True) + 1e-300\n"
        "rel = float(np.max(np.abs(Y - ref) / scale))\n"
        "assert rel < 1e-10, rel\n"
        "print('strict dd rel', rel)\n"
    )
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_backend_optimization_level=0"
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, "-c", script],
        env=env,
        capture_output=True,
        text=True,
        timeout=500,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert r.returncode == 0, r.stdout + r.stderr


def test_smem_blocked_bucket_path(monkeypatch):
    """Big buckets run as ONE program with SMEM-blocked indices: force the
    path by shrinking the scalar-prefetch budget, results must match the
    chunked path and scipy exactly (same arithmetic order per row)."""
    import fastsparse.ops.ell_ops as eo

    for unit in (False, True):
        m = C.powerlaw_csr(512, 300, 9000, seed=9, dtype=np.float32)
        if unit:
            m.data[:] = 1.0
        coo = coo_from_scipy(m, dtype=np.float32)
        if unit:
            import fastsparse as fs

            coo = fs.binary_coo_from_scipy(m.tocoo())
        A = build_ell(coo)
        X = np.random.default_rng(10).standard_normal((300, 16)).astype(
            np.float32
        )
        ref = np.asarray(ell_spmm(A, X))
        with monkeypatch.context() as mp:
            mp.setattr(eo, "USE_SMEM_PATH", True)
            mp.setattr(eo, "_SMEM_IDX_BUDGET_UNIT", 64)
            mp.setattr(eo, "_SMEM_IDX_BUDGET_VALUED", 64)
            Y = np.asarray(ell_spmm(A, X))
        sc = np.abs(m @ X).max() + 1e-30
        assert np.abs(Y - m @ X).max() / sc < 2e-6
        # the SMEM body keeps the chunked KB/NACC summation order; the
        # round-4 default (whole-row unroll / packed pairs) groups sums
        # differently, so cross-path agreement is fp32-tolerance, not
        # bit-exact
        assert np.abs(Y - ref).max() / sc < 2e-6


def test_gather_wide_rhs_chunks():
    """N past one resident panel runs per-128-column chunked calls (the
    nj>1 kernel sweep's plan assembly measured 14x slower at N=256, and
    `gather_engine_fits` previously kicked wide N to the XLA scan)."""
    import fastsparse as fs
    from fastsparse.ops.ell_ops import gather_engine_fits

    m = C.powerlaw_csr(600, 500, 9000, seed=9, dtype=np.float32)
    op = fs.operator(m, format="ell", transpose=False)
    X = np.random.default_rng(3).standard_normal((500, 256)).astype(np.float32)
    Y = np.asarray(op.matmat(X))
    ref = m @ X.astype(np.float64)
    rel = np.abs(Y - ref).max() / np.abs(ref).max()
    assert rel < 1e-6, rel
    # a 20k-col matrix at N=256 must stay on the gather engine
    assert gather_engine_fits(20_000, 256)


def test_split_rows_layout_and_parity():
    """Sub-row splitting (round 5): rows longer than split_rows become
    multiple bucket rows sharing a row id; every bucket width stays
    <= split_rows; products (plan assembly sums duplicates) and todense
    match the oracle; binary padding still points at the sentinel."""
    import fastsparse as fs
    from fastsparse.ops import assemble

    rng = np.random.default_rng(50)
    # heavy-tailed rows: several rows far beyond the split width
    rows = np.concatenate([
        np.repeat(np.arange(8), 200),          # 8 rows of 200 nnz
        rng.integers(0, 300, 4000),
    ])
    cols = rng.integers(0, 280, rows.size)
    m = sp.coo_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)), shape=(300, 280)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    m = m.tocsr()
    for binary in (True, False):
        if binary:
            coo = fs.binary_coo_from_scipy(m.tocoo())
        else:
            coo = fs.coo_from_scipy(m.tocoo(), dtype=np.float32)
        A = build_ell(coo, split_rows=64)
        assert A.split_rows == 64
        assert all(b.width <= 64 for b in A.buckets)
        # duplicates present: more real bucket rows than matrix rows w/ nnz
        n_real = sum(b.n_real for b in A.buckets)
        assert n_real > len(np.unique(m.tocoo().row))
        np.testing.assert_allclose(
            np.asarray(A.todense()), m.toarray(), rtol=1e-6, atol=1e-6
        )
        A = assemble.attach_plan(A)
        X = rng.standard_normal((280, 16)).astype(np.float32)
        Y = np.asarray(ell_spmm(A, X))
        ref = m @ X
        atol = 1e-5 * max(float(np.abs(ref).max()), 1.0)
        np.testing.assert_allclose(Y, ref, rtol=2e-5, atol=atol)
    # segmented + split
    S = build_ell_segmented(
        fs.binary_coo_from_scipy(m.tocoo()), seg_cols=128, split_rows=64
    )
    S = assemble.attach_plan(S)
    X = rng.standard_normal((280, 8)).astype(np.float32)
    Y = np.asarray(ell_spmm(S, X))
    ref = m @ X
    np.testing.assert_allclose(
        Y, ref, rtol=2e-5, atol=1e-5 * float(np.abs(ref).max())
    )


def test_split_rows_identity_when_unneeded():
    """Matrices with no row beyond the width record split_rows == 0 (the
    dd paths then accept them unchanged)."""
    m = C.random_csr(64, 80, 0.05, seed=51, binary=True)
    import fastsparse as fs

    A = build_ell(fs.binary_coo_from_scipy(m), split_rows=64)
    assert A.split_rows == 0


def test_dd_rejects_split_layout():
    """fp64-class products must refuse split layouts (an f32 scatter-add
    merge of sub-row partials would lose the compensated low words)."""
    import fastsparse as fs
    from fastsparse.ops.ell_ops import ell_spmm_dd

    rows = np.repeat(np.arange(4), 100)
    cols = np.tile(np.arange(100), 4)
    m = sp.coo_matrix(
        (np.ones(400, np.float32), (rows, cols)), shape=(8, 100)
    ).tocsr()
    A = build_ell(fs.binary_coo_from_scipy(m.tocoo()), split_rows=64)
    assert A.split_rows == 64
    X = np.random.default_rng(0).standard_normal((100, 2))
    with pytest.raises(ValueError, match="unsplit"):
        ell_spmm_dd(A, X)
    # the fp64-class compile path builds unsplit and works
    A0 = build_ell(fs.binary_coo_from_scipy(m.tocoo()), split_rows=0)
    Y = ell_spmm_dd(A0, X)
    ref = (m @ X).astype(np.float64)
    assert np.abs(Y - ref).max() / np.abs(ref).max() < 1e-10


def test_sweep_merges_width_classes():
    """Round 5: packed width-class chunks of a unit segment merge into
    ONE sweep launch; parity holds and the assembly plan agrees with the
    merged layout."""
    import fastsparse as fs
    from fastsparse.ops import ell_ops as eo

    rng = np.random.default_rng(70)
    m = sp.random(3000, 2000, density=0.008, random_state=1, format="csr")
    m.data[:] = 1.0
    op = fs.operator(m, format="ell", transpose=False)
    segs = getattr(op.fwd, "segments", [op.fwd])
    modes = [mode for seg in segs for _, mode, *_ in eo._seg_layout(seg)]
    assert "sweep" in modes, modes
    X = rng.standard_normal((2000, 16)).astype(np.float32)
    Y = np.asarray(op.matmat(X))
    ref = m @ X
    rel = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
    assert rel < 1e-5, rel
