"""Mono-panel layout: structure invariants + oracle parity.

The mono layout executes the whole product in ONE kernel launch
(`ops.pallas.bsr_spmm.mono_panel_spmm`); these tests shrink the X window
(`formats.bsr.MONO_WIN_SLABS`) so window straddling and multi-chunk strips
are exercised at CPU-test scale.
"""
import numpy as np
import pytest
import scipy.sparse as sp

import fastsparse as fs
from fastsparse.formats import bsr as fbsr


def _banded(rng, nrow, ncol, bw, density=0.3, binary=True):
    r = rng.integers(0, nrow, int(nrow * bw * density))
    c = np.clip(
        (r * (ncol / nrow)).astype(int) + rng.integers(0, bw, r.size),
        0,
        ncol - 1,
    )
    vals = (
        np.ones(r.size, np.float32)
        if binary
        else rng.standard_normal(r.size).astype(np.float32)
    )
    m = sp.coo_matrix((vals, (r, c)), shape=(nrow, ncol))
    m.sum_duplicates()
    if binary:
        m.data[:] = 1.0
    return m


@pytest.fixture
def small_windows(monkeypatch):
    # 8-slab (1024-col) windows: strips straddle boundaries at test scale
    monkeypatch.setattr(fbsr, "MONO_WIN_SLABS", 8)


def _rel(y, ref):
    ref = np.asarray(ref, np.float64)
    return np.abs(np.asarray(y) - ref).max() / (np.abs(ref).max() + 1e-30)


def test_mono_structure_invariants(small_windows):
    rng = np.random.default_rng(0)
    m = _banded(rng, 2000, 5000, 300)
    op = fs.operator(m, format="bsr", transpose=False)
    A = op.fwd
    assert A.is_mono
    b = A.buckets[0]
    sid = np.asarray(b.strip_ids)
    # sorted items covering every output strip (incl. chain padding past
    # the matrix's own strips); first flags mark strip starts
    assert (np.diff(sid) >= 0).all()
    assert b.out_strips >= A.n_strips
    assert np.unique(sid).size == b.out_strips
    fst = np.asarray(b.first)
    starts = np.ones(sid.size, bool)
    starts[1:] = sid[1:] != sid[:-1]
    assert (fst == starts).all()
    # panels stay inside their window
    assert (np.asarray(b.start_rel) + b.width <= b.win_slabs).all()
    from fastsparse.utils.debug import validate

    validate(A)
    # exact structure round-trip
    D = np.asarray(A.todense(), np.float64)
    assert np.abs(D - m.toarray()).max() == 0


def test_mono_matmat_matvec_oracle(small_windows):
    rng = np.random.default_rng(1)
    m = _banded(rng, 2000, 5000, 300)
    op = fs.operator(m, format="bsr", transpose=True)
    assert op.fwd.is_mono
    X = np.asarray(rng.standard_normal((5000, 16)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6
    x = np.asarray(rng.standard_normal(5000), np.float32)
    assert _rel(op.matvec(x), m @ x) < 1e-6
    # transpose + normal equations through the dual tiling
    Yt = np.asarray(rng.standard_normal((2000, 8)), np.float32)
    assert _rel(op.rmatmat(Yt), m.T @ Yt) < 1e-6
    assert _rel(op.normal_matmat(X[:, :8]), m.T @ (m @ X[:, :8])) < 1e-5


def test_mono_valued_f32(small_windows):
    rng = np.random.default_rng(2)
    m = _banded(rng, 1000, 3000, 200, binary=False)
    op = fs.operator(m, format="bsr", transpose=False)
    assert op.fwd.is_mono and not op.fwd.binary
    X = np.asarray(rng.standard_normal((3000, 8)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6


def test_mono_empty_strips_and_wide_rows(small_windows):
    # rows 128..383 empty; one row spans 4x the chosen width -> multi-chunk
    rng = np.random.default_rng(3)
    rows = np.concatenate(
        [np.zeros(2048, np.int64), rng.integers(384, 512, 4000)]
    )
    cols = np.concatenate(
        [rng.integers(0, 2048, 2048), rng.integers(0, 400, 4000)]
    )
    m = sp.coo_matrix(
        (np.ones(rows.size, np.float32), (rows, cols)), shape=(512, 2048)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    from fastsparse.config import Config

    op = fs.operator(
        m,
        format="bsr",
        transpose=False,
        config=Config(bsr_mono="force", tile_m=8),
    )
    assert op.fwd.is_mono
    D = np.asarray(op.fwd.todense(), np.float64)
    assert np.abs(D - m.toarray()).max() == 0
    X = np.asarray(rng.standard_normal((2048, 8)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6


def test_mono_chain_normal_equations(small_windows):
    """normal/gram products run the zero-copy two-launch mono chain."""
    rng = np.random.default_rng(5)
    m = _banded(rng, 1800, 4000, 280)
    op = fs.operator(m, format="bsr", transpose=True)
    assert op.fwd.is_mono and op.bwd.is_mono
    assert op._mono_chainable(np.zeros((4000, 4), np.float32))
    # build-time chain padding: fwd covers at least bwd's X-window extent,
    # so the intermediate needs no pad copy
    bw_kpad = op.bwd.buckets[0].n_windows * op.bwd.buckets[0].win_slabs * 128
    assert op.fwd.buckets[0].out_strips * op.fwd.tile_m >= bw_kpad
    X = np.asarray(rng.standard_normal((4000, 16)), np.float32)
    got = np.asarray(op.normal_matmat(X, reg=0.5))
    ref = (m.T @ (m @ X)).astype(np.float64) + 0.5 * X
    assert _rel(got, ref) < 1e-5
    x = np.asarray(rng.standard_normal(4000), np.float32)
    got1 = np.asarray(op.normal_matvec(x))
    ref1 = (m.T @ (m @ x)).astype(np.float64)
    assert _rel(got1, ref1) < 1e-5
    g = np.asarray(rng.standard_normal(1800), np.float32)
    gotg = np.asarray(op.gram_matvec(g))
    refg = (m @ (m.T @ g)).astype(np.float64)
    assert _rel(gotg, refg) < 1e-5


def test_mono_chain_with_reorder(small_windows):
    """Permutation boundary: inner row_inv∘row_perm pair cancels."""
    rng = np.random.default_rng(6)
    m = _banded(rng, 1500, 3500, 260)
    op = fs.operator(m, format="bsr", transpose=True, reorder="degree")
    if not (op.fwd.is_mono and op.bwd.is_mono):
        pytest.skip("reorder broke banded structure; mono not selected")
    X = np.asarray(rng.standard_normal((3500, 8)), np.float32)
    got = np.asarray(op.normal_matmat(X))
    ref = (m.T @ (m @ X)).astype(np.float64)
    assert _rel(got, ref) < 1e-5


def test_mono_int8_panels(small_windows):
    """int8-valued panels (half the DMA bytes): exact through bf16 cast."""
    import jax.numpy as jnp

    from fastsparse.config import Config
    from fastsparse.formats.bsr import build_bsr
    from fastsparse.formats.coo import binary_coo_from_scipy
    from fastsparse.ops.bsr_ops import bsr_spmm

    rng = np.random.default_rng(7)
    m = _banded(rng, 1000, 3000, 200)
    coo = binary_coo_from_scipy(m.tocoo())
    A = build_bsr(
        coo,
        config=Config(bsr_mono="force", tile_m=8),
        dtype=jnp.int8,
        binary=False,
    )
    assert A.is_mono and A.dtype == jnp.int8
    X = np.asarray(rng.standard_normal((3000, 8)), np.float32)
    assert _rel(bsr_spmm(A, X), m @ X) < 1e-6
    # wide RHS hits the fold path
    X64 = np.asarray(rng.standard_normal((3000, 64)), np.float32)
    assert _rel(bsr_spmm(A, X64), m @ X64) < 1e-6


def test_mono_vs_segmented_same_result(small_windows):
    """Mono (windowed, unsegmented) must equal the ColSegmented build."""
    import dataclasses

    rng = np.random.default_rng(4)
    m = _banded(rng, 1500, 6000, 250)
    op_m = fs.operator(m, format="bsr", transpose=False)
    assert op_m.fwd.is_mono
    from fastsparse.config import DEFAULT

    op_s = fs.operator(
        m,
        format="bsr",
        transpose=False,
        config=dataclasses.replace(DEFAULT, bsr_mono="off"),
    )
    assert not getattr(op_s.fwd, "is_mono", False)
    X = np.asarray(rng.standard_normal((6000, 8)), np.float32)
    ym = np.asarray(op_m.matmat(X), np.float64)
    ys = np.asarray(op_s.matmat(X), np.float64)
    ref = (m @ X).astype(np.float64)
    assert np.abs(ym - ref).max() / np.abs(ref).max() < 1e-6
    assert np.abs(ys - ref).max() / np.abs(ref).max() < 1e-6


def test_mono_grouped_selected_and_correct():
    """At realistic window sizes the grouped layout (one item/strip, G
    strips per grid step) wins for banded structure; oracle parity incl.
    todense and the normal-equation chain."""
    import dataclasses

    from fastsparse.config import DEFAULT

    cfg = dataclasses.replace(DEFAULT, bsr_mono_grouped=True)
    rng = np.random.default_rng(9)
    m = _banded(rng, 4000, 9000, 300)
    op = fs.operator(m, format="bsr", transpose=True, config=cfg)
    A = op.fwd
    assert A.is_mono
    assert A.is_mono_grouped, type(A.buckets[0]).__name__
    b = A.buckets[0]
    assert b.ns % b.group == 0
    from fastsparse.utils.debug import validate

    validate(A)
    D = np.asarray(A.todense(), np.float64)
    assert np.abs(D - m.toarray()).max() == 0
    X = np.asarray(rng.standard_normal((9000, 16)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6
    x = np.asarray(rng.standard_normal(9000), np.float32)
    assert _rel(op.matvec(x), m @ x) < 1e-6
    assert _rel(op.normal_matmat(X[:, :8]), m.T @ (m @ X[:, :8])) < 1e-5


def test_mono_grouped_spill_side_bucket():
    """Strips whose span exceeds W spill into the side bucket; results
    stay exact (main + side scatter-add)."""
    rng = np.random.default_rng(10)
    m = _banded(rng, 3000, 7000, 250).tolil()
    # two wide rows spanning most of the matrix -> guaranteed spill
    m[100, ::97] = 1.0
    m[1500, 5::113] = 1.0
    m = m.tocsr()
    m.data[:] = 1.0
    import dataclasses

    from fastsparse.config import DEFAULT

    op = fs.operator(
        m,
        format="bsr",
        transpose=False,
        config=dataclasses.replace(DEFAULT, bsr_mono_grouped=True),
    )
    A = op.fwd
    if not A.is_mono_grouped:
        import pytest

        pytest.skip("grouped not selected for this structure")
    assert len(A.buckets) > 1, "expected a side bucket"
    side = A.buckets[1]
    assert side.strip_map is not None
    from fastsparse.utils.debug import validate

    validate(A)
    D = np.asarray(A.todense(), np.float64)
    assert np.abs(D - m.toarray()).max() == 0
    X = np.asarray(rng.standard_normal((7000, 8)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6


def test_mono_auto_tile_m_256_upgrade():
    """DEFAULT-config banded operators upgrade mono builds to tile_m=256
    (measured 1.6x on the headline); explicit configs never do."""
    from fastsparse.bench.matrices import banded

    rng = np.random.default_rng(11)
    m = banded(8192, 512, seed=4, density=0.39)
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=False)
    if not op.fwd.is_mono:
        pytest.skip("mono not selected for this structure")
    assert op.fwd.tile_m == 256
    m = m.tocsr()
    X = np.asarray(rng.standard_normal((8192, 8)), np.float32)
    assert _rel(op.matmat(X), m @ X) < 1e-6
    # explicit config: no override
    from fastsparse.config import Config

    op2 = fs.operator(
        m, format="bsr", transpose=False, config=Config(tile_m=128)
    )
    assert op2.fwd.tile_m == 128


def test_fresh_config_equals_default_layout():
    """Auto-tuning keys on the tile_m=None sentinel, not object identity:
    a field-for-field-equal Config() must select the SAME layout as
    DEFAULT (the `config is DEFAULT` check silently pinned tile_m=8 —
    measured 6x slower on the banded mono headline; VERDICT r3 weak #5)."""
    from fastsparse.bench.matrices import banded
    from fastsparse.config import DEFAULT, Config

    rng = np.random.default_rng(3)
    m = banded(8192, 512, seed=4, density=0.39)
    m.data[:] = 1.0
    op_d = fs.operator(m, format="bsr", transpose=False)
    op_f = fs.operator(m, format="bsr", transpose=False, config=Config())
    assert Config() == DEFAULT
    assert type(op_f.fwd.buckets[0]) is type(op_d.fwd.buckets[0])
    assert op_f.fwd.tile_m == op_d.fwd.tile_m
    assert op_f.fwd.is_mono == op_d.fwd.is_mono
    X = np.asarray(rng.standard_normal((8192, 4)), np.float32)
    assert _rel(op_f.matmat(X), m.tocsr() @ X) < 1e-6

def test_mono_wide_n256():
    """N=256 — the top of BASELINE config 3's range (BASELINE.json:9) —
    through the full-size mono window geometry (win=80 ⇒ the
    MONO_PREFOLD_VMEM accounting is at its real operating point, 16.4 MB
    doubled-block bytes on the headline config; VERDICT r3 missing #1).
    Covers both nj=2 panel sweeps and the prefold/in-kernel-split branch."""
    import jax.numpy as jnp

    from fastsparse.ops.bsr_ops import _prep_mono_x
    from fastsparse.bench.matrices import banded

    rng = np.random.default_rng(7)
    # ncol > 80·128 so win_slabs hits the full MONO_WIN_SLABS=80 window
    m = banded(12_288, 512, seed=4, density=0.35)
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=False)
    if not op.fwd.is_mono:
        pytest.skip("mono not selected for this structure")
    b = op.fwd.buckets[0]
    assert b.win_slabs == 80  # the real window geometry, not a toy one
    X = np.asarray(rng.standard_normal((12_288, 256)), np.float32)
    # the parity-path decision at N=256 must match the accounting: int8
    # radix-256 planes by default ("i8"); bf16 prefold / in-kernel split
    # when MONO_X_PLANES is flipped back
    Xp, NB, Npad, fold, nq = _prep_mono_x(op.fwd, jnp.asarray(X), 256, "highest")
    assert (NB, Npad, nq) == (128, 256, 0)
    assert fold in ("i8", "i8w", True, "f32")  # parity path either way
    if fold in ("i8", "i8w"):
        planes, scale = Xp
        assert planes.dtype == jnp.int8 and planes.shape[1] == 2 * 3 * 128
        assert scale.shape == (1, 256)
    assert _rel(op.matmat(X), m.tocsr() @ X) < 1e-6


def test_binary_default_is_int8_mono(small_windows):
    """Policy lock: binary banded input -> mono layout with int8 panels
    (Config.binary_tiles="int8" default; measured faster-or-tie at every
    RHS width, BENCH.md 2026-08-20), exact vs the fp64 oracle."""
    import jax.numpy as jnp

    rng = np.random.default_rng(11)
    m = _banded(rng, 1200, 3200, 220)
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=True)
    assert op.fwd.is_mono and op.fwd.dtype == jnp.int8
    assert op.bwd.is_mono and op.bwd.dtype == jnp.int8
    x = np.asarray(rng.standard_normal(3200), np.float32)
    assert _rel(np.asarray(op.matvec(x)), m @ x) < 1e-6
    X = np.asarray(rng.standard_normal((3200, 64)), np.float32)
    assert _rel(np.asarray(op.matmat(X)), m @ X) < 1e-6


def test_quant3_radix256_error_bound():
    """The int8 radix-256 X planes reconstruct x to the documented bound
    (|err| <= colmax/(127*2^16) ~ colmax*1.2e-7 per element: half a
    quantization step + the f32 normalize-multiply's rounding) and every
    plane stays in the int8 range — including adversarial columns (huge
    dynamic range, exact colmax hits, zeros)."""
    import jax.numpy as jnp

    from fastsparse.ops.bsr_ops import _quant3_carry

    rng = np.random.default_rng(0)
    cols = [
        rng.standard_normal(512).astype(np.float32),
        np.linspace(-1e6, 1e6, 512).astype(np.float32),  # colmax hit
        np.concatenate([[1e8], rng.standard_normal(511) * 1e-6]).astype(
            np.float32
        ),  # huge dynamic range
        np.zeros(512, np.float32),  # all-zero column
    ]
    X = jnp.asarray(np.stack(cols, axis=1))
    q0, q1, q2, s = _quant3_carry(X)
    for q in (q0, q1, q2):
        qn = np.asarray(q)
        assert qn.min() >= -128 and qn.max() <= 127
    rec = (
        np.asarray(q0, np.float64) * 65536.0
        + np.asarray(q1, np.float64) * 256.0
        + np.asarray(q2, np.float64)
    ) * np.asarray(s, np.float64)
    colmax = np.abs(np.asarray(X, np.float64)).max(axis=0)
    err = np.abs(rec - np.asarray(X, np.float64))
    bound = np.maximum(colmax, 1.0) * (1.0 / (127 * 65536)) * 1.05
    assert (err <= bound[None, :]).all(), (
        err.max(axis=0) / np.maximum(bound, 1e-300)
    )


def test_halo_narrow_engine_parity(monkeypatch):
    """The zero-spill halo narrow engine (BsrMatrix.narrow) matches the
    oracle for SpMV and N<=8, including multi-window halo'd X; wide N
    ignores it (the grouped kernel loses at N=128 — probe_halo_tpu)."""
    import jax.numpy as jnp

    # small stride so test-scale matrices get n_windows > 1
    monkeypatch.setattr(fbsr, "HALO_STRIDE", 16)
    rng = np.random.default_rng(5)
    m = _banded(rng, 4096, 4096, 300, binary=True)
    op = fs.operator(m, format="bsr", transpose=False)
    A = op.fwd
    assert A.is_mono
    b = A.narrow
    assert b is not None, "halo layout should build on banded structure"
    assert b.win_stride and b.win_stride <= b.win_slabs
    assert b.n_windows > 1  # halo'd X path exercised
    dense = np.asarray(m.todense())
    for N in (1, 4, 8, 32):
        X = rng.standard_normal((4096, N)).astype(np.float32)
        Y = np.asarray(op.matmat(jnp.asarray(X)))
        ref = dense @ X.astype(np.float64)
        rel = np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30)
        assert rel < 1e-6, (N, rel)
    # matvec rides the same engine
    x = rng.standard_normal(4096).astype(np.float32)
    y = np.asarray(op.matvec(jnp.asarray(x)))
    refv = dense @ x.astype(np.float64)
    assert np.abs(y - refv).max() / np.abs(refv).max() < 1e-6


def test_halo_dispatch_gate_and_metrics_agree():
    """The halo engine serves ONLY the probed nq<=8 range (N<=8): wider
    narrow widths (N in 9..40) must take the per-item mono path — their
    grouped X window block can bust the 16 MB scoped-VMEM wall on real
    TPU (ADVICE r4 medium). `active_nbytes` must report the layout the
    dispatch actually reads for every width."""
    import dataclasses as dc

    import jax.numpy as jnp

    from fastsparse.bench.metrics import active_nbytes, tree_nbytes
    from fastsparse.ops.bsr_ops import halo_nq

    rng = np.random.default_rng(7)
    m = _banded(rng, 4096, 4096, 300, binary=True)
    op = fs.operator(m, format="bsr", transpose=False)
    A = op.fwd
    assert A.is_mono and A.narrow is not None
    narrow_bytes = tree_nbytes(A.narrow)
    main_bytes = tree_nbytes(dc.replace(A, narrow=None))
    for N in (1, 8):
        assert halo_nq(A, N) == 8
        assert active_nbytes(A, N) == narrow_bytes
    for N in (9, 16, 40, 128):
        assert halo_nq(A, N) == 0, N
        assert active_nbytes(A, N) == main_bytes
    # non-parity products never ride the halo engine
    assert halo_nq(A, 1, x_dtype=jnp.bfloat16) == 0
    assert halo_nq(A, 1, precision="default") == 0
    # N in 9..40 still gets correct results through the per-item path
    dense = np.asarray(m.todense())
    X = rng.standard_normal((4096, 16)).astype(np.float32)
    Y = np.asarray(op.matmat(jnp.asarray(X)))
    ref = dense @ X.astype(np.float64)
    assert np.abs(Y - ref).max() / (np.abs(ref).max() + 1e-30) < 1e-6


def test_halo_declines_scattered():
    """Structure whose strip spans exceed the mono width cap gets no halo
    layout (it would spill; the per-item path handles it)."""
    rng = np.random.default_rng(6)
    r = rng.integers(0, 2048, 30_000)
    c = rng.integers(0, 16_384, 30_000)
    m = sp.coo_matrix(
        (np.ones(30_000, np.float32), (r, c)), shape=(2048, 16_384)
    )
    m.sum_duplicates()
    m.data[:] = 1.0
    op = fs.operator(m, format="bsr", transpose=False)
    if op.fwd is not None and getattr(op.fwd, "is_mono", False):
        assert op.fwd.narrow is None
