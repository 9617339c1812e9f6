"""Tiled-BSR format + Pallas kernel tests (interpret mode on CPU).

Oracle: scipy (SURVEY.md §4.1). Round-trip: todense == scipy dense.
Kernels: bsr_spmm / bsr_spmv vs dense matmul, both strategies, valued and
binary-bitmask tiles, fp32 rtol 1e-6 (BASELINE.json:5).
"""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

import conftest as C

from fastsparse.formats.bsr import build_bsr, expand_bits_reference
from fastsparse.formats.coo import binary_coo_from_scipy, coo_from_scipy
from fastsparse.ops.bsr_ops import bsr_spmm, bsr_spmv
from fastsparse.ops.pallas.bsr_spmm import bucket_spmm


CASES = [
    ("random", lambda: C.random_csr(200, 300, 0.05, seed=0, dtype=np.float32)),
    ("powerlaw", lambda: C.powerlaw_csr(256, 192, 3000, seed=1, dtype=np.float32)),
    ("tall", lambda: C.random_csr(1000, 40, 0.02, seed=2, dtype=np.float32)),
    ("wide", lambda: C.random_csr(40, 1000, 0.02, seed=3, dtype=np.float32)),
    ("empty", lambda: sp.csr_matrix((64, 64), dtype=np.float32)),
]


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_bsr_roundtrip_valued(name, make):
    m = make()
    A = build_bsr(coo_from_scipy(m, dtype=np.float32))
    np.testing.assert_allclose(
        np.asarray(A.todense()), m.toarray(), rtol=1e-6, atol=1e-6
    )


@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_bsr_roundtrip_binary(name, make):
    m = make()
    m.data[:] = 1.0
    A = build_bsr(binary_coo_from_scipy(m), binary=True)
    assert A.binary
    np.testing.assert_allclose(np.asarray(A.todense()), m.toarray(), atol=0)
    # the DEFAULT for binary inputs is valued tiles (0/1 exact): int8 on
    # mono layouts, bf16 elsewhere — no per-use mask expansion
    # (Config.binary_tiles="int8")
    B = build_bsr(binary_coo_from_scipy(m))
    assert not B.binary
    if B.buckets:
        assert B.dtype in (jnp.bfloat16, jnp.int8)
    np.testing.assert_allclose(np.asarray(B.todense()), m.toarray(), atol=0)


def test_expand_bits_layout():
    rng = np.random.default_rng(0)
    dense = (rng.random((8, 128)) < 0.3).astype(np.float32)
    m = sp.csr_matrix(dense)
    A = build_bsr(binary_coo_from_scipy(m), binary=True, panels=False)
    (b,) = A.buckets
    mask = np.asarray(expand_bits_reference(b.tiles, A.tile_k))[0, 0]
    np.testing.assert_array_equal(mask, dense)


@pytest.mark.parametrize("binary", [False, True], ids=["valued", "binary"])
@pytest.mark.parametrize("name,make", CASES, ids=[c[0] for c in CASES])
def test_bsr_spmm_oracle(name, make, binary):
    m = make()
    if binary:
        m.data[:] = 1.0
        A = build_bsr(binary_coo_from_scipy(m), binary=True)
    else:
        A = build_bsr(coo_from_scipy(m, dtype=np.float32))
    rng = np.random.default_rng(7)
    X = rng.standard_normal((m.shape[1], 48)).astype(np.float32)
    Y = np.asarray(bsr_spmm(A, X))
    np.testing.assert_allclose(Y, m @ X, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("strategy", ["resident", "streamed"])
def test_bucket_spmm_strategies(strategy):
    m = C.random_csr(128, 256, 0.1, seed=5, dtype=np.float32)
    A = build_bsr(coo_from_scipy(m, dtype=np.float32), panels=False)
    rng = np.random.default_rng(9)
    N = 128
    X = rng.standard_normal((256, N)).astype(np.float32)
    import jax.numpy as jnp

    nsl = A.n_slabs
    Xp = jnp.zeros((nsl * A.tile_k, N), jnp.float32).at[:256, :N].set(X)
    ref = m @ X
    got = np.zeros((A.n_strips * A.tile_m, N), np.float32)
    for b in A.buckets:
        Yb = np.asarray(
            bucket_spmm(
                b.slab_ids,
                b.tiles,
                Xp,
                tile_m=A.tile_m,
                tile_k=A.tile_k,
                binary=False,
                n_block=N,
                strategy=strategy,
            )
        )
        for s, sid in enumerate(np.asarray(b.strip_ids)):
            if sid < A.n_strips:
                got[sid * A.tile_m : (sid + 1) * A.tile_m] = Yb[
                    s * A.tile_m : (s + 1) * A.tile_m
                ]
    np.testing.assert_allclose(got[:128], ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("binary", [False, True], ids=["valued", "binary"])
def test_bsr_spmv_oracle(binary):
    m = C.powerlaw_csr(300, 200, 4000, seed=11, dtype=np.float32)
    if binary:
        m.data[:] = 1.0
        A = build_bsr(binary_coo_from_scipy(m), binary=True)
    else:
        A = build_bsr(coo_from_scipy(m, dtype=np.float32))
    rng = np.random.default_rng(13)
    x = rng.standard_normal(200).astype(np.float32)
    y = np.asarray(bsr_spmv(A, x))
    np.testing.assert_allclose(y, m @ x, rtol=1e-5, atol=1e-5)


def test_bsr_metrics():
    m = C.random_csr(256, 256, 0.05, seed=17, dtype=np.float32)
    A = build_bsr(coo_from_scipy(m, dtype=np.float32))
    assert A.nnz == m.nnz
    assert 0 < A.tile_occupancy <= 1
    assert A.padding_ratio >= 1


def test_segmented_bsr():
    import fastsparse as fs

    m = C.random_csr(256, 700, 0.04, seed=31, dtype=np.float32)
    S = fs.build_bsr_segmented(fs.coo_from_scipy(m, dtype=np.float32), seg_cols=256)
    assert len(S.segments) == 3
    np.testing.assert_allclose(np.asarray(S.todense()), m.toarray(), rtol=1e-6, atol=1e-6)
    X = np.random.default_rng(32).standard_normal((700, 16)).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fs.spmm(S, X)), m @ X, rtol=2e-5, atol=2e-5)
    x = np.random.default_rng(33).standard_normal(700).astype(np.float32)
    np.testing.assert_allclose(np.asarray(fs.spmv(S, x)), m @ x, rtol=2e-5, atol=2e-5)


def test_precision_modes():
    """precision='default' (1-pass bf16) returns looser but sane results."""
    m = C.random_csr(96, 128, 0.1, seed=41, dtype=np.float32)
    A = build_bsr(coo_from_scipy(m, dtype=np.float32))
    X = np.random.default_rng(42).standard_normal((128, 16)).astype(np.float32)
    ref = m @ X
    hi = np.asarray(bsr_spmm(A, X))
    lo = np.asarray(bsr_spmm(A, X, precision="default"))
    scale = np.abs(ref).max()
    assert np.abs(hi - ref).max() / scale < 2e-6
    assert np.abs(lo - ref).max() / scale < 2e-2


@pytest.mark.parametrize("tile_m", [32, 128])
def test_bsr_tall_tiles_match_oracle(tile_m):
    """Auto tile-height path: taller tiles must be numerically identical."""
    import fastsparse as fs
    from fastsparse.bench.matrices import banded
    from fastsparse.ops.bsr_ops import bsr_spmm, bsr_spmv

    cfg = fs.Config(tile_m=tile_m)
    m = banded(1500, 96, seed=9, density=0.4)
    X = np.random.default_rng(10).standard_normal((1500, 16)).astype(np.float32)

    A = fs.build_bsr(fs.coo_from_scipy(m.tocoo()), config=cfg)
    np.testing.assert_allclose(
        np.asarray(bsr_spmm(A, X)), m @ X, rtol=2e-5, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(bsr_spmv(A, X[:, 0])), m @ X[:, 0], rtol=2e-5, atol=1e-4
    )

    mb = m.copy(); mb.data[:] = 1.0
    Ab = fs.build_bsr(fs.binary_coo_from_scipy(mb.tocoo()), config=cfg)
    np.testing.assert_allclose(
        np.asarray(bsr_spmm(Ab, X)), mb @ X, rtol=2e-5, atol=1e-4
    )


@pytest.mark.parametrize("tile_m", [8, 32, 128])
@pytest.mark.parametrize("path", ["expand", "planes_k", "planes_n"])
def test_binary_path_variants_match(path, tile_m):
    """All binary HIGHEST kernel bodies agree to fp32 parity (the default
    is chosen by measurement — `bsr_ops.binary_plane_path`)."""
    import fastsparse as fs

    m = C.random_csr(700, 640, 0.05, seed=77, dtype=np.float32)
    m.data[:] = 1.0
    A = build_bsr(
        binary_coo_from_scipy(m.tocoo()), config=fs.Config(tile_m=tile_m)
    )
    X = np.random.default_rng(5).standard_normal((640, 96)).astype(np.float32)
    got = np.asarray(bsr_spmm(A, X, binary_path=path))
    ref = m @ X
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


@pytest.mark.parametrize("tile_m", [8, 128])
def test_bf16_valued_tiles_fp32_parity(tile_m):
    """0/1 matrices stored as bf16 *values* (exact in bf16) hit the
    wide-plane body with no mask expansion — full fp32 parity."""
    import fastsparse as fs

    m = C.random_csr(700, 640, 0.05, seed=78, dtype=np.float32)
    m.data[:] = 1.0
    A = build_bsr(
        binary_coo_from_scipy(m.tocoo()),
        config=fs.Config(tile_m=tile_m),
        binary=False,
        dtype="bfloat16",
    )
    X = np.random.default_rng(6).standard_normal((640, 96)).astype(np.float32)
    got = np.asarray(bsr_spmm(A, X))
    ref = m @ X
    assert np.abs(got - ref).max() / np.abs(ref).max() < 2e-6


def test_bsr_wide_rhs_nblock_cap():
    """N=256 on a wide valued matrix must not widen the resident X panel
    past the VMEM budget (over it, pick_strategy silently drops to the
    ~4x-slower streamed kernel — ecfp N=256 measured 52.7 ms vs 4.1)."""
    import fastsparse as fs

    rng = np.random.default_rng(8)
    m = C.random_csr(600, 4000, 0.01, seed=8)
    op = fs.operator(m, format="bsr", transpose=False)
    X = rng.standard_normal((4000, 256)).astype(np.float32)
    Y = np.asarray(op.matmat(X))
    ref = m @ X.astype(np.float64)
    rel = np.abs(Y - ref).max() / np.abs(ref).max()
    assert rel < 1e-5, rel
