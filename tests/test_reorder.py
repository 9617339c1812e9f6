"""Hilbert/Morton key and sorting tests (SURVEY.md §4: Hilbert index
round-trips, sort correctness)."""
import jax.numpy as jnp
import numpy as np

import fastsparse as fs


def _hilbert_xy2d_ref(order, x, y):
    """Scalar reference implementation of the classic xy2d (host, numpy)."""
    d = 0
    s = 1 << (order - 1)
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        # rotate the low bits into the subquadrant frame
        x &= s - 1
        y &= s - 1
        if ry == 0:
            if rx == 1:
                x = s - 1 - x
                y = s - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_matches_scalar_reference():
    rng = np.random.default_rng(0)
    order = 8
    n = 256
    rows = rng.integers(0, 1 << order, n)
    cols = rng.integers(0, 1 << order, n)
    got = np.asarray(fs.hilbert_key(rows, cols, order=order))
    want = np.array(
        [_hilbert_xy2d_ref(order, int(c), int(r)) for r, c in zip(rows, cols)],
        dtype=np.uint32,
    )
    np.testing.assert_array_equal(got, want)


def test_hilbert_is_bijective_small():
    order = 4
    n = 1 << order
    rr, cc = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    keys = np.asarray(fs.hilbert_key(rr.ravel(), cc.ravel(), order=order))
    assert len(set(keys.tolist())) == n * n
    assert keys.max() == n * n - 1


def test_hilbert_d2xy_roundtrip():
    order = 8
    d = np.arange(0, 1 << (2 * order), 97, dtype=np.uint32)
    r, c = fs.hilbert_d2xy(d, order=order)
    back = np.asarray(fs.hilbert_key(np.asarray(r), np.asarray(c), order=order))
    np.testing.assert_array_equal(back, d)


def test_hilbert_locality():
    """Consecutive Hilbert indices are adjacent in the plane."""
    order = 6
    d = np.arange(1 << (2 * order), dtype=np.uint32)
    r, c = map(np.asarray, fs.hilbert_d2xy(d, order=order))
    step = np.abs(np.diff(r.astype(int))) + np.abs(np.diff(c.astype(int)))
    assert step.max() == 1  # true Hilbert curve: unit steps only


def test_morton_key64_matches_python():
    rng = np.random.default_rng(1)
    rows = rng.integers(0, 1 << 20, 100)
    cols = rng.integers(0, 1 << 20, 100)
    hi, lo = fs.morton_key64(rows, cols)
    got = (np.asarray(hi).astype(np.uint64) << np.uint64(32)) | np.asarray(lo).astype(
        np.uint64
    )

    def interleave(r, c):
        out = 0
        for b in range(32):
            out |= ((c >> b) & 1) << (2 * b)
            out |= ((r >> b) & 1) << (2 * b + 1)
        return out

    want = np.array([interleave(int(r), int(cv)) for r, cv in zip(rows, cols)],
                    dtype=np.uint64)
    np.testing.assert_array_equal(got, want)


def test_sort_coo_orders_and_preserves_entries():
    rng = np.random.default_rng(2)
    n = 500
    rows = rng.integers(0, 100, n).astype(np.int32)
    cols = rng.integers(0, 100, n).astype(np.int32)
    vals = rng.standard_normal(n)
    coo = fs.COO.from_arrays(rows, cols, vals, (100, 100))
    for order in fs.ORDERINGS:
        s = fs.sort_coo(coo, order)
        # entry multiset preserved
        got = sorted(zip(np.asarray(s.rows), np.asarray(s.cols), np.asarray(s.vals)))
        want = sorted(zip(rows, cols, vals))
        assert got == want
    s = fs.sort_coo(coo, "row")
    rr = np.asarray(s.rows)
    assert (np.diff(rr) >= 0).all()


def test_sort_coo_padding_stays_tail():
    coo = fs.COO.from_arrays([5, 3], [1, 2], [1.0, 2.0], (8, 8)).pad_to(10)
    s = fs.sort_coo(coo, "hilbert")
    assert s.n_valid == 2
    assert np.asarray(s.vals)[2:].sum() == 0
    # live entries are a contiguous prefix
    assert set(np.asarray(s.vals)[:2].tolist()) == {1.0, 2.0}


def test_tilepack_perms_are_permutations():
    from fastsparse.bench.matrices import ecfp_like
    from fastsparse.reorder.cluster import tilepack_perms

    m = ecfp_like(2000, 1000, bits_per_compound=32, n_scaffolds=20)
    coo = fs.binary_coo_from_scipy(m.tocoo())
    for base in ("minhash", "degree"):
        rp, cp = tilepack_perms(coo, base=base)
        assert sorted(np.asarray(rp).tolist()) == list(range(2000))
        assert sorted(np.asarray(cp).tolist()) == list(range(1000))


def test_tilepack_improves_tile_density_on_community_structure():
    from fastsparse.bench.matrices import ecfp_like
    from fastsparse.reorder.cluster import minhash_perms, tilepack_perms

    m = ecfp_like(8000, 4000, bits_per_compound=48, n_scaffolds=40).tocoo()
    rows, cols = m.row.astype(np.int64), m.col.astype(np.int64)
    coo = fs.binary_coo_from_scipy(m)

    def dense_frac(rp, cp, tm=8, tk=128, thresh=64):
        rinv = np.empty(rp.size, np.int64)
        rinv[np.asarray(rp)] = np.arange(rp.size)
        cinv = np.empty(cp.size, np.int64)
        cinv[np.asarray(cp)] = np.arange(cp.size)
        nsl = -(-m.shape[1] // tk)
        pair = (rinv[rows] // tm) * nsl + cinv[cols] // tk
        _, cnt = np.unique(pair, return_counts=True)
        return cnt[cnt >= thresh].sum() / rows.size

    mh = dense_frac(*minhash_perms(coo))
    tp = dense_frac(*tilepack_perms(coo))
    assert tp >= mh  # never worse than its own seed ordering
    assert tp >= 0.30  # and captures a large dense core on ECFP structure


def test_tilepack_empty_matrix():
    from fastsparse.reorder.cluster import tilepack_perms

    coo = fs.BinaryCOO.from_arrays([], [], (16, 16))
    rp, cp = tilepack_perms(coo)
    np.testing.assert_array_equal(np.asarray(rp), np.arange(16))
    np.testing.assert_array_equal(np.asarray(cp), np.arange(16))


def test_operator_tilepack_matches_oracle():
    from fastsparse.bench.matrices import ecfp_like

    m = ecfp_like(1500, 800, bits_per_compound=24, n_scaffolds=15)
    X = np.random.default_rng(3).standard_normal((800, 8)).astype(np.float32)
    op = fs.operator(m, reorder="tilepack", transpose=True)
    got = np.asarray(op.matmat(X))
    want = m @ X
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=1e-4)
    yt = np.asarray(op.rmatmat(np.ones((1500, 4), np.float32)))
    np.testing.assert_allclose(yt, m.T @ np.ones((1500, 4), np.float32),
                               rtol=2e-5, atol=1e-4)


def test_hilbert_perms_are_permutations():
    import conftest as C

    from fastsparse.reorder.cluster import hilbert_perms

    coo = fs.coo_from_scipy(C.powerlaw_csr(300, 240, 4000, seed=9).tocoo())
    rp, cp = hilbert_perms(coo)
    assert sorted(np.asarray(rp).tolist()) == list(range(300))
    assert sorted(np.asarray(cp).tolist()) == list(range(240))


def test_operator_hilbert_matches_oracle():
    import jax

    import conftest as C

    m = C.powerlaw_csr(640, 480, 8000, seed=10, dtype=np.float32)
    op = fs.operator(m, reorder="hilbert", transpose=True)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.standard_normal(480), jnp.float32)
    y = np.asarray(jax.jit(lambda op, x: op.matvec(x))(op, x))
    ref = m @ np.asarray(x)
    np.testing.assert_allclose(y, ref, rtol=2e-5, atol=2e-5)
    yt = np.asarray(
        jax.jit(lambda op, v: op.rmatvec(v))(
            op, jnp.asarray(rng.standard_normal(640), jnp.float32)
        )
    )
    assert yt.shape == (480,)
