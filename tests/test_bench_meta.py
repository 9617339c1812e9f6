"""Metrics/observability + reorder-clustering tests."""
import numpy as np

import conftest as C

from fastsparse import build_bsr, build_ell, coo_from_scipy, operator
from fastsparse.bench.metrics import format_stats
from fastsparse.reorder.cluster import degree_perms, invert_perm, permute_coo


def test_format_stats_bsr_ell():
    m = C.powerlaw_csr(256, 192, 3000, seed=0, dtype=np.float32)
    coo = coo_from_scipy(m, dtype=np.float32)
    for A in (build_bsr(coo), build_ell(coo)):
        st = format_stats(A)
        assert st["nnz"] == m.nnz
        assert st["padding_ratio"] >= 1
        assert st["a_bytes"] > 0
        assert st["programs"] >= 1


def test_degree_reorder_correct_and_denser():
    m = C.powerlaw_csr(512, 512, 10000, seed=1, dtype=np.float32)
    coo = coo_from_scipy(m, dtype=np.float32)
    rp, cp = degree_perms(coo)
    pc = permute_coo(coo, rp, cp)
    base = build_bsr(coo)
    perm = build_bsr(pc)
    assert perm.nnz == base.nnz
    # clustering must improve (or preserve) tile occupancy on power-law
    assert perm.tile_occupancy >= base.tile_occupancy
    # operator-level equivalence
    op = operator(m, format="bsr", reorder="degree", dtype=np.float32)
    x = np.random.default_rng(2).standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.matvec(x)), m @ x, rtol=2e-4, atol=2e-4)
    y = np.random.default_rng(3).standard_normal(512).astype(np.float32)
    np.testing.assert_allclose(np.asarray(op.rmatvec(y)), m.T @ y, rtol=2e-4, atol=2e-4)


def test_invert_perm():
    import jax.numpy as jnp

    p = jnp.asarray(np.random.default_rng(0).permutation(100).astype(np.int32))
    inv = invert_perm(p)
    np.testing.assert_array_equal(np.asarray(p)[np.asarray(inv)], np.arange(100))


def test_minhash_and_auto_reorder():
    import fastsparse as fs
    from fastsparse.bench.matrices import ecfp_like

    m = ecfp_like(600, 800, bits_per_compound=32, n_scaffolds=12, seed=0)
    for reorder in ("minhash", "auto"):
        op = fs.operator(m, reorder=reorder, transpose=True)
        x = np.random.default_rng(1).standard_normal(800).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op.matvec(x)), m @ x, rtol=2e-4, atol=2e-4
        )
        y = np.random.default_rng(2).standard_normal(600).astype(np.float32)
        np.testing.assert_allclose(
            np.asarray(op.rmatvec(y)), m.T @ y, rtol=2e-4, atol=2e-4
        )
