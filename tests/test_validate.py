"""Format-invariant validation tests (SURVEY.md §5.2)."""
import numpy as np
import pytest

import conftest as C

import fastsparse as fs
from fastsparse.utils.debug import FormatError, validate


def test_all_formats_validate():
    m = C.powerlaw_csr(200, 300, 3000, seed=0, dtype=np.float32)
    coo = fs.coo_from_scipy(m, dtype=np.float32)
    for A in (
        coo,
        fs.to_csr(coo),
        fs.build_ell(coo),
        fs.build_bsr(coo),
        fs.build_ell_segmented(coo, seg_cols=128),
        fs.build_bsr_segmented(coo, seg_cols=128),
        fs.build_hybrid(coo, threshold=8),
    ):
        validate(A)
    mb = m.copy(); mb.data[:] = 1.0
    validate(fs.build_ell(fs.binary_coo_from_scipy(mb)))
    validate(fs.build_bsr(fs.binary_coo_from_scipy(mb)))


def test_validate_catches_corruption():
    import jax.numpy as jnp
    import dataclasses

    m = C.random_csr(64, 64, 0.1, seed=1, dtype=np.float32)
    coo = fs.coo_from_scipy(m, dtype=np.float32)
    bad = fs.COO(
        rows=coo.rows.at[0].set(999),
        cols=coo.cols,
        vals=coo.vals,
        shape=coo.shape,
        n_valid=coo.n_valid,
    )
    with pytest.raises(FormatError):
        validate(bad)
