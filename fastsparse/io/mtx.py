"""MatrixMarket I/O (SuiteSparse test matrices: cage, webbase —
BASELINE.json:10 run through this loader).

Wraps scipy's parser for correctness; `read_mtx` returns fastsparse COO
containers directly (binary pattern files -> BinaryCOO).
"""
from __future__ import annotations

import numpy as np

from ..formats.coo import BinaryCOO, COO

__all__ = ["read_mtx", "write_mtx"]


def read_mtx(path, dtype=None):
    """Read a .mtx file -> COO (pattern files -> BinaryCOO).

    Uses the native C++ parser (`io.native`) when available — 20-50x
    faster than scipy's Python reader on large SuiteSparse files — and
    falls back to `scipy.io.mmread`.
    """
    from .native import read_mtx_native

    nat = read_mtx_native(path)
    if nat is not None:
        rows, cols, vals, shape, _sym = nat
        if vals is None or (np.all(vals == 1.0) and dtype is None):
            return BinaryCOO.from_arrays(rows, cols, shape)
        data = vals if dtype is None else vals.astype(dtype)
        return COO.from_arrays(rows, cols, data, shape)

    from scipy.io import mmread

    m = mmread(path).tocoo()
    if m.data is None or m.data.size == 0 and m.row.size:  # pattern
        return BinaryCOO.from_arrays(m.row, m.col, m.shape)
    if np.all(m.data == 1.0) and dtype is None:
        return BinaryCOO.from_arrays(m.row, m.col, m.shape)
    data = m.data if dtype is None else m.data.astype(dtype)
    return COO.from_arrays(m.row, m.col, data, m.shape)


def write_mtx(path, coo) -> None:
    from scipy.io import mmwrite

    mmwrite(str(path), coo.to_scipy())
