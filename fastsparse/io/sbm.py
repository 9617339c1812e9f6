"""Raw binary sparse-matrix files (SBM/SDM).

Parity with the reference's loaders (``read_sbm`` — SURVEY.md §2 R3, §3.1;
exact C layout unverifiable this round, reference mount empty — SURVEY.md
§0). Format used here, little-endian:

    int64 nrow | int64 ncol | int64 nnz | int32 rows[nnz] | int32 cols[nnz]
    [ float64 vals[nnz] ]                      (SDM / valued variant only)

Readers return fastsparse COO containers; writers exist so datasets can be
round-tripped and shipped.
"""
from __future__ import annotations

import numpy as np

from ..formats.coo import BinaryCOO, COO

__all__ = ["read_sbm", "write_sbm", "read_sdm", "write_sdm"]

_HDR = np.dtype("<i8")


def write_sbm(path, coo) -> None:
    """Write a binary COO (indices only)."""
    rows = np.asarray(coo.rows)[: coo.n_valid].astype("<i4")
    cols = np.asarray(coo.cols)[: coo.n_valid].astype("<i4")
    with open(path, "wb") as f:
        np.array([coo.shape[0], coo.shape[1], rows.size], _HDR).tofile(f)
        rows.tofile(f)
        cols.tofile(f)


def read_sbm(path) -> BinaryCOO:
    with open(path, "rb") as f:
        nrow, ncol, nnz = np.fromfile(f, _HDR, 3)
        rows = np.fromfile(f, "<i4", nnz)
        cols = np.fromfile(f, "<i4", nnz)
    return BinaryCOO.from_arrays(rows, cols, (int(nrow), int(ncol)))


def write_sdm(path, coo) -> None:
    """Write a valued COO (fp64 values, reference SDM layout)."""
    rows = np.asarray(coo.rows)[: coo.n_valid].astype("<i4")
    cols = np.asarray(coo.cols)[: coo.n_valid].astype("<i4")
    vals = np.asarray(coo.vals)[: coo.n_valid].astype("<f8")
    with open(path, "wb") as f:
        np.array([coo.shape[0], coo.shape[1], rows.size], _HDR).tofile(f)
        rows.tofile(f)
        cols.tofile(f)
        vals.tofile(f)


def read_sdm(path, dtype=None) -> COO:
    with open(path, "rb") as f:
        nrow, ncol, nnz = np.fromfile(f, _HDR, 3)
        rows = np.fromfile(f, "<i4", nnz)
        cols = np.fromfile(f, "<i4", nnz)
        vals = np.fromfile(f, "<f8", nnz)
    if dtype is not None:
        vals = vals.astype(dtype)
    return COO.from_arrays(rows, cols, vals, (int(nrow), int(ncol)))
