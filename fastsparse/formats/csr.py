"""CSR sparse matrices (valued and binary) as JAX pytrees.

TPU-native re-design of the reference's ``BinaryCSR {nrow, ncol, nnz,
row_ptr[], cols[]}`` (SURVEY.md §2 R5) plus a valued variant. Unlike the C
library, kernels here never pointer-chase ``row_ptr`` — CSR is a storage /
interchange format; the execution formats are the bucketed ELL / tiled BSR
forms built from it (BASELINE.json:5: "pointer-chasing CSR → tiled ELL/BSR
buckets in HBM"). We additionally cache the COO-style ``rows`` expansion so
XLA kernels (segment-sum engines) can run directly on CSR without a
device-side searchsorted per call.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field
from .coo import COO, BinaryCOO

__all__ = ["CSR", "BinaryCSR", "csr_from_scipy", "binary_csr_from_scipy"]


@pytree_dataclass
class CSR:
    """Valued CSR. Entries are row-sorted; within a row, column order is
    whatever the conversion produced (sorted when built by `convert.to_csr`).

    Padding entries (``k >= n_valid``) sit at the tail, belong to no row
    (``row_ptr[nrow] == n_valid``), and carry zeros.
    """

    row_ptr: jax.Array  # int32[nrow + 1]
    cols: jax.Array  # int32[nnz_cap]
    vals: jax.Array  # dtype[nnz_cap]
    rows: jax.Array  # int32[nnz_cap]  cached COO expansion of row ids
    shape: tuple = static_field()
    n_valid: int = static_field()

    @property
    def nnz(self) -> int:
        return self.n_valid

    @property
    def nnz_cap(self) -> int:
        return int(self.cols.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype

    def to_coo(self) -> COO:
        return COO(
            rows=self.rows,
            cols=self.cols,
            vals=self.vals,
            shape=self.shape,
            n_valid=self.n_valid,
        )

    def todense(self) -> jax.Array:
        return self.to_coo().todense()

    def to_scipy(self):
        return self.to_coo().to_scipy().tocsr()

    @classmethod
    def from_scipy(cls, mat, dtype=None) -> "CSR":
        m = mat.tocsr()
        m.sum_duplicates()
        vals = m.data if dtype is None else m.data.astype(dtype)
        rows = np.repeat(
            np.arange(m.shape[0], dtype=np.int32), np.diff(m.indptr)
        )
        return cls(
            row_ptr=jnp.asarray(m.indptr, jnp.int32),
            cols=jnp.asarray(m.indices, jnp.int32),
            vals=jnp.asarray(vals),
            rows=jnp.asarray(rows, jnp.int32),
            shape=tuple(m.shape),
            n_valid=int(m.nnz),
        )


@pytree_dataclass
class BinaryCSR:
    """Binary CSR — the reference's core format (SURVEY.md §2 R5):
    values implicitly 1.0, so storage is indices only."""

    row_ptr: jax.Array  # int32[nrow + 1]
    cols: jax.Array  # int32[nnz_cap]
    rows: jax.Array  # int32[nnz_cap]
    shape: tuple = static_field()
    n_valid: int = static_field()

    @property
    def nnz(self) -> int:
        return self.n_valid

    @property
    def nnz_cap(self) -> int:
        return int(self.cols.shape[0])

    def valid_mask(self) -> jax.Array:
        return (
            jnp.arange(self.nnz_cap, dtype=jnp.int32)
            < jnp.int32(self.n_valid)
        )

    def to_coo(self) -> BinaryCOO:
        return BinaryCOO(
            rows=self.rows, cols=self.cols, shape=self.shape, n_valid=self.n_valid
        )

    def with_values(self, dtype=jnp.float32) -> CSR:
        return CSR(
            row_ptr=self.row_ptr,
            cols=self.cols,
            vals=self.valid_mask().astype(dtype),
            rows=self.rows,
            shape=self.shape,
            n_valid=self.n_valid,
        )

    def todense(self, dtype=jnp.float32) -> jax.Array:
        return self.to_coo().todense(dtype)

    def to_scipy(self):
        return self.to_coo().to_scipy().tocsr()

    @classmethod
    def from_scipy(cls, mat) -> "BinaryCSR":
        m = mat.tocsr()
        m.sum_duplicates()
        rows = np.repeat(
            np.arange(m.shape[0], dtype=np.int32), np.diff(m.indptr)
        )
        return cls(
            row_ptr=jnp.asarray(m.indptr, jnp.int32),
            cols=jnp.asarray(m.indices, jnp.int32),
            rows=jnp.asarray(rows, jnp.int32),
            shape=tuple(m.shape),
            n_valid=int(m.nnz),
        )


def csr_from_scipy(mat, dtype=None) -> CSR:
    return CSR.from_scipy(mat, dtype=dtype)


def binary_csr_from_scipy(mat) -> BinaryCSR:
    return BinaryCSR.from_scipy(mat)
