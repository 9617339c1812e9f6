"""COO sparse matrices (valued and binary) as JAX pytrees.

TPU-native re-design of the reference's COO containers:

* ``SparseBinaryMatrix {nrow, ncol, nnz, rows[], cols[]}`` — SURVEY.md §2 R3
* ``SparseDoubleMatrix {…, vals[]}``                       — SURVEY.md §2 R4

Differences from the C structs, by design (SURVEY.md §1.3):

* index/value arrays are `jax.Array`s (device-resident, shardable);
* ``nnz`` here is the *capacity* (static, part of the jit cache key); the
  live entry count may be smaller when a matrix is padded — padding entries
  carry ``row = col = 0`` and ``val = 0`` so every kernel treats them as
  harmless no-ops (binary matrices use an explicit validity mask instead);
* all transforms (sort, conversion) are jittable device code rather than
  host quicksort (BASELINE.json:5 "reordering done as jittable device
  code").
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.pytree import pytree_dataclass, static_field

__all__ = ["COO", "BinaryCOO", "coo_from_scipy", "binary_coo_from_scipy"]


@pytree_dataclass
class COO:
    """Valued COO matrix: entry ``k`` is ``(rows[k], cols[k]) = vals[k]``.

    Padding convention: entries with ``k >= n_valid`` have rows/cols = 0 and
    vals = 0, so sums over all entries are unaffected. ``n_valid`` is static.
    """

    rows: jax.Array  # int32[nnz_cap]
    cols: jax.Array  # int32[nnz_cap]
    vals: jax.Array  # dtype[nnz_cap]
    shape: tuple = static_field()  # (nrow, ncol)
    n_valid: int = static_field()  # live entries (<= nnz_cap)
    # True = valid entries ascending by row AND padding trailing:
    # consumers may skip their row sorts (ESC SpGEMM's A-prep sort was
    # 18.5 ms/product on rmat13^2 for already-row-major scipy input,
    # traced 2026-08-21). Constructors that scramble rows must leave
    # this False.
    row_sorted: bool = static_field(default=False)

    @property
    def nnz(self) -> int:
        return self.n_valid

    @property
    def nnz_cap(self) -> int:
        return int(self.rows.shape[0])

    @property
    def dtype(self):
        return self.vals.dtype

    @classmethod
    def from_arrays(cls, rows, cols, vals, shape, n_valid: Optional[int] = None,
                    row_sorted: bool = False):
        rows = jnp.asarray(rows, jnp.int32)
        cols = jnp.asarray(cols, jnp.int32)
        vals = jnp.asarray(vals)
        if n_valid is None:
            n_valid = int(rows.shape[0])
        return cls(rows=rows, cols=cols, vals=vals, shape=tuple(shape),
                   n_valid=n_valid, row_sorted=row_sorted)

    def pad_to(self, nnz_cap: int) -> "COO":
        """Grow capacity to ``nnz_cap`` with no-op padding entries."""
        cur = self.nnz_cap
        if nnz_cap < cur:
            raise ValueError(f"cannot shrink capacity {cur} -> {nnz_cap}")
        if nnz_cap == cur:
            return self
        extra = nnz_cap - cur
        zi = jnp.zeros((extra,), jnp.int32)
        zv = jnp.zeros((extra,), self.vals.dtype)
        return COO(
            rows=jnp.concatenate([self.rows, zi]),
            cols=jnp.concatenate([self.cols, zi]),
            vals=jnp.concatenate([self.vals, zv]),
            shape=self.shape,
            n_valid=self.n_valid,
            row_sorted=self.row_sorted,  # padding stays trailing
        )

    def valid_mask(self) -> jax.Array:
        """bool[nnz_cap]: True for live entries."""
        return (
            jnp.arange(self.nnz_cap, dtype=jnp.int32)
            < jnp.int32(self.n_valid)
        )

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.vals.dtype)
        vals = jnp.where(self.valid_mask(), self.vals, 0)
        return out.at[self.rows, self.cols].add(vals)

    def to_scipy(self):
        import scipy.sparse as sp

        r = np.asarray(self.rows)[: self.n_valid]
        c = np.asarray(self.cols)[: self.n_valid]
        v = np.asarray(self.vals)[: self.n_valid]
        return sp.coo_matrix((v, (r, c)), shape=self.shape)


@pytree_dataclass
class BinaryCOO:
    """Binary COO matrix (all values implicitly 1.0): the Macau/SMURFF
    side-information workload (SURVEY.md §2 R3).

    Because values are implicit, padding entries are masked out explicitly:
    entry ``k`` is live iff ``k < n_valid``.
    """

    rows: jax.Array  # int32[nnz_cap]
    cols: jax.Array  # int32[nnz_cap]
    shape: tuple = static_field()
    n_valid: int = static_field()
    # see COO.row_sorted
    row_sorted: bool = static_field(default=False)

    @property
    def nnz(self) -> int:
        return self.n_valid

    @property
    def nnz_cap(self) -> int:
        return int(self.rows.shape[0])

    @classmethod
    def from_arrays(cls, rows, cols, shape, n_valid: Optional[int] = None,
                    row_sorted: bool = False):
        rows = jnp.asarray(rows, jnp.int32)
        cols = jnp.asarray(cols, jnp.int32)
        if n_valid is None:
            n_valid = int(rows.shape[0])
        return cls(rows=rows, cols=cols, shape=tuple(shape), n_valid=n_valid,
                   row_sorted=row_sorted)

    def pad_to(self, nnz_cap: int) -> "BinaryCOO":
        """Grow capacity to ``nnz_cap`` with masked padding entries."""
        cur = self.nnz_cap
        if nnz_cap < cur:
            raise ValueError(f"cannot shrink capacity {cur} -> {nnz_cap}")
        if nnz_cap == cur:
            return self
        zi = jnp.zeros((nnz_cap - cur,), jnp.int32)
        return BinaryCOO(
            rows=jnp.concatenate([self.rows, zi]),
            cols=jnp.concatenate([self.cols, zi]),
            shape=self.shape,
            n_valid=self.n_valid,
            row_sorted=self.row_sorted,  # padding stays trailing
        )

    def valid_mask(self) -> jax.Array:
        return (
            jnp.arange(self.nnz_cap, dtype=jnp.int32)
            < jnp.int32(self.n_valid)
        )

    def with_values(self, dtype=jnp.float32) -> COO:
        """Materialize as a valued COO with unit values (padding -> 0)."""
        vals = self.valid_mask().astype(dtype)
        return COO(
            rows=self.rows,
            cols=self.cols,
            vals=vals,
            shape=self.shape,
            n_valid=self.n_valid,
        )

    def todense(self, dtype=jnp.float32) -> jax.Array:
        return self.with_values(dtype).todense()

    def to_scipy(self):
        import scipy.sparse as sp

        r = np.asarray(self.rows)[: self.n_valid]
        c = np.asarray(self.cols)[: self.n_valid]
        return sp.coo_matrix(
            (np.ones(self.n_valid, np.float64), (r, c)), shape=self.shape
        )


def coo_from_scipy(mat, dtype=None) -> COO:
    """Build a :class:`COO` from any scipy.sparse matrix."""
    m = mat.tocoo()
    vals = m.data if dtype is None else m.data.astype(dtype)
    srt = bool(np.all(np.diff(m.row) >= 0)) if m.row.size else True
    return COO.from_arrays(m.row, m.col, vals, m.shape, row_sorted=srt)


def binary_coo_from_scipy(mat) -> BinaryCOO:
    m = mat.tocoo()
    srt = bool(np.all(np.diff(m.row) >= 0)) if m.row.size else True
    return BinaryCOO.from_arrays(m.row, m.col, m.shape, row_sorted=srt)
