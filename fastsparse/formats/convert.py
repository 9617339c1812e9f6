"""Device-side format conversions.

The reference converts COO→CSR with a host-side counting sort
(``bcsr_from_sbm``, SURVEY.md §3.1). Here every conversion is jittable
device code (BASELINE.json:5): a stable on-device key sort orders entries,
a masked bincount + cumsum builds ``row_ptr``. Blocked / tiled execution
formats are built by their own compilers (`formats.ell`, `formats.bsr`) on
top of these primitives.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..reorder.sort import sort_coo
from .coo import COO, BinaryCOO
from .csr import CSR, BinaryCSR

__all__ = ["to_csr", "to_csr_host", "to_coo", "transpose_coo", "row_counts"]


def row_counts(rows: jax.Array, valid: jax.Array, nrow: int) -> jax.Array:
    """int32[nrow]: nonzeros per row, ignoring padding entries."""
    ones = valid.astype(jnp.int32)
    return jnp.zeros((nrow,), jnp.int32).at[rows].add(ones)


@jax.jit
def to_csr(coo):
    """COO → CSR (valued or binary), fully on device.

    Entries are sorted row-major (padding to the tail), ``row_ptr`` is a
    masked histogram + exclusive scan — the counting sort of the reference's
    ``bcsr_from_sbm`` re-expressed as vector ops.
    """
    nrow, _ = coo.shape
    s = sort_coo(coo, "row")
    counts = row_counts(s.rows, s.valid_mask(), nrow)
    row_ptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts, dtype=jnp.int32)]
    )
    # Padding entries must not alias row 0: rewrite their cached row id to 0
    # but they sit beyond row_ptr[nrow] == n_valid so CSR consumers skip them.
    if isinstance(coo, BinaryCOO):
        return BinaryCSR(
            row_ptr=row_ptr,
            cols=s.cols,
            rows=s.rows,
            shape=coo.shape,
            n_valid=coo.n_valid,
        )
    return CSR(
        row_ptr=row_ptr,
        cols=s.cols,
        vals=s.vals,
        rows=s.rows,
        shape=coo.shape,
        n_valid=coo.n_valid,
    )


def to_coo(mat):
    """Any fastsparse matrix → its COO form."""
    if isinstance(mat, (COO, BinaryCOO)):
        return mat
    return mat.to_coo()


def to_csr_host(coo):
    """COO -> CSR via a host-side lexsort (no device sort compile).

    The jittable `to_csr` stays the on-device primitive (BASELINE.json:5);
    builders prefer this path for concrete (non-traced) inputs because
    remote `lax.sort` compiles cost ~a minute per shape (CLAUDE.md) and
    format compilation is an offline step anyway.
    """
    import numpy as np

    if isinstance(coo.rows, jax.core.Tracer):
        return to_csr(coo)
    nrow, _ = coo.shape
    rows = np.asarray(coo.rows)[: coo.n_valid]
    cols = np.asarray(coo.cols)[: coo.n_valid]
    order = np.lexsort((cols, rows))
    rows_s = rows[order]
    cols_s = cols[order]
    row_ptr = np.zeros(nrow + 1, np.int32)
    np.cumsum(np.bincount(rows_s, minlength=nrow), out=row_ptr[1:])
    cap = coo.nnz_cap
    pad = cap - rows_s.size

    def _pad(a, fill=0):
        return np.concatenate([a, np.full(pad, fill, a.dtype)]) if pad else a

    if isinstance(coo, BinaryCOO):
        return BinaryCSR(
            row_ptr=jnp.asarray(row_ptr),
            cols=jnp.asarray(_pad(cols_s.astype(np.int32))),
            rows=jnp.asarray(_pad(rows_s.astype(np.int32))),
            shape=coo.shape,
            n_valid=coo.n_valid,
        )
    vals = np.asarray(coo.vals)[: coo.n_valid][order]
    return CSR(
        row_ptr=jnp.asarray(row_ptr),
        cols=jnp.asarray(_pad(cols_s.astype(np.int32))),
        vals=jnp.asarray(_pad(vals)),
        rows=jnp.asarray(_pad(rows_s.astype(np.int32))),
        shape=coo.shape,
        n_valid=coo.n_valid,
    )


@jax.jit
def transpose_coo(coo):
    """Transpose by swapping index arrays (entries re-sorted row-major)."""
    if isinstance(coo, BinaryCOO):
        t = BinaryCOO(
            rows=coo.cols,
            cols=coo.rows,
            shape=(coo.shape[1], coo.shape[0]),
            n_valid=coo.n_valid,
        )
    else:
        t = COO(
            rows=coo.cols,
            cols=coo.rows,
            vals=coo.vals,
            shape=(coo.shape[1], coo.shape[0]),
            n_valid=coo.n_valid,
        )
    return sort_coo(t, "row")


def from_bcoo(mat):
    """`jax.experimental.sparse.BCOO` -> COO (interop bridge).

    Accepts an unbatched 2-D BCOO; duplicate indices are preserved (they
    sum in products, matching BCOO semantics).
    """
    import jax.numpy as jnp

    from .coo import COO

    if mat.ndim != 2 or mat.indices.ndim != 2:
        raise ValueError("only unbatched 2-D BCOO is supported")
    rows = mat.indices[:, 0].astype(jnp.int32)
    cols = mat.indices[:, 1].astype(jnp.int32)
    return COO(
        rows=rows,
        cols=cols,
        vals=mat.data,
        shape=tuple(mat.shape),
        n_valid=int(mat.nse),
    )


def to_bcoo(mat):
    """COO/CSR (or any convertible) -> `jax.experimental.sparse.BCOO`."""
    import jax.numpy as jnp
    from jax.experimental import sparse as jsparse

    coo = to_coo(mat)
    n = coo.n_valid
    rows = coo.rows[:n]
    cols = coo.cols[:n]
    if hasattr(coo, "vals"):
        vals = coo.vals[:n]
    else:
        vals = jnp.ones((n,), jnp.float32)
    indices = jnp.stack([rows, cols], axis=1)
    return jsparse.BCOO((vals, indices), shape=tuple(coo.shape))
