"""Degree-clustering permutations for tile density.

The reference sorts nonzeros along a Hilbert curve for cache locality
(SURVEY.md §2 R1-R2). On TPU the analogous lever is *tile density*
(SURVEY.md §7.1): the tiled-BSR format moves whole (TM × TK) tiles, so the
win comes from packing nonzeros into few, full tiles. For power-law
(scale-free) matrices — the Macau/ECFP workload, BASELINE.json:8 — sorting
rows and columns by degree concentrates the hot rows/columns into the
top-left tile block, collapsing the tile count by orders of magnitude.

`degree_perms` computes the permutations on device (masked histogram +
`argsort`, jittable — BASELINE.json:5 "reordering done as jittable device
code"). `permute_coo` relabels entries; consumers un-permute operands with
the inverse permutations (see `linops.SparseOperator`).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.coo import COO, BinaryCOO

__all__ = ["degree_perms", "invert_perm", "permute_coo"]


@jax.jit
def invert_perm(perm: jax.Array) -> jax.Array:
    """inv with inv[perm[k]] = k."""
    n = perm.shape[0]
    return jnp.zeros((n,), perm.dtype).at[perm].set(
        jnp.arange(n, dtype=perm.dtype)
    )


def degree_perms(coo):
    """(row_perm, col_perm): old index of the k-th densest row/column.

    Stable descending-degree order, so the permuted matrix has its heavy
    rows/columns first — power-law structure becomes a dense top-left core.
    Concrete inputs take a host fast path (device argsort compiles cost
    ~a minute per shape through the remote tunnel — CLAUDE.md); traced
    inputs run the jitted device version.
    """
    if not isinstance(coo.rows, jax.core.Tracer):
        import numpy as np

        rows = np.asarray(coo.rows)[: coo.n_valid]
        cols = np.asarray(coo.cols)[: coo.n_valid]
        rdeg = np.bincount(rows, minlength=coo.shape[0])
        cdeg = np.bincount(cols, minlength=coo.shape[1])
        row_perm = np.argsort(-rdeg, kind="stable").astype(np.int32)
        col_perm = np.argsort(-cdeg, kind="stable").astype(np.int32)
        return jnp.asarray(row_perm), jnp.asarray(col_perm)
    return _degree_perms_device(coo)


@jax.jit
def _degree_perms_device(coo):
    nrow, ncol = coo.shape
    valid = coo.valid_mask()
    ones = valid.astype(jnp.int32)
    rdeg = jnp.zeros((nrow,), jnp.int32).at[coo.rows].add(ones)
    cdeg = jnp.zeros((ncol,), jnp.int32).at[coo.cols].add(ones)
    row_perm = jnp.argsort(-rdeg, stable=True).astype(jnp.int32)
    col_perm = jnp.argsort(-cdeg, stable=True).astype(jnp.int32)
    return row_perm, col_perm


@jax.jit
def permute_coo(coo, row_perm, col_perm):
    """Relabel entries: new_row = rinv[row], new_col = cinv[col].

    The result represents ``P_r A P_cᵀ`` where P are the permutation
    matrices of ``row_perm``/``col_perm``: ``(P_r A P_cᵀ) @ x[col_perm]
    == (A @ x)[row_perm]``.
    """
    rinv = invert_perm(row_perm)
    cinv = invert_perm(col_perm)
    rows = rinv[coo.rows]
    cols = cinv[coo.cols]
    if isinstance(coo, BinaryCOO):
        # keep padding harmless: relabeled padding may alias real slots, but
        # the validity mask still guards it
        return BinaryCOO(
            rows=rows, cols=cols, shape=coo.shape, n_valid=coo.n_valid
        )
    return COO(
        rows=jnp.where(coo.valid_mask(), rows, 0),
        cols=jnp.where(coo.valid_mask(), cols, 0),
        vals=coo.vals,
        shape=coo.shape,
        n_valid=coo.n_valid,
    )
