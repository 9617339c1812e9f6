"""Hybrid execution format: dense tiles on the MXU, the rest gathered.

Real sparse data is rarely uniform: clustered regions (scaffold blocks in
ECFP fingerprints, communities in R-MAT graphs, diagonal bands) coexist
with a scattered tail. The classic HYB answer, TPU-shaped: entries landing
in (8×128) tiles with at least ``dense_threshold`` nonzeros compile into
bitmask/valued tiled BSR (`ops.pallas.bsr_spmm`, ~50 ns per tile
amortized over its nonzeros), everything else into bucketed ELL for the
gather engine (`ops.pallas.ell_spmm`, ~3-4 ns per slot). The split is a
host-side compile step like every other format build.
"""
from __future__ import annotations

from typing import Optional, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, SEG_COLS, Config
from ..utils.pytree import pytree_dataclass, static_field
from .bsr import BsrMatrix, build_bsr
from .coo import BinaryCOO, COO
from .csr import CSR, BinaryCSR
from .ell import EllMatrix, SegmentedEll, build_ell, build_ell_segmented

__all__ = [
    "DenseCols",
    "HybridMatrix",
    "build_hybrid",
    "dense_tile_fraction",
]


@pytree_dataclass
class DenseCols:
    """High-degree columns stored as ONE dense int8 0/1 block.

    Power-law/R-MAT structure concentrates nonzeros in few columns (rmat
    s18: the top 1024 of 262k columns hold 31% of nnz) whose slots the
    gather engine pays ~1.3-2 ns each; as a dense ``(nrow, D)`` block
    they become MXU matmul cells at ~0.1-0.2 ps-per-cell-equivalent
    rates. Binary matrices only (cells are 0/1). ``col_ids`` are the
    extracted original columns, ascending.
    """

    col_ids: jax.Array  # int32[D_pad] (zero-padded past n_cols)
    block: jax.Array  # int8[nrow, D_pad], 0/1 (zero cols past n_cols)
    shape: tuple = static_field()  # parent (nrow, ncol)
    nnz: int = static_field()  # real entries in the block
    n_cols: int = static_field(default=-1)  # real (unpadded) column count

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, jnp.float32)
        # .add, not .set: padding col_ids repeat index 0 with all-zero
        # block columns — adds are order-independent no-ops there
        return out.at[:, self.col_ids].add(
            self.block[: self.shape[0]].astype(jnp.float32)
        )


@pytree_dataclass
class HybridMatrix:
    """dense (tiled BSR) + sparse (bucketed ELL) split of one matrix,
    plus an optional dense-column block (`DenseCols`) for high-degree
    columns of binary matrices."""

    dense: Optional[BsrMatrix]
    sparse: Optional[Union[EllMatrix, SegmentedEll]]
    shape: tuple = static_field()
    nnz: int = static_field()
    dense_nnz: int = static_field()
    threshold: int = static_field()
    dense_cols: Optional[DenseCols] = None

    @property
    def dense_fraction(self) -> float:
        return self.dense_nnz / max(self.nnz, 1)

    @property
    def dtype(self):
        if self.dense is not None:
            return self.dense.dtype
        if self.sparse is not None:
            return self.sparse.segments[0].dtype if isinstance(
                self.sparse, SegmentedEll
            ) else self.sparse.dtype
        return jnp.float32

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, jnp.float32)
        if self.dense is not None:
            out = out + self.dense.todense().astype(jnp.float32)
        if self.sparse is not None:
            out = out + self.sparse.todense().astype(jnp.float32)
        if self.dense_cols is not None:
            out = out + self.dense_cols.todense()
        return out


def _split_host(mat, tm, tk, threshold):
    """(rows, cols, vals|None, shape, dense_sel) — host arrays + split."""
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    binary = isinstance(mat, BinaryCOO)
    rows = np.asarray(mat.rows)[: mat.n_valid].astype(np.int64)
    cols = np.asarray(mat.cols)[: mat.n_valid].astype(np.int64)
    vals = (
        None if binary else np.asarray(mat.vals)[: mat.n_valid]
    )
    n_slabs = max(-(-mat.shape[1] // tk), 1)
    pair = (rows // tm) * n_slabs + cols // tk
    upair, inv, cnt = np.unique(
        pair, return_inverse=True, return_counts=True
    )
    dense_sel = cnt[inv] >= threshold
    return rows, cols, vals, mat.shape, binary, dense_sel


def dense_tile_fraction(mat, config: Config = DEFAULT, threshold: int = 64) -> float:
    """Fraction of nonzeros in tiles holding >= threshold entries."""
    config = config.resolve()
    *_, dense_sel = _split_host(mat, config.tile_m, config.tile_k, threshold)
    return float(dense_sel.mean()) if dense_sel.size else 0.0


def _extract_dense_cols(rows, cols, shape, dense_col):
    """(keep_mask, DenseCols | None): move high-degree columns' entries
    into one dense int8 block (`bench.model.dense_col_select`)."""
    if not dense_col:
        return None, None
    from ..bench.model import dense_col_select

    nrow, ncol = shape
    coldeg = np.bincount(cols, minlength=ncol)
    sel_cols = dense_col_select(coldeg, nrow)
    if sel_cols.size == 0:
        return None, None
    pos = np.full(ncol, -1, np.int64)
    pos[sel_cols] = np.arange(sel_cols.size)
    in_dense = pos[cols] >= 0
    # D padded to the 128-lane multiple: zero block columns (their X
    # gather hits row col_ids[0] but the zero cells kill it) keep the
    # MXU tiling clean and let the Pallas fold kernel take whole-D
    # lane blocks.
    D_pad = -(-sel_cols.size // 128) * 128
    nrow_pad = -(-nrow // 256) * 256  # Pallas row-panel grid alignment
    block = np.zeros((nrow_pad, D_pad), np.int8)
    block[rows[in_dense], pos[cols[in_dense]]] = 1
    cid = np.zeros(D_pad, np.int64)
    cid[: sel_cols.size] = sel_cols
    dc = DenseCols(
        col_ids=jnp.asarray(cid, jnp.int32),
        block=jnp.asarray(block),
        shape=tuple(shape),
        nnz=int(in_dense.sum()),
        n_cols=int(sel_cols.size),
    )
    return ~in_dense, dc


def build_hybrid(
    mat,
    config: Config = DEFAULT,
    threshold="auto",
    seg_cols: int = SEG_COLS,
    dtype=None,
    dense_col: bool = True,
) -> HybridMatrix:
    """Split ``mat`` into dense tiles (MXU) + scattered tail (gather).

    ``threshold='auto'`` picks the occupancy cutoff minimizing the modeled
    product cost from this matrix's tile histogram (`bench.model`); an int
    pins it explicitly. ``dense_col`` additionally extracts high-degree
    columns of BINARY matrices into a `DenseCols` block before the tile
    split (`bench.model.dense_col_select`).
    """
    auto_tm = config.tile_m is None
    config = config.resolve()
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    # dense-column extraction FIRST: tile histogram/threshold must reflect
    # the structure the tile/gather engines will actually run on
    keep = dc = None
    if dense_col and isinstance(mat, BinaryCOO):
        r_all = np.asarray(mat.rows)[: mat.n_valid].astype(np.int64)
        c_all = np.asarray(mat.cols)[: mat.n_valid].astype(np.int64)
        keep, dc = _extract_dense_cols(r_all, c_all, mat.shape, dense_col)
        if dc is not None:
            mat = BinaryCOO.from_arrays(
                r_all[keep], c_all[keep], mat.shape
            )
    if threshold == "auto":
        from ..bench.model import auto_threshold

        threshold = auto_threshold(
            np.asarray(mat.rows)[: mat.n_valid],
            np.asarray(mat.cols)[: mat.n_valid],
            mat.shape,
            config.tile_m,
            config.tile_k,
        )
    rows, cols, vals, shape, binary, sel = _split_host(
        mat, config.tile_m, config.tile_k, threshold
    )

    def make_coo(idx):
        if binary:
            return BinaryCOO.from_arrays(rows[idx], cols[idx], shape)
        return COO.from_arrays(rows[idx], cols[idx], vals[idx], shape)

    dense = sparse = None
    n_dense = int(sel.sum())
    # balanced widths, per consuming kernel's X-residency cap (the BSR
    # binary3 path ships 3 bf16 X planes -> tighter cap than f32 gather;
    # see linops._balanced_seg_cols / BSR_SEG_COLS_*)
    from ..linops import (
        BSR_SEG_COLS_BINARY3,
        BSR_SEG_COLS_F32,
        _balanced_seg_cols,
    )

    is_binary3 = binary and dtype in (None, jnp.float32)
    bsr_cap = BSR_SEG_COLS_BINARY3 if is_binary3 else BSR_SEG_COLS_F32
    if n_dense and auto_tm:
        # taller tiles for the dense core when its structure merges
        # vertically (scaffold blocks span many adjacent rows after
        # tilepack regrouping) — same rule as operator()'s BSR path
        import dataclasses

        from ..bench.model import best_tile_m

        tm = best_tile_m(rows[sel], cols[sel], shape, config.tile_k)
        if tm != config.tile_m:
            config = dataclasses.replace(config, tile_m=tm)
    if n_dense:
        if shape[1] > bsr_cap:
            from .segmented import build_bsr_segmented

            dense = build_bsr_segmented(
                make_coo(sel),
                config=config,
                seg_cols=_balanced_seg_cols(shape[1], bsr_cap),
                dtype=dtype,
            )
        else:
            dense = build_bsr(make_coo(sel), config=config, dtype=dtype)
    if (~sel).sum():
        rest = make_coo(~sel)
        # hybrid is f32-gather-engine machinery: split long rows so every
        # bucket rides the full-unroll packed kernel body
        split = config.ell_split_rows
        if shape[1] > seg_cols:
            sparse = build_ell_segmented(
                rest,
                config=config,
                seg_cols=_balanced_seg_cols(shape[1], seg_cols),
                dtype=dtype,
                split_rows=split,
            )
        else:
            sparse = build_ell(
                rest, config=config, dtype=dtype, split_rows=split
            )
    return HybridMatrix(
        dense=dense,
        sparse=sparse,
        shape=tuple(shape),
        nnz=int(rows.size) + (dc.nnz if dc is not None else 0),
        dense_nnz=n_dense,
        threshold=threshold,
        dense_cols=dc,
    )
