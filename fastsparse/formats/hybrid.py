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

__all__ = ["HybridMatrix", "build_hybrid", "dense_tile_fraction"]


@pytree_dataclass
class HybridMatrix:
    """dense (tiled BSR) + sparse (bucketed ELL) split of one matrix."""

    dense: Optional[BsrMatrix]
    sparse: Optional[Union[EllMatrix, SegmentedEll]]
    shape: tuple = static_field()
    nnz: int = static_field()
    dense_nnz: int = static_field()
    threshold: int = static_field()

    @property
    def dense_fraction(self) -> float:
        return self.dense_nnz / max(self.nnz, 1)

    @property
    def dtype(self):
        if self.dense is not None:
            return self.dense.dtype
        return self.sparse.segments[0].dtype if isinstance(
            self.sparse, SegmentedEll
        ) else self.sparse.dtype

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, jnp.float32)
        if self.dense is not None:
            out = out + self.dense.todense().astype(jnp.float32)
        if self.sparse is not None:
            out = out + self.sparse.todense().astype(jnp.float32)
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


def build_hybrid(
    mat,
    config: Config = DEFAULT,
    threshold="auto",
    seg_cols: int = SEG_COLS,
    dtype=None,
) -> HybridMatrix:
    """Split ``mat`` into dense tiles (MXU) + scattered tail (gather).

    ``threshold='auto'`` picks the occupancy cutoff minimizing the modeled
    product cost from this matrix's tile histogram (`bench.model`); an int
    pins it explicitly.
    """
    auto_tm = config.tile_m is None
    config = config.resolve()
    if threshold == "auto":
        from ..bench.model import auto_threshold

        if isinstance(mat, (CSR, BinaryCSR)):
            mat = mat.to_coo()
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
        if shape[1] > seg_cols:
            sparse = build_ell_segmented(
                rest,
                config=config,
                seg_cols=_balanced_seg_cols(shape[1], seg_cols),
                dtype=dtype,
            )
        else:
            sparse = build_ell(rest, config=config, dtype=dtype)
    return HybridMatrix(
        dense=dense,
        sparse=sparse,
        shape=tuple(shape),
        nnz=int(rows.size),
        dense_nnz=n_dense,
        threshold=threshold,
    )
