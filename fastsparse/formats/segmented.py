"""Generic column segmentation of execution formats.

Wide matrices defeat VMEM residency of the dense operand panel: both the
gather engine and the tiled-BSR resident strategy want X (or a segment of
it) on-chip. `ColSegmented` splits any matrix into column ranges, builds
the inner execution format per range, and products sum segment
contributions — each segment's X slice then fits VMEM on its own
(`ops.spmm` dispatch). The analog for ELL predates this class
(`formats.ell.SegmentedEll`); this one wraps tiled BSR (and any future
format) the same way.
"""
from __future__ import annotations

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..utils.pytree import pytree_dataclass, static_field
from ..utils.shapes import ceil_pow2 as _ceil_pow2
from .coo import BinaryCOO, COO
from .csr import CSR, BinaryCSR

__all__ = ["ColSegmented", "segment_coo", "build_bsr_segmented"]


@pytree_dataclass
class ColSegmented:
    """Column-range split: segment ``i`` covers columns
    ``[col_offsets[i], col_offsets[i] + segments[i].shape[1])``."""

    segments: Tuple[Any, ...]
    col_offsets: tuple = static_field()
    seg_cols: int = static_field()
    shape: tuple = static_field()
    nnz: int = static_field()
    # optional cross-segment strip assembly (ops.assemble.build_colseg_plan):
    # one multiplicity-class gather instead of nseg full-Y additions
    plan: Any = None

    @property
    def dtype(self):
        return self.segments[0].dtype

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, jnp.float32)
        for off, seg in zip(self.col_offsets, self.segments):
            d = seg.todense()
            out = out.at[:, off : off + d.shape[1]].add(d.astype(jnp.float32))
        return out


def segment_coo(mat, seg_cols: int):
    """Split a COO/CSR host matrix into (offset, sub-COO) column ranges.

    Sub-COOs keep global rows and segment-local columns, padded to one
    shared power-of-two capacity (one compiled conversion per family)."""
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    binary = isinstance(mat, BinaryCOO)
    nrow, ncol = mat.shape
    rows = np.asarray(mat.rows)[: mat.n_valid]
    cols = np.asarray(mat.cols)[: mat.n_valid]
    vals = None if binary else np.asarray(mat.vals)[: mat.n_valid]
    nseg = max(-(-ncol // seg_cols), 1)
    sels = [
        (cols >= si * seg_cols) & (cols < (si + 1) * seg_cols)
        for si in range(nseg)
    ]
    cap = _ceil_pow2(max(max(int(s.sum()) for s in sels), 1))
    out = []
    for si, sel in enumerate(sels):
        lo = si * seg_cols
        hi = min(lo + seg_cols, ncol)
        if binary:
            sub = BinaryCOO.from_arrays(
                rows[sel], cols[sel] - lo, (nrow, hi - lo)
            ).pad_to(cap)
        else:
            sub = COO.from_arrays(
                rows[sel], cols[sel] - lo, vals[sel], (nrow, hi - lo)
            ).pad_to(cap)
        out.append((lo, sub))
    return out


def build_bsr_segmented(
    mat, config: Config = DEFAULT, seg_cols: int = 16384, dtype=None
) -> ColSegmented:
    """Column-segmented tiled BSR: per-segment X panels stay VMEM-resident
    in the MXU kernels (the streamed-X strategy re-fetches a 64 KB slab per
    tile — 17x amplification on banded structure)."""
    from .bsr import build_bsr

    pieces = segment_coo(mat, seg_cols)
    segments = []
    offsets = []
    nnz = 0
    for lo, sub in pieces:
        segments.append(build_bsr(sub, config=config, dtype=dtype))
        offsets.append(lo)
        nnz += sub.n_valid
    return ColSegmented(
        segments=tuple(segments),
        col_offsets=tuple(offsets),
        seg_cols=seg_cols,
        shape=tuple(mat.shape),
        nnz=nnz,
    )
