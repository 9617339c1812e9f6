"""Bucketed ELL (SELL-style) execution format.

This is the TPU-native answer to the reference's pointer-chasing CSR row
loop (SURVEY.md §3.2): XLA needs static shapes, so rows are *bucketed* by
padded length instead of pointer-chased. Rows are assigned to the smallest
power-of-two width that fits their nonzero count; each bucket is a dense
``(nb, K)`` index/value pair, so one jitted kernel per bucket covers the
whole matrix and XLA compiles **once per bucket** — O(log nnz_max) programs
total, regardless of the matrix (BASELINE.json:5 "padded/bucketed into
fixed-shape tiles so XLA compiles once per bucket").

Layout per bucket (width K):

* ``row_ids  int32[nb]``  — original row of each bucket slot (padding slots
  point at row 0 but carry zero values, so scatters are no-ops);
* ``cols     int32[nb,K]`` — column of each entry (padding -> 0);
* ``vals     dtype[nb,K]`` — values (padding -> 0). Binary matrices store
  unit values here; the indices-only binary specialization is the tiled
  BSR bitmask format's job (`formats.bsr`).

Bucket *membership* is decided host-side (it fixes static shapes — this is
a compile step), but the bulk entry scatter that fills the buckets runs as
one on-device pass.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..utils.pytree import pytree_dataclass, static_field
from .coo import BinaryCOO
from .convert import to_csr, to_csr_host
from .csr import CSR, BinaryCSR

__all__ = [
    "EllBucket",
    "EllMatrix",
    "SegmentedEll",
    "DdEll",
    "build_ell",
    "build_ell_segmented",
    "build_ell_dd",
]


from ..utils.shapes import ceil_pow2 as _ceil_pow2


def _round_up8(x: int) -> int:
    return -(-int(x) // 8) * 8


@pytree_dataclass
class EllBucket:
    row_ids: jax.Array  # int32[nb]
    cols: jax.Array  # int32[nb, K]
    vals: jax.Array  # dtype[nb, K]
    width: int = static_field()  # K
    # slots [0, n_real) hold real rows; the pow2-rounding tail is padding.
    # -1 = unknown (formats built before this field existed): consumers
    # must fall back to inspecting cols/vals.
    n_real: int = static_field(default=-1)
    # Build-time packed column pairs int32[nb, K/2] (c0 | c1<<16) for
    # unit buckets with even K and 16-bit columns: the packed gather
    # kernels previously re-packed cols EVERY product (~0.4 ms of
    # strided-slice fusions per powerlaw-65k² product, traced
    # 2026-08-21). None when packing doesn't apply.
    packed: Any = None

    @property
    def nb(self) -> int:
        return int(self.row_ids.shape[0])


@pytree_dataclass
class EllMatrix:
    """A matrix compiled into width-bucketed ELL slabs.

    ``unit_vals=True`` marks binary matrices: every live entry is exactly
    1.0 AND padding slots point their column at the sentinel ``ncol`` (a
    zero row in the padded X panel), so kernels may skip the value
    multiply entirely (`ops.pallas.ell_spmm` unit mode). XLA fallbacks are
    unaffected: out-of-range scatter indices drop, gathers clamp onto a
    zero product.
    """

    buckets: Tuple[EllBucket, ...]
    shape: tuple = static_field()
    nnz: int = static_field()
    padded_nnz: int = static_field()  # sum of nb*K over buckets
    unit_vals: bool = static_field(default=False)
    # nonzero when rows longer than this were split into multiple bucket
    # rows sharing a row id (f32 gather-engine layout — the assembly sums
    # duplicates). The dd (compensated) paths REQUIRE 0: their exactness
    # depends on one bucket row per matrix row per segment, and an f32
    # scatter-add merge of split partials would lose the low words.
    split_rows: int = static_field(default=0)
    # optional gather-plan Y assembly (ops.assemble.AssemblyPlan): replaces
    # the duplicate-index scatter in `ell_spmm` with static gathers
    plan: Any = None

    @property
    def dtype(self):
        return self.buckets[0].vals.dtype if self.buckets else jnp.float32

    @property
    def padding_ratio(self) -> float:
        """Padded slots / real nonzeros — the key new metric the C library
        never needed (SURVEY.md §5.5)."""
        return self.padded_nnz / max(self.nnz, 1)

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, self.dtype)
        for b in self.buckets:
            out = out.at[b.row_ids[:, None], b.cols].add(b.vals)
        return out


@pytree_dataclass
class SegmentedEll:
    """Column-segmented ELL: one EllMatrix per column range.

    Built so the gather engine (`ops.pallas.ell_spmm`) can keep each
    segment's X panel fully VMEM-resident at full 128-lane width. Row ids
    inside segments are global; column ids are segment-local.
    """

    segments: Tuple[EllMatrix, ...]
    col_offsets: tuple = static_field()  # start column of each segment
    seg_cols: int = static_field()  # columns per segment (last may be short)
    shape: tuple = static_field()
    nnz: int = static_field()
    # optional gather-plan Y assembly (see EllMatrix.plan)
    plan: Any = None

    @property
    def padded_nnz(self) -> int:
        return sum(s.padded_nnz for s in self.segments)

    @property
    def padding_ratio(self) -> float:
        return self.padded_nnz / max(self.nnz, 1)

    def todense(self) -> jax.Array:
        out = jnp.zeros(self.shape, jnp.float32)
        for off, seg in zip(self.col_offsets, self.segments):
            dense = seg.todense()
            out = out.at[:, off : off + dense.shape[1]].add(dense)
        return out


@jax.jit
def _fill_flat(flat_size_arr, slot_of_entry, cols, vals, valid, pad_col):
    """One-pass device scatter of every entry into the concatenated buckets."""
    flat_cols = jnp.full(flat_size_arr.shape, pad_col, jnp.int32)
    flat_vals = jnp.zeros(flat_size_arr.shape, vals.dtype)
    slot = jnp.where(valid, slot_of_entry, flat_cols.shape[0] - 1)
    flat_cols = flat_cols.at[slot].set(jnp.where(valid, cols, pad_col))
    flat_vals = flat_vals.at[slot].set(jnp.where(valid, vals, 0))
    return flat_cols, flat_vals


def build_ell(
    mat, config: Config = DEFAULT, dtype=None, split_rows: int = 0
) -> EllMatrix:
    """Compile a COO/CSR matrix into :class:`EllMatrix`.

    Reference analog: this replaces both ``bcsr_from_sbm`` (conversion) and
    the implicit row loop of ``bcsr_A_mul_B`` (SURVEY.md §2 R5) — the
    irregular structure is regularized at compile time instead of traversed
    at run time.

    ``split_rows > 0`` splits rows longer than that many nonzeros into
    multiple VIRTUAL bucket rows sharing the original row id (the Y
    assembly sums duplicates): every bucket width then stays within the
    gather kernel's full-unroll packed body — 0.91 ns/slot vs the
    chunked body's 1.25 (probe_gather6_tpu). f32 engine layouts only;
    dd (compensated) consumers require the unsplit layout.
    """
    if isinstance(mat, (CSR, BinaryCSR)):
        csr = mat
    else:
        csr = to_csr_host(mat)  # falls back to device to_csr for tracers
    nrow, ncol = csr.shape
    is_binary = isinstance(csr, BinaryCSR)
    if is_binary:
        if dtype is None:
            dtype = jnp.float32
        vals_dev = csr.valid_mask().astype(dtype)
    else:
        vals_dev = csr.vals if dtype is None else csr.vals.astype(dtype)
        dtype = vals_dev.dtype

    row_ptr = np.asarray(csr.row_ptr)
    counts = np.diff(row_ptr)
    max_count = int(counts.max()) if nrow else 0
    split = int(split_rows) if split_rows and max_count > split_rows else 0

    # virtual rows: row r becomes ceil(count/split) sub-rows of <= split
    # slots each (split=0: identity — one virtual row per row)
    if split:
        nsub = np.maximum(-(-counts // split), 1)
    else:
        nsub = np.ones(nrow, np.int64)
    vbase = np.zeros(nrow + 1, np.int64)
    np.cumsum(nsub, out=vbase[1:])
    nv = int(vbase[-1])
    vrow = np.repeat(np.arange(nrow, dtype=np.int64), nsub)
    subi = np.arange(nv, dtype=np.int64) - vbase[vrow]
    vcount = counts[vrow] - subi * split
    if split:
        vcount = np.minimum(vcount, split)
    vcount = np.maximum(vcount, 0)  # empty rows stored nowhere

    widths_allowed = sorted(set(config.ell_bucket_widths))
    if split:
        widths_allowed = [w for w in widths_allowed if w <= split]
        if not widths_allowed or widths_allowed[-1] != split:
            widths_allowed.append(split)
    # packable (unit, 16-bit columns) builds keep only EVEN widths so
    # every bucket rides the packed-pair kernel bodies and the merged
    # sweep launches (width-1/3 rows pad one slot — the odd buckets'
    # slot share is tiny, the per-launch cost they saved is not)
    rows_pad_chk = -(-max(ncol + 1, 8) // 8) * 8
    if is_binary and rows_pad_chk <= 65536:
        widths_allowed = sorted(
            {w + (w & 1) for w in widths_allowed}
        )
    max_needed = int(vcount.max()) if nv else 1
    if max_needed > widths_allowed[-1]:
        widths_allowed.append(_ceil_pow2(max_needed))

    # Host: assign each virtual row to the smallest width that fits.
    width_of_vrow = np.empty(nv, np.int64)
    for w in reversed(widths_allowed):
        width_of_vrow[vcount <= w] = w
    width_of_vrow[vcount == 0] = 0

    buckets_meta = []  # (width, vrows_in_bucket, nb_padded, flat_base)
    flat_base = 0
    loc_of_vrow = np.zeros(nv, np.int64)  # local slot within its bucket
    base_of_vrow = np.zeros(nv, np.int64)  # flat offset of its bucket
    widthk_of_vrow = np.zeros(nv, np.int64)
    for w in widths_allowed:
        vrows_b = np.nonzero(width_of_vrow == w)[0]
        if vrows_b.size == 0:
            continue
        # nb rounded to the kernel's 8-row group (NOT pow2): the gather
        # engine is slot-bound at ~1.6 ns/padded-slot, and pow2 row
        # rounding alone inflated the powerlaw-65k² slot count to 2.15x
        # raw nnz (measured 2026-08-20; x8 + the fine width ladder =
        # 1.11x). Large buckets chunk to a fixed shape anyway
        # (`ell_ops._chunk_ranges`); only small buckets get a
        # matrix-specific compiled shape — a deliberate trade of compile
        # reuse for the dominant slot cost.
        nb = _round_up8(max(vrows_b.size, 8))
        buckets_meta.append((w, vrows_b, nb, flat_base))
        loc_of_vrow[vrows_b] = np.arange(vrows_b.size)
        base_of_vrow[vrows_b] = flat_base
        widthk_of_vrow[vrows_b] = w
        flat_base += nb * w
    flat_size = max(flat_base + 1, 1)  # +1: dump slot for invalid entries

    # Device: one scatter of all entries into the flat bucket storage.
    nnz_cap = csr.nnz_cap
    rows_np = np.asarray(csr.rows)
    k_global = np.arange(nnz_cap, dtype=np.int64)
    slot_k = k_global - row_ptr[rows_np]  # offset within row (row-sorted CSR)
    if split:
        # invalid entries can carry garbage slot_k: clip before indexing
        vr = np.clip(
            vbase[rows_np] + np.clip(slot_k, 0, None) // split, 0, nv - 1
        )
        within = np.clip(slot_k, 0, None) - (vr - vbase[rows_np]) * split
    else:
        vr = np.clip(vbase[rows_np], 0, max(nv - 1, 0))
        within = slot_k
    slot = (
        base_of_vrow[vr]
        + loc_of_vrow[vr] * widthk_of_vrow[vr]
        + within
    )
    valid_np = k_global < csr.n_valid
    slot = np.where(valid_np, slot, flat_size - 1)
    # Binary matrices pad columns with the sentinel ``ncol`` (a zero X
    # row) so the unit-vals gather kernel can skip the multiply.
    pad_col = jnp.int32(ncol if is_binary else 0)
    flat_cols, flat_vals = _fill_flat(
        jnp.zeros((flat_size,), jnp.int8),
        jnp.asarray(slot, jnp.int32)
        if flat_size < 2**31
        else jnp.asarray(slot),
        csr.cols,
        vals_dev,
        jnp.asarray(valid_np),
        pad_col,
    )

    from ..ops.pallas.ell_spmm import _pack_pairs, packed_pair_ok

    rows_pad_x = -(-max(ncol + 1, 8) // 8) * 8  # the unit X panel height
    buckets = []
    padded = 0
    for w, vrows_b, nb, base in buckets_meta:
        row_ids = np.zeros(nb, np.int32)
        row_ids[: vrows_b.size] = vrow[vrows_b]  # ORIGINAL row ids
        cols_b = jax.lax.dynamic_slice(flat_cols, (base,), (nb * w,)).reshape(nb, w)
        vals_b = jax.lax.dynamic_slice(flat_vals, (base,), (nb * w,)).reshape(nb, w)
        packed_b = (
            _pack_pairs(cols_b).reshape(nb, w // 2)
            if is_binary and packed_pair_ok(w, rows_pad_x)
            else None
        )
        buckets.append(
            EllBucket(
                row_ids=jnp.asarray(row_ids),
                cols=cols_b,
                vals=vals_b,
                width=w,
                n_real=int(vrows_b.size),
                packed=packed_b,
            )
        )
        padded += nb * w
    return EllMatrix(
        buckets=tuple(buckets),
        shape=(nrow, ncol),
        nnz=csr.n_valid,
        padded_nnz=padded,
        unit_vals=is_binary,
        split_rows=split,
    )


def build_ell_segmented(
    mat,
    config: Config = DEFAULT,
    seg_cols: int = 16384,
    dtype=None,
    split_rows: int = 0,
) -> SegmentedEll:
    """Compile into column-segmented bucketed ELL (gather-engine format).

    ``seg_cols`` bounds each segment's X-panel height so a (seg_cols, 128)
    f32 panel (8 MB at 16k) stays VMEM-resident in the gather kernel.
    """
    from .coo import BinaryCOO, COO

    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    nrow, ncol = mat.shape
    is_binary = isinstance(mat, BinaryCOO)
    rows = np.asarray(mat.rows)[: mat.n_valid]
    cols = np.asarray(mat.cols)[: mat.n_valid]
    if is_binary:
        vals = None
    else:
        vals = np.asarray(mat.vals)[: mat.n_valid]
        if dtype is not None:
            vals = vals.astype(dtype)
    nseg = max(-(-ncol // seg_cols), 1)
    segments = []
    offsets = []
    # Common power-of-two entry capacity across segments: the on-device
    # sort in to_csr then compiles ONCE for all segments (remote sort
    # compiles are 45-95 s each — CLAUDE.md).
    seg_sizes = [
        int(((cols >= si * seg_cols) & (cols < (si + 1) * seg_cols)).sum())
        for si in range(nseg)
    ]
    cap = _ceil_pow2(max(max(seg_sizes), 1))
    for si in range(nseg):
        lo = si * seg_cols
        hi = min(lo + seg_cols, ncol)
        sel = (cols >= lo) & (cols < hi)
        if is_binary:
            seg_coo = BinaryCOO.from_arrays(
                rows[sel], cols[sel] - lo, (nrow, hi - lo)
            ).pad_to(cap)
        else:
            seg_coo = COO.from_arrays(
                rows[sel], cols[sel] - lo, vals[sel], (nrow, hi - lo)
            ).pad_to(cap)
        segments.append(
            build_ell(seg_coo, config=config, split_rows=split_rows)
        )
        offsets.append(lo)
    return SegmentedEll(
        segments=tuple(segments),
        col_offsets=tuple(offsets),
        seg_cols=seg_cols,
        shape=(nrow, ncol),
        nnz=int(rows.shape[0]),
    )


@dataclasses.dataclass(frozen=True)
class DdEll:
    """Double-word VALUED ELL: two structure-identical ELL builds whose
    value planes satisfy ``hi + lo == v`` (f64) to ~2^-48.

    TPU answer to the reference's fp64 ``SparseDoubleMatrix`` (SURVEY.md
    §2 R4) for *valued* matrices: no f64 arrays ever reach the device
    (the library never requires x64 mode) — `ops.ell_ops.ell_spmm_dd`
    runs the Dekker-TwoProd/TwoSum gather kernel over the two planes.
    Structure identity holds because `build_ell` places entries purely
    positionally (validity is ``k < n_valid``, never value-based).
    """

    hi: object  # EllMatrix | SegmentedEll (f32 head plane)
    lo: object  # same structure, f32 residual plane
    shape: tuple
    nnz: int


def build_ell_dd(mat, config: Config = DEFAULT, seg_cols=None) -> DdEll:
    """Compile a valued matrix (f64 host values) into :class:`DdEll`.

    ``seg_cols=None`` auto-segments when the doubled (hi+lo stacked)
    operand panel would not stay VMEM-resident in the gather kernel.
    """
    from .coo import COO, BinaryCOO

    if isinstance(mat, BinaryCOO):
        raise TypeError("binary matrices use the unit dd path (build_ell)")
    if hasattr(mat, "tocoo") and not isinstance(mat, (COO, CSR, BinaryCSR)):
        m = mat.tocoo()
        rows = m.row.astype(np.int64)
        cols = m.col.astype(np.int64)
        vals = m.data.astype(np.float64)
        shape = tuple(m.shape)
    else:
        if isinstance(mat, (CSR, BinaryCSR)):
            mat = mat.to_coo()
        rows = np.asarray(mat.rows)[: mat.n_valid].astype(np.int64)
        cols = np.asarray(mat.cols)[: mat.n_valid].astype(np.int64)
        vals = np.asarray(mat.vals)[: mat.n_valid].astype(np.float64)
        shape = tuple(mat.shape)
    vh = vals.astype(np.float32)
    vl = (vals - vh).astype(np.float32)

    if seg_cols is None:
        # x2 stacks hi+lo planes: residency budget is half the unit one
        seg_cols = 8192 if shape[1] > 8192 else 0

    def build(v):
        coo = COO.from_arrays(rows, cols, v, shape)
        if seg_cols:
            return build_ell_segmented(coo, config=config, seg_cols=seg_cols)
        return build_ell(coo, config=config)

    return DdEll(
        hi=build(vh), lo=build(vl), shape=shape, nnz=int(rows.shape[0])
    )
