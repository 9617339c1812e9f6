"""Tiled block-sparse (BSR) execution format with bitmask binary tiles.

This is the MXU execution format — the TPU-native answer to the reference's
blocked format (``BlockedSBM``, SURVEY.md §2 R6) *and* its multi-RHS CSR
kernels (R5): the matrix is cut into ``(TM × TK)`` tiles aligned to the
hardware (TM = 8 sublanes, TK = 128 lanes), row-strips are bucketed by their
occupied-tile count (powers of two), and each bucket is a fixed-shape tensor
triple XLA compiles **once per bucket** (BASELINE.json:5):

* ``strip_ids int32[ns]``       — which row-strip each bucket slot covers;
* ``slab_ids  int32[ns, T]``    — which TK-wide column slab each tile reads
  (padding tiles point at slab 0 but carry zero values ⇒ no-ops);
* ``tile_vals dtype[ns,T,TM,TK]`` — dense tile values (valued matrices), or
* ``tile_bits uint32[ns,T,TM,TK/32]`` — a bitmask, 1 bit per slot, for
  binary matrices (the Macau/SMURFF ECFP workload): 32× less A-traffic than
  fp32 tiles; kernels expand bits → mask on the VPU and feed the MXU.

Column indices are consumed at *DMA time* (scalar-prefetch block index maps
in the Pallas kernels, `ops.pallas.bsr_spmm`), so the compute path contains
no gathers at all — the irregularity is fully compiled away.

The bit layout within a tile row is **word-major**: the bit for tile-column
``c`` lives in word ``c % W`` at bit position ``c // W`` (W = TK/32). This
matches a lane-tiled broadcast of the words array (see `_expand_bits`),
avoiding any in-kernel shuffle.
"""
from __future__ import annotations

import dataclasses

from typing import Any, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..utils.pytree import pytree_dataclass, static_field
from .coo import COO, BinaryCOO
from .csr import CSR, BinaryCSR

__all__ = [
    "BsrBucket",
    "PanelBucket",
    "MonoPanelBucket",
    "MonoGroupBucket",
    "BsrMatrix",
    "build_bsr",
    "build_bsr_mono_uniform",
    "expand_bits_reference",
]


from ..utils.shapes import ceil_pow2 as _ceil_pow2


@pytree_dataclass
class BsrBucket:
    """One bucket: all row-strips needing exactly ``T`` (padded) tiles."""

    strip_ids: jax.Array  # int32[ns] — row-strip id; padding slots -> n_strips
    slab_ids: jax.Array  # int32[ns, T] — column-slab per tile; padding -> 0
    tiles: jax.Array  # dtype[ns,T,TM,TK] valued | uint32[ns,T,TM,TK//32] bits
    ntiles: int = static_field()  # T

    @property
    def ns(self) -> int:
        return int(self.strip_ids.shape[0])

    @property
    def is_binary(self) -> bool:
        return self.tiles.dtype == jnp.uint32


@pytree_dataclass
class PanelBucket:
    """One panel class: strips whose occupied slabs span ``width``
    *contiguous* column slabs (banded/clustered structure).

    Where :class:`BsrBucket` stores ``T`` independent tiles per strip (each
    with its own slab id), a panel strip is ONE ``(TM, width·TK)`` dense
    block starting at column ``start_slab·TK`` — the execution kernel runs
    one dynamic X slice and one wide MXU dot per strip instead of ``T``
    slices/dots, and bucket padding rounds to the width ladder instead of
    powers of two (the reference's per-row CSR loop had no such padding;
    this is the TPU-native answer to its contiguous-band locality,
    SURVEY.md §3.2).
    """

    strip_ids: jax.Array  # int32[ns] — row-strip id; padding slots -> n_strips
    start_slab: jax.Array  # int32[ns] — first column slab; padding -> 0
    panels: jax.Array  # dtype[ns,TM,PK] valued | uint32[ns,TM,PK//32] bits
    width: int = static_field()  # slabs per panel (PK = width·TK)

    @property
    def ns(self) -> int:
        return int(self.strip_ids.shape[0])

    @property
    def ntiles(self) -> int:  # tile-equivalents (metrics/partition compat)
        return self.width

    @property
    def is_binary(self) -> bool:
        return self.panels.dtype == jnp.uint32


@pytree_dataclass
class MonoPanelBucket:
    """The whole matrix as ONE uniform-width panel work list — the
    single-launch execution layout.

    Multi-class panels (:class:`PanelBucket`) cost one kernel launch per
    (segment, width class); the measured fixed overhead of launches +
    cross-launch assembly (~0.27 ms/product, docs/TRACE.md) dominated
    everything narrower than N=128. Here every strip's occupied span is
    covered by ≥1 *items* of one shared width ``W``; each item knows

    * ``strip_ids[i]`` — its output row-block (items sorted by strip, so
      the kernel writes Y in place: NO assembly, NO scatter);
    * ``window[i]`` — which ``win_slabs``-slab block of the padded X must
      be VMEM-resident for it (windows replace column segmentation: wide
      matrices need no per-segment launches, just an X re-DMA when the
      prefetched window index changes);
    * ``start_rel[i]`` — the item's first slab, window-relative;
    * ``first[i]`` — 1 on a strip's first item (kernel init-vs-accumulate:
      strips split across windows/chunks accumulate in the still-resident
      output block — items of one strip are adjacent by construction).

    Empty strips carry one zero item so every output block is written.
    Coverage extends past the matrix's own strips to ``out_strips``
    (zero items): the kernel's raw output is padded to whole X-windows of
    the *transpose* tiling's geometry, so chained products (normal
    equations — the reference's ``bcsr_AA_mul_B``, SURVEY.md §3.3) feed
    the next mono kernel directly with no pad/trim copies.
    """

    strip_ids: jax.Array  # int32[ni] — ascending
    window: jax.Array  # int32[ni]
    start_rel: jax.Array  # int32[ni] — slabs, relative to window start
    first: jax.Array  # int32[ni]
    panels: jax.Array  # dtype[ni,TM,PK] | uint32[ni,TM,PK//32] bits
    width: int = static_field()  # W: slabs per item (PK = W·TK)
    win_slabs: int = static_field()
    n_windows: int = static_field()
    out_strips: int = static_field(default=0)  # covered output row blocks
    # side-bucket use (grouped layouts): local strip k holds GLOBAL strip
    # strip_map[k]; the kernel output scatter-adds into those row blocks
    strip_map: Optional[jax.Array] = None

    @property
    def ns(self) -> int:
        return int(self.strip_ids.shape[0])

    @property
    def ntiles(self) -> int:  # tile-equivalents (metrics compat)
        return self.width

    @property
    def is_binary(self) -> bool:
        return self.panels.dtype == jnp.uint32


@pytree_dataclass
class MonoGroupBucket:
    """Grouped single-launch layout: exactly ONE uniform-width item per
    output strip, ``group`` strips per grid step.

    The per-item overhead of the general mono kernel (G=1) measured
    ~550 ns against a ~300 ns DMA floor; grouping G strips per step (the
    class-panel kernel's SG trick) cut it ~3.3x (probe_mono3/4). The
    preconditions — one item per strip, G-aligned groups sharing one
    prefetched X window, write-once output — are bought at build time:
    entries a strip's single item cannot cover (span > W, window clamp at
    group-window edges) spill into a SIDE :class:`MonoPanelBucket`
    (local strips + ``strip_map``) whose output scatter-adds into Y.
    """

    windows: jax.Array  # int32[ns//group] — X window block per strip group
    start_rel: jax.Array  # int32[ns] — item start slab, window-relative
    panels: jax.Array  # dtype[ns,TM,PK] | uint32[ns,TM,PK//32] bits
    width: int = static_field()  # W: slabs per item (PK = W·TK)
    win_slabs: int = static_field()
    n_windows: int = static_field()
    group: int = static_field()  # G strips per grid step
    out_strips: int = static_field(default=0)  # == ns (chain padding incl)
    # HALO windows (0 = non-overlapping, stride == win_slabs): window w
    # covers original slabs [w·win_stride, w·win_stride + win_slabs) —
    # overlap H = win_slabs - win_stride slabs. The consuming kernel is
    # fed the *halo'd* X (overlapping slices materialized back-to-back,
    # `ops.bsr_ops._halo_x`), so its BlockSpec stays plain block indexing.
    # Overlap sized at build time makes the spill side bucket empty BY
    # CONSTRUCTION (the round-3 grouped-mono rejection was the spill
    # launch, not grouping — probe_halo_tpu: SpMV 0.120 vs 0.153 ms).
    win_stride: int = static_field(default=0)

    @property
    def stride(self) -> int:
        return self.win_stride or self.win_slabs

    @property
    def ns(self) -> int:
        return int(self.start_rel.shape[0])

    @property
    def ntiles(self) -> int:  # tile-equivalents (metrics compat)
        return self.width

    @property
    def is_binary(self) -> bool:
        return self.panels.dtype == jnp.uint32


@pytree_dataclass
class BsrMatrix:
    """A matrix compiled into bucketed (TM × TK) tiles.

    ``shape`` is the logical shape; rows/cols are padded up to strip/slab
    multiples internally. ``n_strips``/``n_slabs`` count the padded grid.
    """

    buckets: Tuple[BsrBucket, ...]
    shape: tuple = static_field()
    nnz: int = static_field()
    n_tiles: int = static_field()  # real (non-padding) tiles
    padded_tiles: int = static_field()  # sum ns*T over buckets
    tile_m: int = static_field()
    tile_k: int = static_field()
    binary: bool = static_field()
    # optional strip-gather Y assembly (ops.assemble.BsrStripPlan):
    # replaces the per-call strip scatter in `bsr_spmm` with one gather
    strip_plan: Any = None
    # optional NARROW-RHS engine: a zero-spill halo-window grouped layout
    # (:class:`MonoGroupBucket` with ``win_stride``) that amortizes the
    # per-item grid-step cost G× for SpMV / N<=8 products, where the
    # per-item mono kernel is sequencing-bound (0.153 ms vs 0.120 probed).
    # Built alongside the main mono layout when structure admits zero
    # spill at a VMEM-fitting halo; N>8 products ignore it (the grouped
    # kernel measured 0.420 vs 0.176 ms at N=128 — probe_halo_tpu).
    narrow: Any = None

    @property
    def n_strips(self) -> int:
        return -(-self.shape[0] // self.tile_m)

    @property
    def n_slabs(self) -> int:
        return -(-self.shape[1] // self.tile_k)

    @property
    def dtype(self):
        if self.binary:
            return jnp.float32
        if not self.buckets:
            return jnp.float32
        b = self.buckets[0]
        return (
            b.panels
            if isinstance(b, (PanelBucket, MonoPanelBucket, MonoGroupBucket))
            else b.tiles
        ).dtype

    @property
    def is_panel(self) -> bool:
        return bool(self.buckets) and isinstance(
            self.buckets[0], (PanelBucket, MonoPanelBucket, MonoGroupBucket)
        )

    @property
    def is_mono(self) -> bool:
        return bool(self.buckets) and isinstance(
            self.buckets[0], (MonoPanelBucket, MonoGroupBucket)
        )

    @property
    def is_mono_grouped(self) -> bool:
        return bool(self.buckets) and isinstance(
            self.buckets[0], MonoGroupBucket
        )

    @property
    def tile_occupancy(self) -> float:
        """nnz / (real tiles × tile area) — how full the real tiles are."""
        area = self.n_tiles * self.tile_m * self.tile_k
        return self.nnz / max(area, 1)

    @property
    def padding_ratio(self) -> float:
        """Padded tile slots / real tiles (bucket-padding overhead)."""
        return self.padded_tiles / max(self.n_tiles, 1)

    def todense(self) -> jax.Array:
        TM, TK = self.tile_m, self.tile_k
        nsp, nsl = self.n_strips, self.n_slabs
        if self.is_mono:
            wide = nsl * TK
            for b in self.buckets:
                wide = max(wide, b.n_windows * b.win_slabs * TK)
            # int8 panels (binary_tiles="int8") densify as f32 — callers
            # expect a float matrix, and 0/1 is exact either way
            ddt = (
                jnp.float32 if self.dtype == jnp.int8 else self.dtype
            )
            outp = jnp.zeros((nsp + 1, TM, wide), ddt)
            for b in self.buckets:
                PK = b.width * TK
                panels = b.panels
                if self.binary:
                    panels = expand_bits_reference(panels, PK).astype(ddt)
                elif panels.dtype != ddt:
                    panels = panels.astype(ddt)
                if isinstance(b, MonoGroupBucket):
                    sids = jnp.arange(b.ns, dtype=jnp.int32)
                    win = b.windows[sids // b.group]
                    stride = b.stride
                else:
                    sids = b.strip_ids
                    win = b.window
                    stride = b.win_slabs
                    if b.strip_map is not None:
                        sids = b.strip_map[sids]
                start = win * stride + b.start_rel  # absolute slabs
                cols = start[:, None] * TK + jnp.arange(PK)[None, :]
                outp = outp.at[
                    sids[:, None, None],
                    jnp.arange(TM)[None, :, None],
                    cols[:, None, :],
                ].add(panels)
            dense = outp[:nsp, :, : nsl * TK].reshape(nsp * TM, nsl * TK)
            return dense[: self.shape[0], : self.shape[1]]
        if self.is_panel:
            # int8 panels densify as f32 (callers expect a float matrix)
            ddt = jnp.float32 if self.dtype == jnp.int8 else self.dtype
            outp = jnp.zeros((nsp + 1, TM, nsl * TK), ddt)
            for b in self.buckets:
                PK = b.width * TK
                panels = b.panels
                if self.binary:
                    panels = expand_bits_reference(panels, PK).astype(ddt)
                elif panels.dtype != ddt:
                    panels = panels.astype(ddt)
                # scatter each strip's panel at its start column
                cols = (
                    b.start_slab[:, None] * TK + jnp.arange(PK)[None, :]
                )  # (ns, PK)
                outp = outp.at[b.strip_ids[:, None, None],
                               jnp.arange(TM)[None, :, None],
                               cols[:, None, :]].add(panels)
            dense = outp[:nsp].reshape(nsp * TM, nsl * TK)
            return dense[: self.shape[0], : self.shape[1]]
        # One extra strip row: padding bucket slots point at strip n_strips.
        out = jnp.zeros((nsp + 1, TM, nsl, TK), self.dtype)
        for b in self.buckets:
            tiles = b.tiles
            if self.binary:
                tiles = expand_bits_reference(tiles, TK).astype(self.dtype)
            # Advanced indices at dims 0 and 2 broadcast to (ns, T); the
            # remaining slice dims (TM, TK) follow -> (ns, T, TM, TK).
            out = out.at[b.strip_ids[:, None], :, b.slab_ids, :].add(tiles)
        dense = out[:nsp].reshape(nsp * TM, nsl * TK)
        return dense[: self.shape[0], : self.shape[1]]


def expand_bits_reference(bits: jax.Array, tile_k: int) -> jax.Array:
    """Expand bitmask words to a 0/1 float mask — reference implementation.

    ``bits``: uint32[..., TM, W] with W = tile_k // 32; returns
    f32[..., TM, tile_k]. Bit for tile-column ``c`` is word ``c % W``, bit
    position ``c // W`` (word-major layout, see module docstring). The
    Pallas kernels use the same layout via a lane-tiled broadcast.
    """
    W = tile_k // 32
    c = jnp.arange(tile_k, dtype=jnp.uint32)
    words = bits[..., c % W]  # (..., TM, TK)
    return ((words >> (c // W)) & jnp.uint32(1)).astype(jnp.float32)


@jax.jit
def _fill_flat_vals(flat_shape_arr, slot, vals, valid):
    flat = jnp.zeros(flat_shape_arr.shape, vals.dtype)
    slot = jnp.where(valid, slot, flat.shape[0] - 1)
    return flat.at[slot].add(jnp.where(valid, vals, 0))


@jax.jit
def _fill_flat_bits(flat_shape_arr, slot, bit, valid):
    flat = jnp.zeros(flat_shape_arr.shape, jnp.uint32)
    slot = jnp.where(valid, slot, flat.shape[0] - 1)
    word = jnp.where(valid, jnp.uint32(1) << bit.astype(jnp.uint32), 0)
    # entries are unique (row, col) pairs -> distinct bits, so add == or.
    return flat.at[slot].add(word)


# Allowed panel widths (slabs): denser than pow2 so banded strips pad a few
# percent, sparse enough that the compiled-program count stays O(log).
_PANEL_WIDTHS = (
    1, 2, 3, 4, 5, 6, 8, 10, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96,
    128, 160, 192, 256, 320, 384, 512,
)

# Hard cap on panel width for the fold="f32" kernels: the in-kernel plane
# split materializes ~10 B/element of the (PK, NB) X slice on the VMEM
# stack (3 bf16 planes + f32 residual), so PK=W·TK must stay a few
# thousand columns. A w=128 class (PK=16384) OOM'd scoped vmem by 8.9 MB
# on rmat s18 (2026-08-20). Strips wider than this run tile buckets (class
# panels) or multi-item accumulation (mono).
PANEL_W_MAX = 16


def _quantize_widths(wc: np.ndarray, n_slabs: int) -> np.ndarray:
    """Round contiguous widths up the panel ladder, clamped to n_slabs."""
    ladder = np.asarray([w for w in _PANEL_WIDTHS if w < n_slabs] + [n_slabs])
    idx = np.searchsorted(ladder, wc, side="left")
    return ladder[np.minimum(idx, ladder.size - 1)]


def _round8(x: int) -> int:
    return -(-int(x) // 8) * 8


def _merge_panel_classes(wq: np.ndarray, ne: np.ndarray) -> np.ndarray:
    """Merge width classes upward when that shrinks the padded footprint.

    Every class pads its strip count to >= 8 (one kernel group); a 2-strip
    class therefore wastes 6 padded panels. Promoting its strips to the
    next width joins a bigger class — accepted whenever the summed padded
    slab footprint does not grow."""
    wq = wq.copy()
    while True:
        ws = np.unique(wq[ne])
        merged = False
        for i in range(len(ws) - 1):
            w1, w2 = int(ws[i]), int(ws[i + 1])
            c1 = int((wq == w1).sum())
            c2 = int((wq == w2).sum())
            old = _round8(max(c1, 8)) * w1 + _round8(max(c2, 8)) * w2
            new = _round8(max(c1 + c2, 8)) * w2
            if new <= old:
                wq[wq == w1] = w2
                merged = True
                break
        if not merged:
            return wq


def _panel_footprint(wq: np.ndarray, ne: np.ndarray) -> int:
    slabs = 0
    for w in np.unique(wq[ne]):
        slabs += _round8(max(int((wq == w).sum()), 8)) * int(w)
    return slabs


# Mono-panel geometry: X window size (slabs). The window block is
# double-buffered by the Pallas pipeline, so 2·(win·TK·128·4 B) must fit
# alongside panels/out in the ~16 MB VMEM: win=80 → 2×5.24 MB. Measured
# (probe_mono_tpu / probe_mono6, 2026-08-20): win 48/64/80/96 within
# tunnel noise at the headline; 80 minimizes window transitions and is
# the config of the best recorded run (0.208 ms).
MONO_WIN_SLABS = 80
# Item-width cap (slabs): the fold kernel's per-item plane-split stack is
# ~10 B/element of (W·TK, NB) and sits on top of the double-buffered X
# window + panel blocks — W=12 keeps the sum under the 16 MB scoped-vmem
# limit at tile_m=256. Wider strips accumulate over multiple items.
MONO_W_MAX = 12
MONO_ITEM_SLABS = 2
MONO_MAX_ITEMS = 48_000  # 4 prefetched int32 arrays must fit 1 MB SMEM
# Accept mono when its padded footprint is within this factor of the best
# alternative layout: the single launch + zero assembly it buys is worth
# ~0.27 ms/product (docs/TRACE.md) against bytes at ~2 B/slot.
MONO_BYTES_FACTOR = 1.35


def _mono_pieces(smin, smax, ne, win_slabs):
    """Window-split every nonempty strip's span: returns per-piece arrays
    (strip, lo, length) — pieces never cross a window boundary and are
    emitted in (strip, lo) order."""
    strips = np.nonzero(ne)[0]
    lo_s, hi_s = smin[strips], smax[strips]
    w0 = lo_s // win_slabs
    w1 = hi_s // win_slabs
    npc = (w1 - w0 + 1).astype(np.int64)
    p_strip = np.repeat(strips, npc)
    p_win = np.repeat(w0, npc) + (
        np.arange(npc.sum()) - np.repeat(np.cumsum(npc) - npc, npc)
    )
    p_lo = np.maximum(np.repeat(lo_s, npc), p_win * win_slabs)
    p_hi = np.minimum(np.repeat(hi_s, npc), (p_win + 1) * win_slabs - 1)
    return p_strip, p_lo, p_hi - p_lo + 1


def _mono_pad_strips(nrow: int, TM: int, TK: int) -> int:
    """Output row blocks a mono build covers: at least the matrix's own
    strips, padded up to whole X-windows of the *transpose* mono tiling's
    geometry (its padded X extent over ``nrow`` columns). A partner mono
    tiling of ``Aᵀ`` can then consume the raw kernel output directly —
    normal-equation chains (`ops.bsr_ops.mono_chain`) skip every pad/trim
    copy between the two launches."""
    n_slabs_t = max(-(-nrow // TK), 1)
    win = min(MONO_WIN_SLABS, n_slabs_t)
    pad_rows = -(-n_slabs_t // win) * win * TK
    pad_rows = max(pad_rows, -(-nrow // TM) * TM)
    return -(-pad_rows // TM)


def _mono_width(p_len: np.ndarray, win_slabs: int, n_empty: int):
    """Pick the uniform item width W from the panel ladder minimizing the
    modeled cost  items·(W + ITEM_SLABS)  in slab-equivalents."""
    cap = min(win_slabs, MONO_W_MAX)
    best_w, best_cost = None, None
    for w in [x for x in _PANEL_WIDTHS if x <= cap] or [cap]:
        items = int(np.sum(-(-p_len // w))) + n_empty
        cost = items * (w + MONO_ITEM_SLABS)
        if best_cost is None or cost < best_cost:
            best_w, best_cost = w, cost
    return best_w, best_cost


def _mono_item_list(p_strip, p_lo, p_len, W, win_slabs, cover_strips):
    """Chunk pieces into uniform-width items + zero items for uncovered
    strips in ``[0, cover_strips)``. Returns (it_strip, it_lo, it_win,
    it_start, first), sorted by (strip, lo)."""
    nch = (-(-p_len // W)).astype(np.int64)
    ni_real = int(nch.sum())
    it_strip = np.repeat(p_strip, nch)
    k = np.arange(ni_real) - np.repeat(np.cumsum(nch) - nch, nch)
    it_lo = np.repeat(p_lo, nch) + k * W
    it_win = it_lo // win_slabs
    # left-clamp so the whole W-wide panel stays inside the item's window
    it_start = np.minimum(it_lo, (it_win + 1) * win_slabs - W)
    empty = np.setdiff1d(
        np.arange(cover_strips, dtype=np.int64), np.unique(it_strip)
    )
    if empty.size:
        it_strip = np.concatenate([it_strip, empty])
        it_lo = np.concatenate([it_lo, np.zeros(empty.size, np.int64)])
        it_win = np.concatenate([it_win, np.zeros(empty.size, np.int64)])
        it_start = np.concatenate([it_start, np.zeros(empty.size, np.int64)])
        order = np.argsort(it_strip, kind="stable")
        it_strip, it_lo, it_win, it_start = (
            a[order] for a in (it_strip, it_lo, it_win, it_start)
        )
    ni = it_strip.size
    first = np.ones(ni, np.int32)
    first[1:] = (it_strip[1:] != it_strip[:-1]).astype(np.int32)
    return it_strip, it_lo, it_win, it_start, first


def _mono_vals(coo, is_bin_in, dtype, n, sel=None):
    """Device value vector for a (subset of the) entry list."""
    if is_bin_in:
        return jnp.ones((n,), dtype or jnp.float32)
    v = coo.vals[: coo.n_valid]
    if dtype is not None:
        v = v.astype(dtype)
    if sel is not None:
        v = jnp.take(v, jnp.asarray(sel), axis=0)
    return v


def _mono_fill(rows, cols, item, start_abs, ni, TM, TK, W, binary, vals_dev):
    """One flat device scatter of entries into (ni, TM, PK) panels."""
    lcol = cols - start_abs[item] * TK
    PK = W * TK
    PKW = PK // 32
    per = TM * (PKW if binary else PK)
    flat_size = max(ni * per + 1, 1)
    idx_dt = jnp.int32 if flat_size < 2**31 else jnp.int64
    if binary:
        slot = item * per + (rows % TM) * PKW + lcol % PKW
        bit = lcol // PKW
        flat = _fill_flat_bits(
            jnp.zeros((flat_size,), jnp.int8),
            jnp.asarray(slot, idx_dt),
            jnp.asarray(bit, jnp.int32),
            jnp.ones((slot.shape[0],), bool),
        )
        return flat[: ni * per].reshape(ni, TM, PKW)
    slot = item * per + (rows % TM) * PK + lcol
    flat = _fill_flat_vals(
        jnp.zeros((flat_size,), jnp.int8),
        jnp.asarray(slot, idx_dt),
        vals_dev,
        jnp.ones((slot.shape[0],), bool),
    )
    return flat[: ni * per].reshape(ni, TM, PK)


def _build_mono(
    rows, cols, coo, is_bin_in, binary, dtype, shape,
    n_strips, n_slabs, TM, TK, W, win_slabs,
    p_strip, p_lo, p_len, n_tiles,
) -> BsrMatrix:
    """Mono-panel build: emit the uniform-width item list (strip, window,
    start_rel, first) + one flat panel fill. See :class:`MonoPanelBucket`."""
    nrow, ncol = shape
    n_windows = max(-(-n_slabs // win_slabs), 1)

    # item list, covering the chain-padding strips past n_strips too (see
    # _mono_pad_strips): every output block is written, so the raw kernel
    # output is directly consumable
    out_strips = max(n_strips, _mono_pad_strips(nrow, TM, TK))
    it_strip, it_lo, it_win, it_start, first = _mono_item_list(
        p_strip, p_lo, p_len, W, win_slabs, out_strips
    )
    ni = it_strip.size

    # entry -> item: items sorted by (strip, lo); an entry belongs to the
    # last item of its strip whose chunk lo <= its slab
    key_it = it_strip * np.int64(n_slabs + 1) + it_lo
    strip = rows // TM
    slab = cols // TK
    key_en = strip * np.int64(n_slabs + 1) + slab
    item = np.searchsorted(key_it, key_en, side="right") - 1

    vals_dev = (
        None if binary
        else _mono_vals(coo, is_bin_in, dtype, rows.shape[0])
    )
    panels = _mono_fill(
        rows, cols, item, it_start, ni, TM, TK, W, binary, vals_dev
    )

    bucket = MonoPanelBucket(
        strip_ids=jnp.asarray(it_strip, jnp.int32),
        window=jnp.asarray(it_win, jnp.int32),
        start_rel=jnp.asarray(it_start - it_win * win_slabs, jnp.int32),
        first=jnp.asarray(first),
        panels=panels,
        width=int(W),
        win_slabs=int(win_slabs),
        n_windows=int(n_windows),
        out_strips=int(out_strips),
    )
    return BsrMatrix(
        buckets=(bucket,),
        shape=(nrow, ncol),
        nnz=int(rows.shape[0]),
        n_tiles=n_tiles,
        padded_tiles=ni * int(W),
        tile_m=TM,
        tile_k=TK,
        binary=bool(binary),
    )


MONO_GROUP_MAX = 8  # strips per grid step (halved while VMEM-over-budget)
MONO_SPILL_MAX = 0.15  # side-bucket nnz fraction above which grouped loses
HALO_STRIDE = 160  # halo-window stride cap (slabs); win = stride + gspan-1
HALO_WIN_MAX = 512  # window-slab cap (X block VMEM at narrow lanes)
# double-buffered (G, TM, PK) panel-block byte allowance per grid step
# (conservative vs the 16 MB scoped wall; probe_halo3 sweeps it)
HALO_PANEL_VMEM = 4 * 2**20


def _build_mono_halo(
    rows, cols, coo, is_bin_in, binary, dtype, shape,
    n_strips, n_slabs, TM, TK, smin, smax, ne,
):
    """Zero-spill halo-window grouped layout (narrow-RHS engine), or None.

    One uniform-width item per strip, G strips per grid step sharing one
    X window — but windows OVERLAP (stride < width): with
    ``win_slabs = stride + gspan_max - 1`` every G-strip group provably
    fits its window, so there is no spill side bucket at all (the thing
    that sank the round-3 grouped layout). The kernel consumes a halo'd
    X (`ops.bsr_ops._halo_x`). Declines when a single strip's span
    exceeds the mono width cap or the window would bust scoped VMEM.
    """
    nrow, ncol = shape
    if not ne.any():
        return None
    W_span = int((smax - smin + 1)[ne].max())
    W = int(_quantize_widths(np.asarray([W_span]), n_slabs)[0])
    if W > min(MONO_W_MAX, n_slabs) or W < W_span:
        return None  # some strip would spill regardless of windows
    PK = W * TK
    row_bytes = PK // 8 if binary else PK * (
        1 if dtype == jnp.int8 else (4 if dtype == jnp.float32 else 2)
    )
    BIG = np.int64(1) << 60
    G = MONO_GROUP_MAX
    while G >= 1:
        out_strips = max(n_strips, _mono_pad_strips(nrow, TM, TK))
        out_strips = -(-out_strips // G) * G
        ng = out_strips // G
        smin_f = np.full(out_strips, BIG, np.int64)
        smax_f = np.zeros(out_strips, np.int64)
        smin_f[:n_strips][ne] = smin[ne]
        smax_f[:n_strips][ne] = smax[ne]
        gmin = smin_f.reshape(ng, G).min(axis=1)
        gmax = smax_f.reshape(ng, G).max(axis=1)
        ne_g = gmin < BIG
        gspan = int((gmax - gmin + 1)[ne_g].max()) if ne_g.any() else 1
        stride = min(HALO_STRIDE, n_slabs)
        win_slabs = min(stride + gspan - 1, n_slabs)
        stride = min(stride, win_slabs)
        panel_ok = 2 * G * TM * row_bytes <= HALO_PANEL_VMEM
        win_ok = win_slabs <= HALO_WIN_MAX
        if panel_ok and win_ok:
            break
        G //= 2
    else:
        return None
    if G < 2:
        return None  # no grouping left — the per-item mono path is it
    n_windows = max(-(-max(n_slabs - win_slabs, 0) // stride) + 1, 1)
    gw = np.where(ne_g, np.minimum(gmin, BIG - 1) // stride, 0)
    gw = np.minimum(gw, max(n_windows - 1, 0))
    gw_s = np.repeat(gw, G)
    start = np.clip(
        np.where(smin_f < BIG, smin_f, gw_s * stride),
        gw_s * stride,
        gw_s * stride + win_slabs - W,
    )
    strip = rows // TM
    slab = cols // TK
    if ((slab < start[strip]) | (slab >= start[strip] + W)).any():
        return None  # coverage proof failed (shouldn't happen) — decline
    vals_dev = (
        None if binary
        else _mono_vals(coo, is_bin_in, dtype, rows.shape[0])
    )
    panels = _mono_fill(
        rows, cols, strip, start, out_strips, TM, TK, W, binary, vals_dev
    )
    return MonoGroupBucket(
        windows=jnp.asarray(gw, jnp.int32),
        start_rel=jnp.asarray(start - gw_s * stride, jnp.int32),
        panels=panels,
        width=int(W),
        win_slabs=int(win_slabs),
        n_windows=int(n_windows),
        group=int(G),
        out_strips=int(out_strips),
        win_stride=int(stride),
    )


def _build_mono_grouped(
    rows, cols, coo, is_bin_in, binary, dtype, shape,
    n_strips, n_slabs, TM, TK, win_slabs, smin, smax, ne, n_tiles,
    best_alt,
):
    """Grouped mono build (see :class:`MonoGroupBucket`), or None.

    One uniform-width item per strip, G-aligned groups sharing one X
    window; uncoverable entries (span > W tail, group-window clamp) spill
    to a side :class:`MonoPanelBucket`. Declines (returns None) when the
    spill fraction or the padded footprint says the plain mono/panel
    layouts are better."""
    nrow, ncol = shape
    spans = (smax - smin + 1)[ne]
    if spans.size == 0:
        return None
    W = int(np.quantile(spans, 0.95))
    W = int(_quantize_widths(
        np.asarray([W]), max(min(n_slabs, win_slabs), 1))[0])
    W = min(W, win_slabs, MONO_W_MAX)
    PK = W * TK
    row_bytes = PK // 8 if binary else PK * (
        1 if dtype == jnp.int8 else (4 if dtype == jnp.float32 else 2)
    )
    G = MONO_GROUP_MAX
    # double-buffered (G, TM, PK) panel blocks within ~4 MB
    while G > 1 and 2 * G * TM * row_bytes > 4 * 2**20:
        G //= 2
    n_windows = max(-(-n_slabs // win_slabs), 1)
    out_strips = max(n_strips, _mono_pad_strips(nrow, TM, TK))
    out_strips = -(-out_strips // G) * G
    ng = out_strips // G

    BIG = np.int64(1) << 60
    smin_f = np.full(out_strips, BIG, np.int64)
    smin_f[:n_strips][ne] = smin[ne]
    gmin = smin_f.reshape(ng, G).min(axis=1)
    gw = np.where(gmin < BIG, gmin // win_slabs, 0)
    gw = np.minimum(gw, max(n_windows - 1, 0))
    gw_s = np.repeat(gw, G)
    start = np.where(
        smin_f < BIG,
        np.minimum(smin_f, (gw_s + 1) * win_slabs - W),
        gw_s * win_slabs,
    )

    strip = rows // TM
    slab = cols // TK
    spill = slab >= start[strip] + W
    n_spill = int(spill.sum())
    if n_spill > MONO_SPILL_MAX * max(rows.shape[0], 1):
        return None

    # footprint gate BEFORE any device fill: grouped main + modeled side
    side_slabs = 0
    if n_spill:
        s_strips = strip[spill]
        s_slabs = slab[spill]
        uniq, local = np.unique(s_strips, return_inverse=True)
        k = uniq.size
        smin_s = np.full(k, np.int64(1) << 60)
        smax_s = np.zeros(k, np.int64)
        np.minimum.at(smin_s, local, s_slabs)
        np.maximum.at(smax_s, local, s_slabs)
        ne_s = np.ones(k, bool)
        p_strip_s, p_lo_s, p_len_s = _mono_pieces(
            smin_s, smax_s, ne_s, win_slabs
        )
        W_side, _ = _mono_width(p_len_s, win_slabs, 0)
        side_slabs = int(np.sum(-(-p_len_s // W_side))) * W_side
    grouped_slabs = out_strips * W + side_slabs
    if grouped_slabs > MONO_BYTES_FACTOR * max(best_alt, 1):
        return None

    vals_dev = (
        None if binary
        else _mono_vals(coo, is_bin_in, dtype, rows.shape[0])
    )
    sel_main = np.nonzero(~spill)[0]
    v_main = None
    if not binary:
        v_main = (
            vals_dev if sel_main.size == rows.shape[0]
            else jnp.take(vals_dev, jnp.asarray(sel_main), axis=0)
        )
    panels = _mono_fill(
        rows[sel_main], cols[sel_main], strip[sel_main], start,
        out_strips, TM, TK, W, binary, v_main,
    )
    main = MonoGroupBucket(
        windows=jnp.asarray(gw, jnp.int32),
        start_rel=jnp.asarray(start - gw_s * win_slabs, jnp.int32),
        panels=panels,
        width=int(W),
        win_slabs=int(win_slabs),
        n_windows=int(n_windows),
        group=int(G),
        out_strips=int(out_strips),
    )
    buckets = [main]
    if n_spill:
        it_strip, it_lo, it_win, it_start, first = _mono_item_list(
            p_strip_s, p_lo_s, p_len_s, W_side, win_slabs, k
        )
        key_it = it_strip * np.int64(n_slabs + 1) + it_lo
        key_en = local * np.int64(n_slabs + 1) + s_slabs
        item = np.searchsorted(key_it, key_en, side="right") - 1
        rows_local = local * TM + rows[spill] % TM
        sel_side = np.nonzero(spill)[0]
        v_side = (
            None if binary
            else jnp.take(vals_dev, jnp.asarray(sel_side), axis=0)
        )
        side_panels = _mono_fill(
            rows_local, cols[spill], item, it_start,
            it_strip.size, TM, TK, W_side, binary, v_side,
        )
        buckets.append(MonoPanelBucket(
            strip_ids=jnp.asarray(it_strip, jnp.int32),
            window=jnp.asarray(it_win, jnp.int32),
            start_rel=jnp.asarray(
                it_start - it_win * win_slabs, jnp.int32
            ),
            first=jnp.asarray(first),
            panels=side_panels,
            width=int(W_side),
            win_slabs=int(win_slabs),
            n_windows=int(n_windows),
            out_strips=int(k),
            strip_map=jnp.asarray(uniq, jnp.int32),
        ))
    return BsrMatrix(
        buckets=tuple(buckets),
        shape=(nrow, ncol),
        nnz=int(rows.shape[0]),
        n_tiles=n_tiles,
        padded_tiles=int(grouped_slabs),
        tile_m=TM,
        tile_k=TK,
        binary=bool(binary),
    )


def build_bsr(
    mat, config: Config = DEFAULT, dtype=None, binary=None, panels=None,
    mono_only: bool = False,
) -> BsrMatrix:
    """Compile a COO/CSR matrix into bucketed (TM × TK) tiles.

    Bucket membership (which strips, how many tiles) fixes static shapes and
    is decided host-side — it is a compile step, exactly like the reference
    deciding block boundaries in ``new_bsbm`` (SURVEY.md §2 R6). The bulk
    value/bit fill runs as one jitted device scatter.

    ``binary=None`` auto-detects: BinaryCOO/BinaryCSR inputs produce bitmask
    tiles unless ``binary=False`` forces valued tiles.

    ``mono_only=True`` returns None unless the mono-panel layout wins the
    footprint decision — callers (``linops._compile_one``) use it to probe
    whether a wide matrix can skip column segmentation entirely.
    """
    config = config.resolve()
    TM, TK = config.tile_m, config.tile_k
    if TK % 32:
        raise ValueError("tile_k must be a multiple of 32 for bitmask tiles")
    W = TK // 32

    if isinstance(mat, (CSR, BinaryCSR)):
        coo = mat.to_coo()
    elif isinstance(mat, (COO, BinaryCOO)):
        coo = mat
    else:
        raise TypeError(f"unsupported input {type(mat).__name__}")
    is_bin_in = isinstance(coo, BinaryCOO)
    int8_tiles = False
    if binary is None:
        # Valued tiles (0/1 exact) beat bitmask+expansion 2.1x on v5e
        # (the per-use VPU mask expansion dominates bitmask tiles —
        # scripts/probe_tilecost_tpu.py); bitmask remains the
        # capacity-optimal storage via Config(binary_tiles="bitmask") or
        # binary=True.
        if is_bin_in and dtype is None and config.binary_tiles in (
            "bf16", "int8",
        ):
            binary = False
            dtype = jnp.bfloat16
            # "int8" (default): panel layouts (mono AND class panels)
            # store the 0/1 values as int8 — half the panel DMA bytes;
            # the kernels cast to bf16 in-kernel (exact), measured
            # faster-or-tie at every N (SpMV 0.345 -> 0.161 ms, N=128
            # 0.406 -> 0.337, N=32 tie; interleaved mins, 2026-08-20).
            # Tile-bucket layouts keep bf16 (no cast branch there).
            int8_tiles = config.binary_tiles == "int8"
        else:
            binary = is_bin_in
    if binary and not is_bin_in:
        raise ValueError("bitmask tiles require a binary input matrix")

    nrow, ncol = coo.shape
    n_strips = -(-nrow // TM)
    n_slabs = max(-(-ncol // TK), 1)

    rows = np.asarray(coo.rows)[: coo.n_valid].astype(np.int64)
    cols = np.asarray(coo.cols)[: coo.n_valid].astype(np.int64)
    strip = rows // TM
    slab = cols // TK
    pair = strip * n_slabs + slab

    # Unique occupied tiles, their strip, and each entry's tile rank.
    upair, inv = np.unique(pair, return_inverse=True)
    ustrip = upair // n_slabs
    uslab = (upair % n_slabs).astype(np.int32)
    tiles_per_strip = np.bincount(ustrip, minlength=n_strips)
    # rank of each unique tile within its strip (upair sorted => grouped)
    first_of_strip = np.zeros(n_strips, np.int64)
    np.cumsum(tiles_per_strip[:-1], out=first_of_strip[1:])
    urank = np.arange(upair.size) - first_of_strip[ustrip]

    # Bucket strips by padded tile count.
    widths = sorted(set(int(t) for t in config.bsr_bucket_tiles))
    max_needed = int(tiles_per_strip.max()) if upair.size else 1
    if max_needed > widths[-1]:
        widths.append(_ceil_pow2(max_needed))
    T_of_strip = np.zeros(n_strips, np.int64)
    for w in reversed(widths):
        T_of_strip[tiles_per_strip <= w] = w
    T_of_strip[tiles_per_strip == 0] = 0

    buckets_meta = []  # (T, strips_in_bucket, ns_padded, flat_tile_base)
    tile_base_of_strip = np.zeros(n_strips, np.int64)
    flat_tiles = 0
    for w in widths:
        strips_b = np.nonzero(T_of_strip == w)[0]
        if strips_b.size == 0:
            continue
        # power-of-two ns: bounded program-shape set (compile-cache reuse)
        ns = _ceil_pow2(max(strips_b.size, 8))
        buckets_meta.append((w, strips_b, ns, flat_tiles))
        tile_base_of_strip[strips_b] = flat_tiles + np.arange(strips_b.size) * w
        flat_tiles += ns * w

    # --- panel layout: one (TM, W·TK) block per strip when occupied slabs
    # are (nearly) contiguous. Chosen when its padded slab footprint beats
    # the pow2 tile buckets' (banded/clustered structure wins by ~2x;
    # scattered structure keeps tiles).
    if panels is None and getattr(config, "bsr_panels", "off") == "auto":
        panels = None  # decide by footprint below
    elif panels is None:
        panels = False
    # Per-class panels need the FULL X panel VMEM-resident: gate on the
    # residency caps the operator segments to. Mono panels window X per
    # strip instead, so they carry no width cap at all. With the in-kernel
    # fp32-parity fold the panel kernel's resident X is plain f32
    # (4 B/elem) even for exact-bf16 tiles, so the f32 cap applies; only
    # the legacy pre-split 3-plane layout (6 B/elem) needs the tighter cap.
    from ..config import BSR_SEG_COLS_BINARY3, BSR_SEG_COLS_F32
    from ..ops.bsr_ops import PANEL_FOLD_IN_KERNEL

    exact_bf16 = binary or (
        dtype is not None and jnp.dtype(dtype) == jnp.bfloat16
    )
    cap_cols = (
        BSR_SEG_COLS_F32
        if (PANEL_FOLD_IN_KERNEL or not exact_bf16)
        else BSR_SEG_COLS_BINARY3
    )
    classes_ok = n_slabs * TK <= cap_cols
    mono_mode = getattr(config, "bsr_mono", "off")
    if (panels is not False or mono_mode == "force") and upair.size:
        last = first_of_strip + np.maximum(tiles_per_strip - 1, 0)
        smin = np.zeros(n_strips, np.int64)
        smax = np.zeros(n_strips, np.int64)
        ne = tiles_per_strip > 0  # nonempty strips
        smin[ne] = uslab[first_of_strip[ne]]
        smax[ne] = uslab[last[ne]]
        wq = np.zeros(n_strips, np.int64)
        wq[ne] = _quantize_widths((smax - smin + 1)[ne], n_slabs)
        wq = _merge_panel_classes(wq, ne)
        # class panels ineligible when any strip needs a fold-kernel
        # width past the VMEM-stack cap (falls back to tile buckets)
        panel_slabs = (
            _panel_footprint(wq, ne)
            if (not ne.any() or int(wq[ne].max()) <= PANEL_W_MAX)
            else 0
        )
        # mono candidate: uniform width, window-split pieces
        mono_plan = None
        if mono_mode in ("auto", "force"):
            win_slabs = min(MONO_WIN_SLABS, n_slabs)
            p_strip, p_lo, p_len = _mono_pieces(smin, smax, ne, win_slabs)
            W, _ = _mono_width(p_len, win_slabs, int((~ne).sum()))
            n_items = int(np.sum(-(-p_len // W))) + int((~ne).sum())
            mono_slabs = n_items * W
            if n_items <= MONO_MAX_ITEMS:
                mono_plan = (W, win_slabs, p_strip, p_lo, p_len, mono_slabs)
        best_alt = min(flat_tiles, panel_slabs) if panel_slabs else flat_tiles
        if mono_plan is not None and (
            mono_mode == "force"
            or mono_plan[5] <= MONO_BYTES_FACTOR * max(best_alt, 1)
        ):
            W, win_slabs, p_strip, p_lo, p_len, _ = mono_plan
            # grouped is opt-in (probe_mono4: the spill side launch + Y
            # scatter-add cost more than G-grouping saves on real data)
            g = None
            mono_dtype = jnp.int8 if int8_tiles else dtype
            if getattr(config, "bsr_mono_grouped", False):
                g = _build_mono_grouped(
                    rows, cols, coo, is_bin_in, binary, mono_dtype,
                    (nrow, ncol), n_strips, n_slabs, TM, TK, win_slabs,
                    smin, smax, ne, int(upair.size),
                    best_alt if mono_mode != "force" else mono_plan[5],
                )
            if g is not None:
                return g
            m = _build_mono(
                rows, cols, coo, is_bin_in, binary, mono_dtype,
                (nrow, ncol), n_strips, n_slabs, TM, TK, W, win_slabs,
                p_strip, p_lo, p_len, int(upair.size),
            )
            # narrow-RHS halo engine rides alongside the main layout
            # (extra HBM, zero extra bytes per wide product; used by
            # SpMV/N<=8 dispatch only — ops.bsr_ops._mono_impl)
            h = _build_mono_halo(
                rows, cols, coo, is_bin_in, binary, mono_dtype,
                (nrow, ncol), n_strips, n_slabs, TM, TK, smin, smax, ne,
            )
            if h is not None:
                m = dataclasses.replace(m, narrow=h)
            return m
        if mono_only:
            return None
        # ties go to panels: equal bytes, ~5x less per-tile fixed overhead
        if (
            classes_ok or panels is True
        ) and panels is not False and (
            panels is True
            or (panel_slabs > 0 and panel_slabs <= flat_tiles)
        ):
            return _build_panels(
                rows, cols, coo, is_bin_in, binary,
                jnp.int8 if int8_tiles else dtype,
                (nrow, ncol), n_strips, n_slabs, TM, TK, wq, smin,
                int(upair.size),
            )
    if mono_only:
        return None

    # Destination tile slot of every unique tile, then of every entry.
    tile_slot_of_u = tile_base_of_strip[ustrip] + urank
    tslot = tile_slot_of_u[inv]
    within = (rows % TM) * TK + (cols % TK)

    flat_size = max(flat_tiles * TM * (W if binary else TK) + 1, 1)
    if binary:
        slot = tslot * (TM * W) + (rows % TM) * W + (cols % TK) % W
        bit = (cols % TK) // W
        idx_dt = jnp.int32 if flat_size < 2**31 else jnp.int64
        flat = _fill_flat_bits(
            jnp.zeros((flat_size,), jnp.int8),
            jnp.asarray(slot, idx_dt),
            jnp.asarray(bit, jnp.int32),
            jnp.ones((slot.shape[0],), bool),
        )
    else:
        slot = tslot * (TM * TK) + within
        if is_bin_in:
            vals_dev = jnp.ones((rows.shape[0],), dtype or jnp.float32)
        else:
            vals_dev = coo.vals[: coo.n_valid]
            if dtype is not None:
                vals_dev = vals_dev.astype(dtype)
        idx_dt = jnp.int32 if flat_size < 2**31 else jnp.int64
        flat = _fill_flat_vals(
            jnp.zeros((flat_size,), jnp.int8),
            jnp.asarray(slot, idx_dt),
            vals_dev,
            jnp.ones((slot.shape[0],), bool),
        )

    # Slab-id table (host) and per-bucket slicing of the flat fill.
    slab_of_tileslot = np.zeros(max(flat_tiles, 1), np.int32)
    slab_of_tileslot[tile_slot_of_u] = uslab
    buckets = []
    padded_tiles = 0
    inner = TM * (W if binary else TK)
    for w, strips_b, ns, base in buckets_meta:
        strip_ids = np.full(ns, n_strips, np.int32)
        strip_ids[: strips_b.size] = strips_b
        slab_ids = slab_of_tileslot[base : base + ns * w].reshape(ns, w)
        tiles_b = jax.lax.dynamic_slice(
            flat, (base * inner,), (ns * w * inner,)
        ).reshape(ns, w, TM, W if binary else TK)
        buckets.append(
            BsrBucket(
                strip_ids=jnp.asarray(strip_ids),
                slab_ids=jnp.asarray(slab_ids),
                tiles=tiles_b,
                ntiles=w,
            )
        )
        padded_tiles += ns * w

    return BsrMatrix(
        buckets=tuple(buckets),
        shape=(nrow, ncol),
        nnz=int(rows.shape[0]),
        n_tiles=int(upair.size),
        padded_tiles=padded_tiles,
        tile_m=TM,
        tile_k=TK,
        binary=bool(binary),
    )


def _mono_shard_stats(rows, cols, n_strips, n_slabs, TM, TK):
    """Host strip stats for one shard: (smin, smax, ne, n_occupied_tiles)."""
    strip = rows // TM
    slab = cols // TK
    upair = np.unique(strip * np.int64(n_slabs) + slab)
    ustrip = (upair // n_slabs).astype(np.int64)
    uslab = (upair % n_slabs).astype(np.int64)
    BIG = np.int64(1) << 60
    smin = np.full(n_strips, BIG, np.int64)
    smax = np.zeros(n_strips, np.int64)
    np.minimum.at(smin, ustrip, uslab)
    np.maximum.at(smax, ustrip, uslab)
    ne = smin < BIG
    smin[~ne] = 0
    return smin, smax, ne, int(upair.size)


def _pad_mono_items(A: BsrMatrix, ni_max: int) -> BsrMatrix:
    """Append zero items so the bucket holds exactly ``ni_max`` items.

    Padding items accumulate a zero panel into the LAST output strip
    (``first=0`` — the block is already initialized by its real first
    item) and reuse the last real item's X window, so they cost no extra
    window DMA. Item order stays sorted by strip."""
    import dataclasses

    b = A.buckets[0]
    ni = b.ns
    if ni == ni_max:
        return A
    pad = ni_max - ni
    last_strip = jnp.full((pad,), int(b.out_strips) - 1, jnp.int32)
    last_win = jnp.broadcast_to(b.window[-1], (pad,))
    bucket = dataclasses.replace(
        b,
        strip_ids=jnp.concatenate([b.strip_ids, last_strip]),
        window=jnp.concatenate([b.window, last_win]),
        start_rel=jnp.concatenate(
            [b.start_rel, jnp.zeros((pad,), jnp.int32)]
        ),
        first=jnp.concatenate([b.first, jnp.zeros((pad,), jnp.int32)]),
        panels=jnp.concatenate(
            [b.panels, jnp.zeros((pad,) + b.panels.shape[1:], b.panels.dtype)]
        ),
    )
    return dataclasses.replace(A, buckets=(bucket,))


# Accept uniform mono shards while their padded slab footprint stays
# within this factor of the occupied-tile lower bound (scattered
# structure blows the span-based mono footprint up — shards then fall
# back to the tile-bucket layout, exactly like the single-chip decision).
MONO_SHARD_BYTES_FACTOR = 2.0


def build_bsr_mono_uniform(
    coos, config: Config = DEFAULT, dtype=None
):
    """Mono tilings of several SAME-SHAPE matrices sharing one static
    geometry — the SPMD shard layout for the flagship mono engine.

    `shard_map` needs identical local shapes on every device, so all
    shards share (W, win_slabs, n_windows, out_strips) and pad their item
    lists to a common ``ni`` (`_pad_mono_items`). The item width is chosen
    from the POOLED piece-length distribution; per-shard panel fills then
    run the normal `_build_mono` device scatter. Returns a list of
    BsrMatrix (one per input, uniform pytree shapes) or None when the
    mono footprint loses to tile buckets / exceeds the SMEM item budget
    (callers fall back to the pre-mono stacked tile-bucket layout).

    TPU-native replacement for the reference's per-thread row blocks
    (SURVEY.md §3.4) with the round-3 single-launch layout: each shard's
    product is ONE kernel launch inside `shard_map`.
    """
    config = config.resolve()
    TM, TK = config.tile_m, config.tile_k
    shape = tuple(coos[0].shape)
    if any(tuple(c.shape) != shape for c in coos):
        raise ValueError("mono shard inputs must share one shape")
    nrow, ncol = shape
    n_strips = -(-nrow // TM)
    n_slabs = max(-(-ncol // TK), 1)
    win_slabs = min(MONO_WIN_SLABS, n_slabs)

    per_shard = []
    pooled_len = []
    n_items_tot = 0
    n_tiles_tot = 0
    n_empty_tot = 0
    for c in coos:
        rows = np.asarray(c.rows)[: c.n_valid].astype(np.int64)
        cols = np.asarray(c.cols)[: c.n_valid].astype(np.int64)
        smin, smax, ne, nt = _mono_shard_stats(
            rows, cols, n_strips, n_slabs, TM, TK
        )
        p_strip, p_lo, p_len = _mono_pieces(smin, smax, ne, win_slabs)
        per_shard.append((rows, cols, p_strip, p_lo, p_len, nt))
        pooled_len.append(p_len)
        n_tiles_tot += nt
        n_empty_tot += int((~ne).sum())
    pooled = (
        np.concatenate(pooled_len) if pooled_len else np.zeros(0, np.int64)
    )
    W, _ = _mono_width(pooled, win_slabs, n_empty_tot)
    W = min(W, win_slabs, MONO_W_MAX)
    out_strips = max(n_strips, _mono_pad_strips(nrow, TM, TK))
    ni_list = [
        int(np.sum(-(-p_len // W)))
        + max(out_strips - np.unique(p_strip).size, 0)
        for (_, _, p_strip, _, p_len, _) in per_shard
    ]
    if max(ni_list, default=0) > MONO_MAX_ITEMS:
        return None
    mono_slabs = sum(
        int(np.sum(-(-p_len // W))) for (_, _, _, _, p_len, _) in per_shard
    ) * W
    if mono_slabs > MONO_SHARD_BYTES_FACTOR * max(n_tiles_tot, 1):
        return None

    mats = []
    for c, (rows, cols, p_strip, p_lo, p_len, nt) in zip(coos, per_shard):
        is_bin_in = isinstance(c, BinaryCOO)
        A = _build_mono(
            rows, cols, c, is_bin_in, False, dtype, shape,
            n_strips, n_slabs, TM, TK, W, win_slabs,
            p_strip, p_lo, p_len, nt,
        )
        mats.append(A)
    ni_max = max(A.buckets[0].ns for A in mats)
    return [_pad_mono_items(A, ni_max) for A in mats]


def _build_panels(
    rows, cols, coo, is_bin_in, binary, dtype, shape,
    n_strips, n_slabs, TM, TK, wq, smin, n_tiles,
) -> BsrMatrix:
    """Panel-layout build: one contiguous (TM, W·TK) block per strip.

    ``wq[s]`` is strip ``s``'s ladder-quantized slab width (0 = empty),
    ``smin[s]`` its first occupied slab. Strips are grouped by width into
    :class:`PanelBucket`s; the bulk fill is the same single jitted device
    scatter as the tile path, with per-strip flat offsets."""
    nrow, ncol = shape
    ne = wq > 0
    classes = np.unique(wq[ne]) if ne.any() else np.asarray([1], np.int64)

    # panel start: clamped so start + W <= n_slabs (X slices stay in-bounds)
    start = np.zeros(n_strips, np.int64)
    start[ne] = np.minimum(smin[ne], n_slabs - wq[ne])

    base = np.zeros(n_strips, np.int64)  # flat element offset of each panel
    meta = []  # (W, strips_c, ns_pad, class_base_elems)
    off = 0
    for w in classes:
        strips_c = np.nonzero(wq == w)[0]
        ns_pad = _round8(max(strips_c.size, 8))
        per = TM * ((int(w) * TK) // 32 if binary else int(w) * TK)
        meta.append((int(w), strips_c, ns_pad, off))
        base[strips_c] = off + np.arange(strips_c.size) * per
        off += ns_pad * per

    flat_size = max(off + 1, 1)
    idx_dt = jnp.int32 if flat_size < 2**31 else jnp.int64
    strip = rows // TM
    lcol = cols - start[strip] * TK  # column within the strip's panel
    if binary:
        wrd = (wq * TK) // 32
        w_s = wrd[strip]
        slot = base[strip] + (rows % TM) * w_s + lcol % w_s
        bit = lcol // w_s
        flat = _fill_flat_bits(
            jnp.zeros((flat_size,), jnp.int8),
            jnp.asarray(slot, idx_dt),
            jnp.asarray(bit, jnp.int32),
            jnp.ones((slot.shape[0],), bool),
        )
    else:
        slot = base[strip] + (rows % TM) * (wq[strip] * TK) + lcol
        if is_bin_in:
            vals_dev = jnp.ones((rows.shape[0],), dtype or jnp.float32)
        else:
            vals_dev = coo.vals[: coo.n_valid]
            if dtype is not None:
                vals_dev = vals_dev.astype(dtype)
        flat = _fill_flat_vals(
            jnp.zeros((flat_size,), jnp.int8),
            jnp.asarray(slot, idx_dt),
            vals_dev,
            jnp.ones((slot.shape[0],), bool),
        )

    buckets = []
    padded = 0
    for w, strips_c, ns_pad, cbase in meta:
        last = (w * TK) // 32 if binary else w * TK
        per = TM * last
        strip_ids = np.full(ns_pad, n_strips, np.int32)
        strip_ids[: strips_c.size] = strips_c
        st = np.zeros(ns_pad, np.int32)
        st[: strips_c.size] = start[strips_c]
        panels_b = jax.lax.dynamic_slice(
            flat, (cbase,), (ns_pad * per,)
        ).reshape(ns_pad, TM, last)
        buckets.append(
            PanelBucket(
                strip_ids=jnp.asarray(strip_ids),
                start_slab=jnp.asarray(st),
                panels=panels_b,
                width=w,
            )
        )
        padded += ns_pad * w
    return BsrMatrix(
        buckets=tuple(buckets),
        shape=(nrow, ncol),
        nnz=int(rows.shape[0]),
        n_tiles=n_tiles,
        padded_tiles=padded,
        tile_m=TM,
        tile_k=TK,
        binary=bool(binary),
    )
