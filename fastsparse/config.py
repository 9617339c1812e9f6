"""Global configuration for fastsparse.

The reference C library's only knobs were compile-time constants and
``OMP_NUM_THREADS`` (SURVEY.md §5.6). The TPU-native equivalents — tile
shapes, bucket edges, dtypes, mesh axis names — live in one small frozen
dataclass passed explicitly (or defaulted) rather than a flag framework.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax.numpy as jnp


def sublanes_for(dtype) -> int:
    """Minimum sublane count (second-to-last dim tile) for a dtype on TPU."""
    dtype = jnp.dtype(dtype)
    if dtype.itemsize >= 4:
        return 8
    if dtype.itemsize == 2:
        return 16
    return 32


LANES = 128  # TPU lane width: last-dim tiling unit for every dtype.

# Column count above which execution formats segment the X panel. Chosen so
# an unsegmented (ncol, 128) f32 panel fits the 12 MB VMEM residency budget
# (segmentation splits rows across segments and ~doubles bucket padding).
SEG_COLS = 24064

# X-residency column caps per BSR kernel path (12 MB budget, n_block=128):
# pre-split planes_n ships X as 3 stacked bf16 planes (6 B/element) ->
# 16384 cols exactly; f32 X (plain, or the panel kernels' in-kernel
# fp32-parity fold) -> 24576. Segments wider than the cap fall back to the
# slower streamed/expand kernels — the caps keep segments resident.
BSR_SEG_COLS_BINARY3 = 16384
BSR_SEG_COLS_F32 = 24576


@dataclasses.dataclass(frozen=True)
class Config:
    """Tuning knobs for format compilation and kernels.

    Attributes:
      tile_m: rows per row-strip in tiled formats. ``None`` (the default)
        means *auto*: `operator()` picks the modeled-best height for the
        matrix (`bench.model.best_tile_m` — measured up to 6x faster than
        a pinned 8 on banded structure); direct builder calls resolve
        ``None`` to the fp32 sublane count (8) via :meth:`resolve`. Set an
        int only to pin the height explicitly.
      tile_k: columns per column-slab. Always a multiple of the 128-lane
        width so slabs map directly onto VPU/MXU tiles.
      ell_bucket_widths: allowed padded nnz-per-row widths for the bucketed
        ELL format (ascending). Rows land in the smallest bucket that fits;
        rows longer than the last width spill into an overflow COO tail.
      bsr_bucket_tiles: allowed tiles-per-strip counts for tiled BSR buckets.
      rhs_panel: default number of RHS columns processed per SpMM panel.
      mesh_axis: name of the 1-D device-mesh axis used for row partitioning.
      binary_tiles: tile storage for binary matrices on the BSR/MXU path —
        "int8" (default: int8 mono panels, bf16 elsewhere), "bf16", or
        "bitmask" (32x smaller; see below).
    """

    tile_m: Optional[int] = None
    tile_k: int = LANES
    # Denser-than-pow2 ladder: the gather engine is slot-bound
    # (~1.6 ns/padded-slot), so width rounding is a first-order cost —
    # pow2 measured 1.40x allocated/raw on powerlaw 65k², this ladder
    # 1.11x. Every width keeps a divisor ≤ 16 so the kernel's unroll
    # (`ell_spmm._pick_kb`) stays wide.
    ell_bucket_widths: Tuple[int, ...] = (
        1, 2, 3, 4, 6, 8, 12, 16, 20, 24, 32, 40, 48, 64, 80, 96,
        128, 160, 192, 256, 384, 512,
    )
    # Sub-row splitting width for the f32 gather engine: rows longer than
    # this split into virtual sub-rows of <= this many slots, each a
    # separate bucket row sharing the original row id (the Y assembly
    # sums duplicates). Keeps every bucket on the full-unroll packed
    # kernel body — measured 0.91 ns/slot vs the chunked body's 1.25
    # (probe_gather6, v5e 2026-08-21). Applied by the f32 compile paths
    # only; fp64-class (dd) builds never split (their exactness needs
    # one bucket row per matrix row per segment). 0 disables.
    ell_split_rows: int = 64
    bsr_bucket_tiles: Tuple[int, ...] = (1, 2, 4, 8, 16, 32, 64, 128, 256, 512)
    rhs_panel: int = 128
    mesh_axis: str = "rows"
    # Tile storage for *binary* matrices on the MXU (BSR) path:
    #   "int8"    — (default) 0/1 values stored as int8 on MONO layouts
    #               (1 B/slot; the mono kernel casts to bf16 in-kernel,
    #               exact). Measured faster-or-tie at every RHS width on
    #               v5e (SpMV 0.345 -> 0.161 ms, N=128 0.406 -> 0.337,
    #               N=32 tie; interleaved-min A/B 2026-08-20). Non-mono
    #               layouts fall back to bf16 tiles.
    #   "bf16"    — 0/1 values stored as bf16 (exact). 2 B/slot of HBM but
    #               no per-use mask expansion; measured v5e headline
    #               (banded 50k bw512 N=128, tm=128): 1.66 ms vs 3.39 ms —
    #               the VPU expansion, not MXU passes, dominated bitmask
    #               tiles (scripts/probe_tilecost_tpu.py).
    #   "bitmask" — 1 bit/slot (32x less A traffic/storage); best when HBM
    #               capacity or tile-DMA bandwidth is the binding limit.
    binary_tiles: str = "int8"
    # Row-strip panels ("auto"/"off"): when a strip's occupied column slabs
    # are (nearly) contiguous — banded/clustered structure — store the strip
    # as ONE (TM, W·TK) panel with a start slab instead of W separate tiles.
    # Kills the pow2 tiles-per-strip bucket padding AND runs one dynamic
    # slice + one wide MXU dot per strip instead of per tile. "auto"
    # compares padded slab footprints and picks the smaller layout.
    bsr_panels: str = "auto"
    # Mono-panel layout ("auto"/"off"/"force"): ONE uniform-width panel
    # work list for the whole matrix, executed by a single kernel launch
    # with per-strip X windows and in-place output (no column segments, no
    # per-class launches, no assembly — kills the measured ~0.27 ms fixed
    # per-product overhead). "auto" picks it when its padded footprint is
    # within MONO_BYTES_FACTOR of the best alternative layout.
    bsr_mono: str = "auto"
    # Grouped mono (G strips per grid step + spill side bucket): measured
    # SLOWER than the plain mono item list on the real chip (the side
    # launch + Y scatter-add costs more than grouping saves — 0.599 vs
    # 0.338 ms on the banded headline, probe_mono4 2026-08-20). Kept as
    # an opt-in for spill-free structures.
    bsr_mono_grouped: bool = False

    def resolve(self, tile_m: int = 8) -> "Config":
        """Resolve the ``tile_m=None`` auto sentinel to a concrete height.

        Builders that need an int (``build_bsr`` etc.) call this with the
        baseline 8; `operator()` substitutes the modeled-best height
        instead. A config with ``tile_m`` already set returns unchanged —
        field-for-field equality with DEFAULT is what matters, never
        object identity (``Config()`` and ``DEFAULT`` behave the same).
        """
        if self.tile_m is not None:
            return self
        return dataclasses.replace(self, tile_m=tile_m)


DEFAULT = Config()
