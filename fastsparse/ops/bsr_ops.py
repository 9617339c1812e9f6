"""BsrMatrix SpMM / SpMV dispatch: padding, bucket loop, strip scatter.

Bridges the format (`formats.bsr.BsrMatrix`) to the Pallas kernels
(`ops.pallas.bsr_spmm`): pads X to slab/lane multiples, runs one compiled
kernel per bucket (one compilation per bucket shape — BASELINE.json:5), and
scatters per-bucket strip outputs into the global Y. Strips are disjoint
across buckets (each row-strip lives in exactly one bucket), so the scatter
is add-free of races by construction — the TPU analog of the reference's
row-block ownership (SURVEY.md §3.4).

Pallas runs f32/bf16; f64 inputs fall back to the XLA COO engines
(TPU f64 is emulated — SURVEY.md §7.3 item 4 keeps fp64 correct-but-slow).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..formats.bsr import BsrMatrix, MonoPanelBucket, PanelBucket
from ..utils.profiling import named
from .assemble import bsr_layout_key as _asm_bsr_layout_key
from .pallas.bsr_spmm import (
    bucket_spmm,
    bucket_spmv,
    mono_group_spmm,
    mono_panel_spmm,
    panel_spmm,
    pick_strategy,
)

__all__ = ["bsr_spmm", "bsr_spmv"]

LANES = 128

_PALLAS_DTYPES = (jnp.float32, jnp.bfloat16)

# slab_ids are scalar-prefetched into SMEM (1 MB/core); cap entries per call.
_SMEM_IDX_BUDGET = 64 * 1024  # int32 entries -> 256 KB
# fp32-parity planes for panel kernels: split in-kernel (True) instead of
# pre-splitting X at the XLA level (False) — see _prep_panel_x.
PANEL_FOLD_IN_KERNEL = True

# Mono pre-stacked-planes budget, in conservatively-doubled block bytes
# (window + panel + out, x2 for double buffering). The headline config
# (win=80, tm=256, W=6 int8) computes 16.4 MB by this accounting and is
# measured to lower and win (the true occupancy is evidently below the
# 16 MB scoped-VMEM wall — not everything double-buffers); anything
# bigger is unproven and falls back to the in-kernel split.
MONO_PREFOLD_VMEM = int(16.5 * 2**20)

# X encoding for the fp32-parity mono paths over int8 panels:
#   "int8" — (default) radix-256 3-plane quantization: per RHS column j,
#           x ≈ (q0·2^16 + q1·2^8 + q2)·s_j with int8 planes and
#           s_j = colmax_j/(127·2^16). Element error ≤ ~colmax_j·1.2e-7 —
#           the same accuracy class as the bf16 3-plane split (measured
#           headline rel 1.8e-7 vs 0.9e-7, both ≪ the 1e-6 bar) — but
#           each plane is ONE s8×s8→s32 MXU pass at 2× the bf16 rate:
#           headline busy 0.254 → 0.182 ms (probe_i8x3_tpu, 2026-08-20).
#           The int8 window block is also 2× smaller than the bf16 plane
#           block, ending the prefold path's 16.10M scoped-vmem
#           marginality. Caveat: accuracy is absolute per column (tiny
#           elements in huge columns carry ~colmax·1.2e-7 error, not a
#           relative 2^-24) — set "bf16" for per-element-relative planes.
#   "bf16" — the round-3 behavior (3 bf16 planes, prefold or in-kernel).
MONO_X_PLANES = "int8"

# Wide-N int8 kernel shape: "i8" = 3 separate s8 dots per item (one per
# radix plane), "i8w" = ONE wide s8 dot over all 3 plane blocks + an
# in-kernel fold — a single MXU issue per item, measured faster in all
# three interleaved A/B pairs (0.173-0.177 vs 0.178-0.205 ms headline
# busy, probe_i8w_tpu 2026-08-21) at identical rel. Default.
MONO_I8_FOLD = "i8w"


from ..utils.shapes import round_up as _round_up


def _bucket_ranges(ns: int, T: int):
    """Chunk ranges (s0, s1, n_pad) for one bucket under the SMEM budget."""
    ns_max = max(8, (_SMEM_IDX_BUDGET // max(T, 1)) // 8 * 8)
    if ns <= ns_max:
        yield 0, ns, ns
        return
    for s0 in range(0, ns, ns_max):
        yield s0, min(s0 + ns_max, ns), ns_max


def _bsr_layout(A):
    """THE part-chunk layout of a BsrMatrix — single source consumed by
    the compute path, the strip-plan builder (`ops.assemble`), and tests.
    Yields ``(bucket, s0, s1, n_pad)``: the part covers bucket strip rows
    [s0, s1) padded to n_pad."""
    for b in A.buckets:
        if isinstance(b, PanelBucket):
            ns, T = b.ns, 1  # one SMEM entry (start slab) per strip
        else:
            ns, T = b.slab_ids.shape
        for s0, s1, n_pad in _bucket_ranges(ns, T):
            yield b, s0, s1, n_pad


def _slice_bsr_chunk(b, dump_strip: int, s0: int, s1: int, n_pad: int):
    """Device slice of bucket strip rows [s0, s1) padded to n_pad (padding
    rows: slab 0, zero tiles, strip id = the caller's dump strip)."""
    ns, T = b.slab_ids.shape
    if (s0, s1, n_pad) == (0, ns, ns):
        return b.strip_ids, b.slab_ids, b.tiles
    strip = b.strip_ids[s0:s1]
    slab = b.slab_ids[s0:s1]
    tiles = b.tiles[s0:s1]
    if s1 - s0 < n_pad:
        pad = n_pad - (s1 - s0)
        strip = jnp.concatenate(
            [strip, jnp.full((pad,), dump_strip, strip.dtype)]
        )
        slab = jnp.concatenate([slab, jnp.zeros((pad, T), slab.dtype)])
        tiles = jnp.concatenate(
            [tiles, jnp.zeros((pad,) + tiles.shape[1:], tiles.dtype)]
        )
    return strip, slab, tiles


def _bucket_chunks(b, dump_strip: int):
    """Split a bucket into fixed-``ns`` chunks whose slab_ids fit SMEM.

    All chunks of a bucket share one shape -> one compiled program per
    bucket width regardless of bucket size.
    """
    ns, T = b.slab_ids.shape
    for s0, s1, n_pad in _bucket_ranges(ns, T):
        yield _slice_bsr_chunk(b, dump_strip, s0, s1, n_pad)


def _slice_panel_chunk(b: PanelBucket, dump_strip: int, s0: int, s1: int, n_pad: int):
    """Device slice of panel strips [s0, s1) padded to n_pad (padding rows:
    start slab 0, zero panels, strip id = the caller's dump strip)."""
    ns = b.ns
    if (s0, s1, n_pad) == (0, ns, ns):
        return b.strip_ids, b.start_slab, b.panels
    strip = b.strip_ids[s0:s1]
    start = b.start_slab[s0:s1]
    panels = b.panels[s0:s1]
    if s1 - s0 < n_pad:
        pad = n_pad - (s1 - s0)
        strip = jnp.concatenate(
            [strip, jnp.full((pad,), dump_strip, strip.dtype)]
        )
        start = jnp.concatenate([start, jnp.zeros((pad,), start.dtype)])
        panels = jnp.concatenate(
            [panels, jnp.zeros((pad,) + panels.shape[1:], panels.dtype)]
        )
    return strip, start, panels


def pallas_supported(dtype) -> bool:
    return jnp.dtype(dtype) in (jnp.dtype(d) for d in _PALLAS_DTYPES)


def binary_plane_path(tile_m: int) -> str:
    """Kernel body for the binary HIGHEST resident path (see
    `pallas.bsr_spmm.bucket_spmm`). ``planes_n`` (3 bf16 X planes along
    lanes, one wide dot per tile) won the 2026-08-17 A/B at every tile
    height; ``planes_k``/``expand`` remain selectable for probes."""
    return "planes_n"


def _split_bf16_planes(Xp):
    """f32 (K, N) -> (hi, h1, x2) bf16 planes with hi+h1+x2 ≈ x (~24 bits).

    Split via mantissa bit-masking, NOT bf16 cast round-trips: the
    terminal forces --xla_allow_excess_precision, which elides
    bf16->f32->subtract chains and collapses the planes to one.
    """
    u = jax.lax.bitcast_convert_type(Xp, jnp.uint32)
    hi = jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = Xp - hi  # exact: hi carries the top 16 bits
    u1 = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    h1 = jax.lax.bitcast_convert_type(u1 & jnp.uint32(0xFFFF0000), jnp.float32)
    x2 = r1 - h1  # exact residual (rounded once by the bf16 cast below)
    # hi/h1 casts are exact (already bf16-representable)
    return (
        hi.astype(jnp.bfloat16),
        h1.astype(jnp.bfloat16),
        x2.astype(jnp.bfloat16),
    )


def _stack_planes(Xp, NB: int, Npad: int):
    """f32 (K, Npad) -> bf16 (K, 3·Npad): fp32-parity planes stacked along
    lanes per NB-panel, layout ``[x0_j | x1_j | x2_j]`` (the planes_n /
    fold=True kernel layout)."""
    hi, h1, x2 = _split_bf16_planes(Xp)
    K_all = Xp.shape[0]
    nj = Npad // NB
    return (
        jnp.stack([p.reshape(K_all, nj, NB) for p in (hi, h1, x2)], axis=2)
        .reshape(K_all, nj * 3 * NB)
    )


def bsr_spmm(
    A: BsrMatrix,
    X,
    *,
    n_block: int | None = None,
    precision: str = "highest",
    binary_path: str | None = None,
    _parts: bool = False,
) -> jax.Array:
    """``Y = A @ X`` via the Pallas tile kernels. X: dtype[ncol, N].

    ``_parts=True`` (internal, `colseg_spmm`) returns the raw
    ``(sids, parts, Npad, nq)`` strip panels instead of assembling Y."""
    X = jnp.asarray(X)
    nrow, ncol = A.shape
    N = X.shape[1]
    TM, TK = A.tile_m, A.tile_k
    nsp, nsl = A.n_strips, A.n_slabs

    if not pallas_supported(X.dtype):
        if _parts:
            raise TypeError("_parts requires a Pallas-supported X dtype")
        from .spmm import spmm as coo_spmm

        # correctness fallback (fp64 etc.) through the XLA engine
        return coo_spmm(_as_coo(A), X)

    if A.is_mono:
        if _parts:
            raise TypeError("mono-panel layouts are never column segments")
        return _mono_impl(A, X, precision)
    if A.is_panel:
        return _panel_impl(A, X, precision, _parts=_parts)

    # Narrow-RHS fast path for bf16-valued tiles (fp32 parity): all three
    # bf16 X planes fit ONE 128-lane block, so each tile costs one MXU
    # pass instead of planes_n's three. Covers SpMV and the reference's
    # unrolled bcsr_A_mul_B2/4 shapes (SURVEY.md §3.3).
    nq_narrow = 0
    if (
        n_block is None
        and not A.binary
        and A.dtype == jnp.bfloat16
        and precision == "highest"
        and X.dtype == jnp.float32
    ):
        nq_narrow = _narrow_nq(N)
    if nq_narrow:
        n_block = LANES
        Npad = LANES
        nq = nq_narrow
        Xp = _pack_narrow_planes(X, nsl * TK, nq)
        strategy = pick_strategy(
            nsl, TK, n_block, Xp.dtype.itemsize, A.padded_tiles, 1
        )
        sids, parts = [], []
        for b, s0, s1, n_pad in _bsr_layout(A):
            strip_ids, slab_ids, tiles = _slice_bsr_chunk(b, nsp, s0, s1, n_pad)
            Yb = bucket_spmm(
                slab_ids,
                tiles,
                Xp,
                tile_m=TM,
                tile_k=TK,
                binary=False,
                n_block=n_block,
                strategy=strategy,
                precision=precision,
                binary_path="none",
            )
            sids.append(strip_ids)
            parts.append(Yb.reshape(slab_ids.shape[0], TM, Npad))
        if _parts:
            return sids, parts, Npad, nq
        Y = _assemble_rows(A, parts, Npad, jnp.float32)
        if Y is not None:
            return _fold_narrow(Y, nq)[:, :N]
        Y = _assemble_strips(A, sids, parts, Npad, jnp.float32)
        return _fold_narrow(Y, nq)[:nrow, :N]

    if n_block is None:
        n_block = min(_round_up(N, LANES), 512)
        # wider RHS must sweep extra j panels, not widen the resident X
        # past the VMEM budget — over it `pick_strategy` silently drops
        # to the ~4x-slower streamed kernel (the known trap; ecfp N=256
        # measured 52.7 ms vs 4.1 at N=128 before this cap)
        from .pallas.bsr_spmm import RESIDENT_VMEM_BUDGET as _RB

        while (
            n_block > LANES
            and nsl * TK * n_block * X.dtype.itemsize > _RB
        ):
            n_block //= 2
    Npad = _round_up(N, n_block)
    Xp = jnp.zeros((nsl * TK, Npad), X.dtype).at[:ncol, :N].set(X)

    # bf16-exact-A fp32-parity fast path ships X as 3 stacked bf16 planes
    # (x = x0+x1+x2 to ~24 bits): 3 bf16 MXU passes per tile instead of
    # HIGHEST's 6. Applies to bitmask tiles (the 0/1 mask is exact in
    # bf16) and to bf16-valued tiles (already bf16-exact by construction).
    if binary_path is None:
        binary_path = binary_plane_path(TM)
    exact_bf16 = A.binary or A.dtype == jnp.bfloat16
    if not A.binary and binary_path == "planes_k":
        binary_path = "planes_n"  # valued tiles only have the wide body
    planes = (
        exact_bf16
        and precision == "highest"
        and binary_path != "expand"
        and Xp.dtype == jnp.float32
    )
    itemsize = 6 if planes else X.dtype.itemsize
    strategy = pick_strategy(
        nsl, TK, n_block, itemsize, A.padded_tiles, Npad // n_block
    )
    if planes and strategy == "streamed":
        # The plane panel (6 B/elem) busting the VMEM budget while the f32
        # panel (4 B) fits means expand+resident beats planes+streamed by
        # far (measured 153 vs 686 ms, ecfp 50k x 20k direct-BSR probe,
        # 2026-08-17) — dropping to streamed silently is the known 4x trap.
        s_f32 = pick_strategy(
            nsl, TK, n_block, X.dtype.itemsize, A.padded_tiles,
            Npad // n_block,
        )
        if s_f32 == "resident":
            planes, strategy = False, "resident"
    if not (planes and strategy == "resident"):
        binary_path = "expand"  # kernel must see the layout X actually has
    else:
        if binary_path == "planes_k":
            Xp = jnp.concatenate(_split_bf16_planes(Xp), axis=0)
        else:  # planes_n: per-panel [x0_j | x1_j | x2_j] along lanes
            Xp = _stack_planes(Xp, n_block, Npad)

    # Dump strip nsp catches padding bucket slots (strip_ids == nsp).
    sids, parts = [], []
    for b, s0, s1, n_pad in _bsr_layout(A):
        strip_ids, slab_ids, tiles = _slice_bsr_chunk(b, nsp, s0, s1, n_pad)
        Yb = bucket_spmm(
            slab_ids,
            tiles,
            Xp,
            tile_m=TM,
            tile_k=TK,
            binary=A.binary,
            n_block=n_block,
            strategy=strategy,
            precision=precision,
            binary_path=binary_path,
        )
        sids.append(strip_ids)
        parts.append(Yb.reshape(slab_ids.shape[0], TM, Npad))
    if _parts:
        return sids, parts, Npad, 0
    # bf16 X still accumulates in f32 (Mosaic 32-bit matmul acc)
    ydtype = jnp.float32 if X.dtype == jnp.bfloat16 else X.dtype
    Y = _assemble_rows(A, parts, Npad, ydtype)
    if Y is not None:
        return Y[:, :N]
    return _assemble_strips(A, sids, parts, Npad, ydtype)[:nrow, :N]


@named("bsr_assemble_rows")
def _assemble_rows(A, parts, Npad, ydtype):
    """Row-granular assembly: ONE gather over the flattened strip panels
    produces the exact ``(nrow, Npad)`` output (plan sentinel rows hit the
    appended zero row). Returns None when no valid row plan is attached —
    callers fall back to `_assemble_strips` + ``[:nrow]`` trim."""
    plan = getattr(A, "strip_plan", None)
    if (
        not parts
        or plan is None
        or plan.row_pos is None
        or plan.layout_key != _asm_bsr_layout_key()
        or plan.n_parts != sum(int(p.shape[0]) for p in parts)
    ):
        return None
    cat = jnp.concatenate(
        [p.reshape(-1, Npad) for p in parts]
        + [jnp.zeros((1, Npad), parts[0].dtype)],
        axis=0,
    )
    return cat[plan.row_pos].astype(ydtype)


@named("bsr_assemble_strips")
def _assemble_strips(A, sids, parts, Npad, ydtype):
    """Per-chunk strip panels -> Y f32[n_strips·TM, Npad] (full padded
    height; callers slice rows/cols). Prefers the strip plan's gather
    (strips are disjoint) over the batched scatter."""
    TM = A.tile_m
    nsp = A.n_strips
    plan = getattr(A, "strip_plan", None)
    if (
        parts
        and plan is not None
        and plan.layout_key == _asm_bsr_layout_key()
        and plan.n_parts == sum(int(p.shape[0]) for p in parts)
    ):
        # scatter-free: strips are disjoint, so Y is ONE gather over the
        # concatenated strip panels (the .at[].set made XLA rewrite the
        # whole Y buffer per call — same pathology as ell_ops' scatter)
        cat = jnp.concatenate(
            parts + [jnp.zeros((1, TM, Npad), parts[0].dtype)], axis=0
        )
        Y = cat[plan.pos].astype(ydtype)
        return Y.reshape(nsp * TM, Npad)
    Y = jnp.zeros((nsp + 1, TM, Npad), ydtype)
    if parts:
        # one batched scatter: per-chunk .at[].set rewrites the full Y
        # buffer per chunk
        Y = Y.at[jnp.concatenate(sids)].set(jnp.concatenate(parts, axis=0))
    return Y[:nsp].reshape(nsp * TM, Npad)


def _pack_narrow_planes(X, K: int, nq: int, nb: int = LANES) -> jax.Array:
    """Pack f32 ``X[ncol, N]`` into the narrow plane layout: bf16[K, nb]
    = ``[x0 | x1 | x2 | 0-tail]`` with each plane padded to ``nq`` columns.

    ``nb`` is the block lane width: the mono path passes ``3·nq`` (Mosaic
    accepts blocks whose lane dim equals the array's — measured SpMV
    0.458 -> 0.199 ms, probe_spmv_narrow_tpu 2026-08-20); the segmented
    panel paths keep the full 128 (their window specs share one global X).

    Pure pad/concatenate — no scatter, so it traces cleanly inside
    `shard_map` bodies on explicit-axes meshes (scatter's sharding rule
    rejects those)."""
    ncol, N = X.shape
    Xf = X.astype(jnp.float32)
    if ncol > K:
        # padded global operand wider than this tiling's slab extent: the
        # extra rows can't be addressed by any slab — drop them
        Xf = Xf[:K]
    Xf = jnp.pad(Xf, ((0, max(K - ncol, 0)), (0, nq - N)))
    planes = _split_bf16_planes(Xf)
    if nb > 3 * nq:
        planes = planes + (jnp.zeros((K, nb - 3 * nq), jnp.bfloat16),)
    return jnp.concatenate(planes, axis=1)


def _narrow_nq(N: int) -> int:
    """Padded column count for the narrow-RHS plane packing, or 0 when N
    is too wide: all 3 bf16 X planes of an N-column panel fit one 128-lane
    block when 3·roundup(N, 8) <= 128 — one MXU pass instead of three."""
    nq = _round_up(max(N, 1), 8)
    return nq if 3 * nq <= LANES else 0


def _prep_panel_x(A, X, N, precision):
    """Pad/encode X for the panel kernel. Returns (Xp, NB, Npad, fold, nq)
    — ``nq > 0`` marks the narrow packing (fold thirds AFTER assembly)."""
    ncol = A.shape[1]
    TK = A.tile_k
    nsl = A.n_slabs
    # int8 panels (0/±1..±127 exact in bf16 after the in-kernel cast)
    # ride the same fp32-parity plane paths as bf16-valued/bitmask panels
    exact_bf16 = A.binary or A.dtype in (jnp.bfloat16, jnp.int8)
    parity = (
        exact_bf16 and precision == "highest" and X.dtype == jnp.float32
    )
    nq = _narrow_nq(N) if parity else 0
    if nq:
        # narrow multi-RHS (SpMV, the reference's bcsr_A_mul_B2/4 shapes,
        # SURVEY.md §3.3): 3 planes side by side in ONE 128-lane block
        Xp = _pack_narrow_planes(X, nsl * TK, nq)
        return Xp, LANES, LANES, False, nq
    NB = LANES  # panels re-sweep per j block; X residency caps NB
    Npad = _round_up(N, NB)
    Xp = jnp.zeros((nsl * TK, Npad), X.dtype).at[:ncol, :N].set(X)
    if parity and PANEL_FOLD_IN_KERNEL:
        # fp32-parity planes split IN-KERNEL per (PK, NB) slice: the
        # XLA-level 3-plane prep below was ~40% of headline device time
        # (docs/TRACE.md, 2026-08-19) and its resident layout costs
        # 6 B/elem vs plain f32's 4 B.
        return Xp, NB, Npad, "f32", 0
    if parity:
        return _stack_planes(Xp, NB, Npad), NB, Npad, True, 0
    return Xp, NB, Npad, False, 0


def _panel_parts(A, Xp, NB, Npad, fold, precision, x_rows=None, seg=None):
    """Run the panel kernel per chunk; returns (sids, parts) for
    `_assemble_strips`. ``x_rows``/``seg`` window a global padded X
    (column-segmented callers — see `panel_spmm`)."""
    TM, TK = A.tile_m, A.tile_k
    nsp = A.n_strips
    sids, parts = [], []
    for b, s0, s1, n_pad in _bsr_layout(A):
        strip_ids, starts, panels = _slice_panel_chunk(b, nsp, s0, s1, n_pad)
        Yb = panel_spmm(
            starts,
            panels,
            Xp,
            tile_m=TM,
            tile_k=TK,
            width=b.width,
            binary=A.binary,
            n_block=NB,
            fold=fold,
            precision=precision,
            x_rows=x_rows,
            seg=seg,
        )
        sids.append(strip_ids)
        parts.append(Yb.reshape(n_pad, TM, Npad))
    return sids, parts


def _fold_narrow(Y, nq: int):
    """Fold the narrow packing's three plane blocks: f32-parity sum."""
    return Y[:, :nq] + Y[:, nq : 2 * nq] + Y[:, 2 * nq : 3 * nq]


def _panel_impl(A, X, precision, _parts=False):
    nrow, _ = A.shape
    N = X.shape[1]
    Xp, NB, Npad, fold, nq = _prep_panel_x(A, X, N, precision)
    sids, parts = _panel_parts(A, Xp, NB, Npad, fold, precision)
    if _parts:
        return sids, parts, Npad, nq
    # the panel kernel always emits a 32-bit accumulator
    Y = _assemble_rows(A, parts, Npad, jnp.float32)
    if Y is not None:
        return (_fold_narrow(Y, nq) if nq else Y)[:, :N]
    Y = _assemble_strips(A, sids, parts, Npad, jnp.float32)
    if nq:
        Y = _fold_narrow(Y, nq)
    return Y[:nrow, :N]


def _quant3_carry(Xp):
    """Radix-256 3-plane quantization core: f32 -> (q0, q1, q2, s).

    ONE f32 round per element + integer shift/carry extraction (a single
    fusable elementwise pass — the sequential divide/round/subtract
    version measured 0.104 ms vs this one's 0.061 on the headline X).
    |x| ≤ colmax ⇒ |x/s| ≤ 127·2^16 so the top plane never exceeds
    ±127; carries keep q1/q2 in [-128, 127] (−128 is a valid MXU int8).
    """
    m = jnp.max(jnp.abs(Xp), axis=0, keepdims=True)
    s = jnp.where(m > 0, m, 1.0) * (1.0 / (127.0 * 65536.0))
    i = jnp.round(Xp * (1.0 / s)).astype(jnp.int32)
    q2 = ((i + 128) & 255) - 128
    i1 = (i - q2) >> 8
    q1 = ((i1 + 128) & 255) - 128
    q0 = (i1 - q1) >> 8
    return q0, q1, q2, s


# Quantization prep engine: the Pallas kernel pins the single
# read+write pass (headline prep 0.056 -> ~0.03 ms — the XLA
# formulation materializes int32/int8 intermediates); False = the
# round-4 XLA path (A/B + interpret-mode fallback evidence).
QUANT_PALLAS = True


def _quant3_planes(Xp, NB: int, Npad: int):
    """f32 (K, Npad) -> (int8 (K, nj·3·NB) planes, f32 (1, Npad) scale).

    Per-NB-block lane layout ``[q0_j | q1_j | q2_j]`` (the i8 analog of
    `_stack_planes`); the mono kernels run one s8 dot per plane and
    combine ``(d0·2^16 + d1·2^8 + d2)·s`` in f32 (d0 < 2^24: exact)."""
    K = Xp.shape[0]
    nj = Npad // NB
    if QUANT_PALLAS and K % 32 == 0:
        from .pallas.bsr_spmm import colmax_pallas, quant3_planes_pallas

        m8 = colmax_pallas(Xp)  # (8, Npad), rows identical
        s8 = jnp.where(m8 > 0, m8, 1.0) * (1.0 / (127.0 * 65536.0))
        return (
            quant3_planes_pallas(Xp, 1.0 / s8, n_block=NB),
            s8[:1],
        )
    q0, q1, q2, s = _quant3_carry(Xp)
    qs = [q.astype(jnp.int8) for q in (q0, q1, q2)]
    if nj == 1:
        # concat IS the single-block layout — the stack+reshape
        # formulation costs an extra materialization pass (~30 us on the
        # headline X, measured 0.213 vs 0.182 ms full-product busy)
        planes = jnp.concatenate(qs, axis=1)
    else:
        planes = jnp.stack(
            [q.reshape(K, nj, NB) for q in qs], axis=2
        ).reshape(K, nj * 3 * NB)
    return planes, s


def _quant3_narrow(X, K: int, nq: int, nb: int):
    """Narrow analog of `_pack_narrow_planes`: int8 (K, nb) planes +
    f32 (1, nq) scale, planes at lane offsets 0/nq/2·nq with a zero tail
    to ``nb``. The kernel runs ONE s8 dot over all ``nb`` lanes;
    `_fold_narrow_q` combines the thirds with the radix weights.
    ``nb`` rounds 3·nq up to a 32 multiple — int8's native sublane tiling
    is (32, 128) and 24-lane blocks measured 17% slower than 32
    (probe_i8x3_tpu, 2026-08-20)."""
    ncol, N = X.shape
    Xf = X.astype(jnp.float32)
    if ncol > K:
        Xf = Xf[:K]
    Xf = jnp.pad(Xf, ((0, max(K - ncol, 0)), (0, nq - N)))
    q0, q1, q2, s = _quant3_carry(Xf)
    qs = [q.astype(jnp.int8) for q in (q0, q1, q2)]
    if nb > 3 * nq:
        qs.append(jnp.zeros((Xf.shape[0], nb - 3 * nq), jnp.int8))
    return jnp.concatenate(qs, axis=1), s


def _fold_narrow_q(Y, nq: int, scale):
    """Fold the narrow packing's three plane blocks: bf16-parity sum, or
    the radix-256 recombination when ``scale`` marks int8 planes."""
    if scale is None:
        return _fold_narrow(Y, nq)
    return (
        Y[:, :nq] * 65536.0
        + Y[:, nq : 2 * nq] * 256.0
        + Y[:, 2 * nq : 3 * nq]
    ) * scale


def _prep_mono_x(A, X, N, precision):
    """Pad/encode X for the mono-panel kernel: rows pad to the window
    multiple. A pre-padded X (already ``(K_pad, Npad)``) is used as-is —
    chained products (CG, normal equations) then skip the pad copy
    entirely. Returns (Xp, NB, Npad, fold, nq); ``Xp`` is an
    ``(planes, scale)`` pair on the int8-quantized paths (fold="i8" for
    the wide in-kernel recombination; fold=False + scale for the narrow
    XLA-level `_fold_narrow_q`)."""
    b = A.buckets[0]
    TK = A.tile_k
    K_pad = b.n_windows * b.win_slabs * TK
    if X.shape[0] > K_pad:
        X = X[:K_pad]
    # int8 panels (0/±1..±127 exact in bf16 after the in-kernel cast) ride
    # the same fp32-parity plane paths as bf16-valued/bitmask panels
    exact_bf16 = A.binary or A.dtype in (jnp.bfloat16, jnp.int8)
    parity = (
        exact_bf16 and precision == "highest" and X.dtype == jnp.float32
    )
    # int8-quantized X planes (MONO_X_PLANES): s8×s8→s32 MXU passes at 2x
    # the bf16 rate — requires int8 panels (the binary_tiles default)
    i8x = (
        parity
        and MONO_X_PLANES == "int8"
        and not A.binary
        and A.dtype == jnp.int8
    )
    nq = _narrow_nq(N) if parity else 0
    if nq:
        # narrow lane width 3·nq (not 128): SpMV/narrow-RHS X and Y
        # arrays shrink to the lanes actually used — banded-50k SpMV
        # 0.458 -> 0.199 ms at identical parity (probe_spmv_narrow_tpu)
        if i8x:
            nb = _round_up(3 * nq, 32)
            return _quant3_narrow(X, K_pad, nq, nb), nb, nb, False, nq
        nb = 3 * nq
        return _pack_narrow_planes(X, K_pad, nq, nb), nb, nb, False, nq
    NB = LANES
    Npad = _round_up(N, NB)
    if X.shape == (K_pad, Npad):
        Xp = X
    else:
        Xp = jnp.zeros((K_pad, Npad), X.dtype).at[: X.shape[0], :N].set(X)
    if i8x:
        return _quant3_planes(Xp, NB, Npad), NB, Npad, MONO_I8_FOLD, 0
    if parity:
        # pre-stacked 3-plane X (one wide dot, no per-item VPU split)
        # beats the in-kernel split at wide N on mono: 0.314 vs 0.378 ms
        # headline A/B (2026-08-20) — the split costs ~0.5 us/item. Take
        # it when the double-buffered 3-plane window block still fits
        # scoped VMEM; fall back to the in-kernel split otherwise.
        vmem = 2 * (
            b.win_slabs * TK * 3 * NB * 2  # 3-plane bf16 window block
            + A.tile_m * b.width * TK * b.panels.dtype.itemsize
            + A.tile_m * NB * 4  # f32 output block
        )
        if vmem <= MONO_PREFOLD_VMEM:
            return _stack_planes(Xp, NB, Npad), NB, Npad, True, 0
        # over budget: ALWAYS the in-kernel split — the 3-plane window
        # would bust scoped VMEM (A/B the prefold by monkeypatching
        # MONO_PREFOLD_VMEM, not PANEL_FOLD_IN_KERNEL)
        return Xp, NB, Npad, "f32", 0
    return Xp, NB, Npad, False, 0


def _mono_raw(A, X, precision):
    """Raw mono product: ``(Y, nq, Npad, scale)`` with ``Y`` the kernel's
    full f32[out_strips·TM, Npad] output, pre-narrow-fold. Rows past the
    real output are zero (chain-padding strips carry zero panels), so
    ``Y`` feeds a partner mono tiling directly — see `mono_chain`.
    ``scale`` is non-None on the narrow int8-plane path (consumed by
    `_fold_narrow_q`)."""
    from ..formats.bsr import MonoGroupBucket

    N = X.shape[1]
    TM = A.tile_m
    b = A.buckets[0]
    Xp, NB, Npad, fold, nq = _prep_mono_x(A, X, N, precision)
    scale = None
    if isinstance(Xp, tuple):
        Xp, scale = Xp
    kscale = scale if fold in ("i8", "i8w") else None
    if isinstance(b, MonoGroupBucket):
        Y = mono_group_spmm(
            b.windows,
            b.start_rel,
            b.panels,
            Xp,
            tile_m=TM,
            tile_k=A.tile_k,
            width=b.width,
            win_slabs=b.win_slabs,
            binary=A.binary,
            n_block=NB,
            fold=fold,
            precision=precision,
            group=b.group,
            scale=kscale,
        )
        for sb in A.buckets[1:]:
            # side bucket: uncovered entries on k strips — small kernel
            # into (k·TM, Npad), then a k-strip scatter-add into Y
            Ys = mono_panel_spmm(
                sb.window,
                sb.strip_ids,
                sb.start_rel,
                sb.first,
                sb.panels,
                Xp,
                tile_m=TM,
                tile_k=A.tile_k,
                width=sb.width,
                win_slabs=sb.win_slabs,
                binary=A.binary,
                n_block=NB,
                fold=fold,
                precision=precision,
                out_rows=sb.out_strips * TM,
                scale=kscale,
            )
            ridx = (
                sb.strip_map[:, None] * TM + jnp.arange(TM)[None, :]
            ).reshape(-1)
            Y = Y.at[ridx].add(Ys)
        return Y, nq, Npad, scale
    rows = max(b.out_strips, A.n_strips) * TM
    Y = mono_panel_spmm(
        b.window,
        b.strip_ids,
        b.start_rel,
        b.first,
        b.panels,
        Xp,
        tile_m=TM,
        tile_k=A.tile_k,
        width=b.width,
        win_slabs=b.win_slabs,
        binary=A.binary,
        n_block=NB,
        fold=fold,
        precision=precision,
        out_rows=rows,
        scale=kscale,
    )
    return Y, nq, Npad, scale


def _halo_impl(A, b, X, nq, precision):
    """Narrow-RHS product through the zero-spill halo-window grouped
    layout (``A.narrow``): G strips per grid step share one VMEM-resident
    X window, cutting the per-item sequencing cost the per-item mono
    kernel pays at narrow N (SpMV 0.153 -> 0.120 ms, probe_halo_tpu).
    The kernel consumes the HALO'D X — overlapping ``win_slabs``-slab
    window slices (stride ``b.stride``) materialized back-to-back, so the
    grouped kernel's plain block indexing addresses overlapping windows.
    """
    TM, TK = A.tile_m, A.tile_k
    abs_slabs = (b.n_windows - 1) * b.stride + b.win_slabs
    K_pad = abs_slabs * TK
    i8x = MONO_X_PLANES == "int8" and not A.binary and A.dtype == jnp.int8
    scale = None
    if i8x:
        nb = _round_up(3 * nq, 32)
        Xp, scale = _quant3_narrow(X, K_pad, nq, nb)
    else:
        nb = 3 * nq
        Xp = _pack_narrow_planes(X, K_pad, nq, nb)
    if b.n_windows > 1:
        win_rows = b.win_slabs * TK
        Xp = jnp.concatenate(
            [
                jax.lax.slice_in_dim(
                    Xp, w * b.stride * TK, w * b.stride * TK + win_rows
                )
                for w in range(b.n_windows)
            ],
            axis=0,
        )
    Y = mono_group_spmm(
        b.windows,
        b.start_rel,
        b.panels,
        Xp,
        tile_m=TM,
        tile_k=TK,
        width=b.width,
        win_slabs=b.win_slabs,
        binary=A.binary,
        n_block=nb,
        fold=False,
        precision=precision,
        group=b.group,
        scale=None,
    )
    Y = _fold_narrow_q(Y, nq, scale)
    return Y[: A.shape[0], : X.shape[1]]


# Widest narrow-RHS padded width served by the halo grouped engine. The
# engine is probed/adopted for N<=8 only (probe_halo2_tpu measured N<=8;
# N=128 lost 2.4x); wider nq would also widen the grouped kernel's X
# window block (3·nq lanes, traced index map => double-buffered) past the
# 16 MB scoped-VMEM wall at win_slabs near the HALO_WIN_MAX=512 cap —
# e.g. nq=24: 2·512·128·72·2 B ≈ 18.9 MB, a compile-time Mosaic failure
# CPU tests can't see (ADVICE r4 medium). N in 9..40 takes the per-item
# mono narrow path instead.
HALO_NQ_MAX = 8


def halo_nq(A, N: int, x_dtype=jnp.float32, precision: str = "highest") -> int:
    """Padded width nq if the narrow halo grouped engine serves this
    product, else 0 — THE dispatch predicate, shared by `_mono_impl` and
    `bench.metrics.active_nbytes` so the bytes model tracks the engine
    actually chosen (ADVICE r4: the two previously disagreed for N in
    9..40 and for non-parity narrow products)."""
    if getattr(A, "narrow", None) is None:
        return 0
    nq = _narrow_nq(N)
    if not nq or nq > HALO_NQ_MAX:
        return 0
    exact_bf16 = A.binary or A.dtype in (jnp.bfloat16, jnp.int8)
    if not (
        exact_bf16
        and precision == "highest"
        and jnp.dtype(x_dtype) == jnp.dtype(jnp.float32)
    ):
        return 0
    return nq


def _mono_impl(A, X, precision):
    """``Y = A @ X`` in ONE kernel launch (MonoPanelBucket layout)."""
    nq = halo_nq(A, X.shape[1], X.dtype, precision)
    if nq:
        return _halo_impl(A, A.narrow, X, nq, precision)
    Y, nq, _, scale = _mono_raw(A, X, precision)
    if nq:
        Y = _fold_narrow_q(Y, nq, scale)
    return Y[: A.shape[0], : X.shape[1]]


def mono_chain(A, At, X, precision="highest"):
    """``Aᵀ(A X)`` as two back-to-back mono launches with ZERO pad/trim
    copies between them — the reference's fused ``bcsr_AA_mul_B``
    (SURVEY.md §3.3) recast for TPU: ``A``'s raw kernel output is padded
    at build time (`formats.bsr._mono_pad_strips`) to exactly the X extent
    ``At``'s windows address, so the intermediate never leaves HBM layout.

    ``A`` and ``At`` are mono tilings of a matrix and its transpose (in
    either order — ``mono_chain(At, A, x)`` is the gram product ``AAᵀx``).
    """
    N = X.shape[1]
    Y1, nq1, Npad1, scale1 = _mono_raw(A, X, precision)
    if nq1:
        tmp = _fold_narrow_q(Y1, nq1, scale1)[:, :N]
    elif N == Npad1:
        tmp = Y1
    else:
        tmp = Y1[:, :N]
    Y2, nq2, _, scale2 = _mono_raw(At, tmp, precision)
    if nq2:
        Y2 = _fold_narrow_q(Y2, nq2, scale2)
    return Y2[: At.shape[0], :N]


def _seg_mode(seg, N, x_dtype, precision):
    """(Npad, nq) the `bsr_spmm` paths will produce for this segment —
    must agree across segments for the cross-segment plan assembly."""
    exact = seg.binary or seg.dtype in (jnp.bfloat16, jnp.int8)
    parity = exact and precision == "highest" and x_dtype == jnp.float32
    if seg.is_panel:
        nq = _narrow_nq(N) if parity else 0
        return (LANES, nq) if nq else (_round_up(N, LANES), 0)
    narrow_ok = parity and not seg.binary and seg.dtype == jnp.bfloat16
    nq = _narrow_nq(N) if narrow_ok else 0
    if nq:
        return LANES, nq
    nb = min(_round_up(N, LANES), 512)
    # mirror bsr_spmm's default-n_block residency cap exactly, or the
    # cross-segment plan's Npad prediction drifts and colseg falls back
    from .pallas.bsr_spmm import RESIDENT_VMEM_BUDGET as _RB

    isz = jnp.dtype(x_dtype).itemsize
    while (
        nb > LANES
        and seg.n_slabs * seg.tile_k * nb * isz > _RB
    ):
        nb //= 2
    return _round_up(N, nb), 0


def _colseg_panel_parts_global(A, X, N, Npad, nq, precision):
    """All-segment panel parts over ONE globally padded X.

    Each `panel_spmm` launch DMAs its segment's resident window straight
    out of the shared padded X via a scalar-prefetched BlockSpec index —
    the per-segment host-level ``X[off:off+w]`` slice + pad copies (a full
    extra X rewrite per product, ~35 µs/iter on the 2026-08-19 headline
    trace) disappear. Requires uniform, TK-aligned segment widths and one
    (binary, dtype) family; returns None otherwise (caller falls back)."""
    segs = A.segments
    if not all(s.is_panel for s in segs):
        return None
    if len({(s.binary, jnp.dtype(s.dtype).name) for s in segs}) != 1:
        return None
    seg_w = A.seg_cols
    TK = segs[0].tile_k
    if seg_w % TK:
        return None
    if any(off != i * seg_w for i, off in enumerate(A.col_offsets)):
        return None
    nsl_u = seg_w // TK
    if any(s.n_slabs > nsl_u for s in segs):
        return None
    K_rows = len(segs) * nsl_u * TK
    ncol = A.shape[1]
    first = segs[0]
    exact_bf16 = first.binary or first.dtype in (jnp.bfloat16, jnp.int8)
    parity = (
        exact_bf16 and precision == "highest" and X.dtype == jnp.float32
    )
    # mirror _prep_panel_x's mode decisions on the global operand
    if nq:
        Xg = _pack_narrow_planes(X, K_rows, nq)
        fold = False
    else:
        Xg = jnp.zeros((K_rows, Npad), X.dtype).at[:ncol, :N].set(X)
        if parity and PANEL_FOLD_IN_KERNEL:
            fold = "f32"
        elif parity:
            Xg = _stack_planes(Xg, LANES, Npad)
            fold = True
        else:
            fold = False
    parts_all = []
    for si, seg in enumerate(segs):
        sidx = jnp.full((1,), si, jnp.int32)
        _, parts = _panel_parts(
            seg, Xg, LANES, Npad, fold, precision,
            x_rows=nsl_u * TK, seg=sidx,
        )
        parts_all += parts
    return parts_all


def colseg_spmm(A, X, *, precision: str = "highest"):
    """Cross-segment ``Y = A @ X`` for a ColSegmented of BsrMatrix.

    Assembles Y from ALL segments' strip panels with one multiplicity-class
    gather plan (`ops.assemble.build_colseg_plan`) instead of the generic
    per-segment ``Y += spmm(seg, X_slice)`` — the latter rewrites the full
    nrow×N Y buffer once per segment. Returns None when the plan is absent
    or the segments disagree on kernel mode (caller falls back)."""
    from .assemble import colseg_layout_key

    X = jnp.asarray(X)
    segs = A.segments
    plan = getattr(A, "plan", None)
    if (
        plan is None
        or not segs
        or plan.layout_key != colseg_layout_key()
        or not all(isinstance(s, BsrMatrix) for s in segs)
        or not pallas_supported(X.dtype)
    ):
        return None
    N = X.shape[1]
    modes = {_seg_mode(s, N, X.dtype, precision) for s in segs}
    TM = segs[0].tile_m
    nsp = segs[0].n_strips
    if len(modes) != 1 or any(
        s.tile_m != TM or s.n_strips != nsp for s in segs
    ):
        return None
    Npad, nq = modes.pop()

    parts_all = _colseg_panel_parts_global(A, X, N, Npad, nq, precision)
    if parts_all is None:
        parts_all = []
        for off, seg in zip(A.col_offsets, segs):
            Xs = X[off : off + seg.shape[1]]
            _, parts, Npad_s, nq_s = bsr_spmm(
                seg, Xs, precision=precision, _parts=True
            )
            if (Npad_s, nq_s) != (Npad, nq):  # pragma: no cover - drift
                return None
            parts_all += parts
    if plan.n_slots != sum(int(p.shape[0]) for p in parts_all):
        return None
    with named("colseg_assemble"):
        if plan.row_srcs:
            # Row-granular: Σ_m one gather over the flattened parts
            # produces the EXACT (nrow, Npad) output in a single fused
            # pass — no strip-level intermediate, no [:nrow] trim rewrite
            # (the trim alone cost ~36 µs/iter on the 2026-08-19 headline
            # trace, docs/TRACE.md).
            pcat = jnp.concatenate(
                [p.reshape(-1, Npad) for p in parts_all]
                + [jnp.zeros((1, Npad), parts_all[0].dtype)],
                axis=0,
            )
            Y = pcat[plan.row_srcs[0]]
            for src in plan.row_srcs[1:]:
                Y = Y + pcat[src]
            if nq:
                Y = _fold_narrow(Y, nq)
            return Y[:, :N]
        pcat = jnp.concatenate(parts_all, axis=0)
        ys = []
        for c, pos_c in zip(plan.widths, plan.classes):
            yc = pcat[pos_c[:, 0]]
            for s in range(1, c):
                yc = yc + pcat[pos_c[:, s]]
            ys.append(yc)
        ys.append(jnp.zeros((1, TM, Npad), pcat.dtype))
        Y = jnp.concatenate(ys, axis=0)[plan.rowpos]
        Y = Y.reshape(nsp * TM, Npad)
    if nq:
        Y = _fold_narrow(Y, nq)
    return Y[: A.shape[0], :N]


def bsr_spmv(A: BsrMatrix, x) -> jax.Array:
    """``y = A @ x`` via the Pallas VPU tile kernel. x: dtype[ncol]."""
    x = jnp.asarray(x)
    nrow, ncol = A.shape
    TM, TK = A.tile_m, A.tile_k
    nsp, nsl = A.n_strips, A.n_slabs

    if not pallas_supported(x.dtype):
        from .spmv import spmv as coo_spmv

        return coo_spmv(_as_coo(A), x)

    if A.is_panel:
        # the narrow packing makes the 1-column case a single-pass panel
        # sweep (3 planes in one 128-lane block)
        return bsr_spmm(A, x[:, None])[:, 0]

    x_vmem_bytes = nsl * TK * x.dtype.itemsize
    if x_vmem_bytes > 12 * 1024 * 1024 or TM > 32:
        # x too large for VMEM residency (or wide tiles, whose batched
        # mask expansion busts the SpMV kernel's scratch budget): run as
        # a 1-column SpMM panel instead.
        return bsr_spmm(A, x[:, None], n_block=LANES)[:, 0]

    xp = jnp.zeros((nsl * TK,), x.dtype).at[:ncol].set(x).reshape(nsl, TK)
    y = jnp.zeros((nsp + 1, TM), x.dtype)
    for b in A.buckets:
        for strip_ids, slab_ids, tiles in _bucket_chunks(b, nsp):
            yb = bucket_spmv(
                slab_ids, tiles, xp, tile_m=TM, tile_k=TK, binary=A.binary
            )
            y = y.at[strip_ids].set(yb)
    return y[:nsp].reshape(nsp * TM)[:nrow]


def _as_coo(A: BsrMatrix):
    """Decompress a BsrMatrix to COO per bucket (fallback paths only —
    never densifies the full matrix)."""
    import numpy as np

    from ..formats.bsr import expand_bits_reference
    from ..formats.coo import COO

    TM, TK = A.tile_m, A.tile_k
    nsp = A.n_strips
    rows_l, cols_l, vals_l = [], [], []
    from ..formats.bsr import MonoGroupBucket

    for b in A.buckets:
        if isinstance(b, (PanelBucket, MonoPanelBucket, MonoGroupBucket)):
            PK = b.width * TK
            panels = (
                np.asarray(expand_bits_reference(b.panels, PK))
                if A.binary
                else np.asarray(b.panels)
            )
            if isinstance(b, MonoGroupBucket):
                sids = np.arange(b.ns, dtype=np.int64)
                starts = (
                    np.asarray(b.windows)[sids // b.group] * b.win_slabs
                    + np.asarray(b.start_rel)
                )
            elif isinstance(b, MonoPanelBucket):
                sids = np.asarray(b.strip_ids)
                if b.strip_map is not None:
                    sids = np.asarray(b.strip_map)[sids]
                starts = (
                    np.asarray(b.window) * b.win_slabs
                    + np.asarray(b.start_rel)
                )
            else:
                sids = np.asarray(b.strip_ids)
                starts = np.asarray(b.start_slab)
            i, r, c = np.nonzero(panels)
            keep = sids[i] < nsp
            i, r, c = i[keep], r[keep], c[keep]
            rows_l.append(sids[i] * TM + r)
            cols_l.append(starts[i] * TK + c)
            vals_l.append(panels[i, r, c])
            continue
        tiles = (
            np.asarray(expand_bits_reference(b.tiles, TK))
            if A.binary
            else np.asarray(b.tiles)
        )
        sids = np.asarray(b.strip_ids)
        slabs = np.asarray(b.slab_ids)
        i, t, r, c = np.nonzero(tiles)  # padding tiles are all-zero
        keep = sids[i] < nsp
        i, t, r, c = i[keep], t[keep], r[keep], c[keep]
        rows_l.append(sids[i] * TM + r)
        cols_l.append(slabs[i, t] * TK + c)
        vals_l.append(tiles[i, t, r, c])
    if rows_l:
        rows = np.concatenate(rows_l)
        cols = np.concatenate(cols_l)
        vals = np.concatenate(vals_l)
    else:
        rows = cols = np.zeros(0, np.int64)
        vals = np.zeros(0, np.float32)
    keep = (rows < A.shape[0]) & (cols < A.shape[1])
    return COO.from_arrays(rows[keep], cols[keep], vals[keep], A.shape)
