"""Pallas TPU kernels for tiled-BSR SpMM / SpMV.

TPU-native re-design of the reference's hot kernels (SURVEY.md §3.2-3.3:
``bcsr_A_mul_B*``, ``bsbm_A_mul_B``): the OpenMP row loop becomes a Pallas
grid over (RHS panel, row-strip, tile); the per-nonzero gather ``x[cols[j]]``
disappears entirely — column indices are consumed at *DMA time* as
scalar-prefetched block indices, so the inner loop is a dense
``(TM×TK) @ (TK×NB)`` MXU contraction per tile.

Two X placement strategies, chosen by a bytes model (`pick_strategy`):

* **resident** — the whole padded X panel lives in VMEM; each tile slices
  its slab with a dynamic ``pl.ds``. X is DMA'd once per sweep; A-bytes
  dominate. Best when ``n_slabs·TK·NB·itemsize`` fits the VMEM budget.
* **streamed** — each tile's X slab is DMA'd by the Pallas pipeline via a
  scalar-prefetch index map (``slab_ids`` in SMEM). X bytes scale with the
  tile count; best for very wide matrices.

Binary matrices use bitmask tiles (1 bit per slot, 32× less A-traffic than
f32): words are expanded to a 0/1 mask on the VPU with the supported
lane-gather (`take_along_axis` axis=1) and fed to the MXU.

All kernels run compiled on TPU and under ``interpret=True`` elsewhere
(CPU test suite), selected automatically per backend.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.profiling import named

__all__ = [
    "bucket_spmm",
    "bucket_spmv",
    "panel_spmm",
    "mono_panel_spmm",
    "pick_strategy",
    "RESIDENT_VMEM_BUDGET",
]

LANES = 128
RESIDENT_VMEM_BUDGET = 12 * 1024 * 1024  # bytes of VMEM we let X occupy


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _expand_bits(words, tile_k: int, dtype):
    """uint32 (..., TM, W) -> 0/1 mask (..., TM, TK), word-major layout.

    Bit for tile-column ``c`` is word ``c % W``, position ``c // W``
    (matches `formats.bsr.build_bsr`). Lane-concat of 32 copies gives
    ``rep[..., c] == words[..., c % W]`` with no gather; expanding a whole
    multi-tile block in ONE call amortizes the VPU op overhead (per-tile
    expansion measured ~80 ns/tile; batched it is ~constant per block).
    """
    W = tile_k // 32
    rep = jnp.concatenate([words] * 32, axis=-1)
    shape = rep.shape
    col = jax.lax.broadcasted_iota(jnp.int32, shape, len(shape) - 1)
    bit = (col // W).astype(jnp.uint32)
    on = ((rep >> bit) & jnp.uint32(1)) != 0
    # jnp.where, not astype: Mosaic has no uint32 -> float cast
    return jnp.where(on, jnp.ones((), dtype), jnp.zeros((), dtype))


def _block_mats(tiles_block, binary: bool, tile_k: int, dtype):
    """Whole (..., TM, W|TK) tile block -> (..., TM, TK) matrices."""
    if binary:
        return _expand_bits(tiles_block, tile_k, dtype)
    return tiles_block


def _match_dot_dtypes(a, xs):
    """Mosaic has no mixed-dtype matmul: promote both operands to f32
    (bf16 -> f32 is exact) when tile and X dtypes differ."""
    if a.dtype != xs.dtype:
        return a.astype(jnp.float32), xs.astype(jnp.float32)
    return a, xs


# ---------------------------------------------------------------------------
# SpMM kernels: Y[strip] = sum_t tile(i,t) @ X[slab(i,t)]
# ---------------------------------------------------------------------------


_SG = 8  # strips per grid step — amortizes grid overhead, >= 8 sublanes
_TB = 4  # tiles per grid step per strip — batches tile DMAs
_SG_ROWS_CAP = 256  # max SG·TM (bounds the batched mask-expansion VMEM)


def _spmm_resident_body(binary, TK, TM, SG, TB, T, prec, slab_ref, tiles_ref, x_ref, o_ref):
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # SG×TB tiles per step: unrolled — every trip is a dense MXU contraction.
    # slab_ref is FLAT (ns*T,) in SMEM: 2-D SMEM arrays lane-pad the minor
    # dim to 128 and blow the 1 MB budget.
    mats = _block_mats(tiles_ref[:], binary, TK, o_ref.dtype)
    for g in range(SG):
        acc = None
        for u in range(TB):
            slab = slab_ref[(i * SG + g) * T + t * TB + u]
            xs = x_ref[pl.ds(slab * TK, TK), :]
            # HIGHEST: f32 operands must not fall to one-pass bf16 on the
            # MXU (fp32 parity is rtol 1e-6 — BASELINE.json:5).
            a, xs = _match_dot_dtypes(mats[g, u], xs)
            # bf16 x bf16 is single-pass by nature: HIGHEST on bf16
            # operands fails Mosaic verification ("Bad lhs type")
            p = None if a.dtype == jnp.bfloat16 else prec
            d = jnp.dot(
                a, xs, preferred_element_type=o_ref.dtype,
                precision=p,
            )
            acc = d if acc is None else acc + d
        o_ref[pl.ds(g * TM, TM), :] += acc


def _spmm_resident_body_binary3(TK, TM, SG, TB, T, K_all, slab_ref, tiles_ref, x_ref, o_ref):
    """Binary fp32-parity fast path: the 0/1 mask is exact in bf16, so
    splitting X into three bf16 planes (x = x0+x1+x2, ~24 mantissa bits)
    needs only 3 one-pass bf16 MXU products per tile instead of HIGHEST's
    6 — same rtol-1e-6 parity, ~2x the MXU throughput. ``x_ref`` holds the
    three planes stacked: (3*K_all, NB) bf16."""
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    # expand to f32 batched (proven path), cast 2-D tiles to bf16 at use:
    # Mosaic miscompiles the 4-D bool -> bf16 select (relayout bug).
    mats = _block_mats(tiles_ref[:], True, TK, jnp.float32)
    for g in range(SG):
        acc = None
        for u in range(TB):
            slab = slab_ref[(i * SG + g) * T + t * TB + u]
            a = mats[g, u].astype(jnp.bfloat16)
            d = None
            for plane in range(3):
                xs = x_ref[pl.ds(plane * K_all + slab * TK, TK), :]
                dp = jnp.dot(a, xs, preferred_element_type=o_ref.dtype)
                d = dp if d is None else d + dp
            acc = d if acc is None else acc + d
        o_ref[pl.ds(g * TM, TM), :] += acc


def _spmm_resident_body_wide(TK, TM, SG, TB, T, NB, binary, slab_ref, tiles_ref, x_ref, o_ref):
    """bf16-exact-A fp32-parity path with the 3 bf16 X planes stacked along
    the *lane* axis: ``x_ref`` is (K_all, 3·NB) bf16, panel-j layout
    ``[x0_j | x1_j | x2_j]``. Each tile needs ONE dynamic slice and ONE
    ``(TM,TK) @ (TK,3·NB)`` dot (3 internal MXU column passes), the plane
    fold is deferred to one static-slice add per strip group — vs the
    planes_k body's 3 slices + 3 dots per tile.

    ``binary=False`` means the tiles arrive as bf16 *values* (exact for
    0/1 matrices): no mask expansion, no cast — the tile feeds the MXU
    straight from its DMA."""
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    mats = _block_mats(tiles_ref[:], binary, TK, jnp.float32) if binary else tiles_ref[:]
    for g in range(SG):
        acc3 = None
        for u in range(TB):
            slab = slab_ref[(i * SG + g) * T + t * TB + u]
            a = mats[g, u]
            if binary:
                a = a.astype(jnp.bfloat16)
            xs = x_ref[pl.ds(slab * TK, TK), :]
            d3 = jnp.dot(a, xs, preferred_element_type=o_ref.dtype)
            acc3 = d3 if acc3 is None else acc3 + d3
        d = acc3[:, :NB] + acc3[:, NB : 2 * NB] + acc3[:, 2 * NB :]
        o_ref[pl.ds(g * TM, TM), :] += d


def _spmm_streamed_body(binary, TK, prec, slab_ref, tiles_ref, x_ref, o_ref):
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    a, xs = _match_dot_dtypes(
        _block_mats(tiles_ref[0, 0], binary, TK, x_ref.dtype), x_ref[:]
    )
    p = None if a.dtype == jnp.bfloat16 else prec
    o_ref[:] += jnp.dot(
        a, xs, preferred_element_type=o_ref.dtype, precision=p
    )


def _pick_batch(ns: int, T: int, tile_m: int, tile_k: int, binary: bool):
    """(SG, TB) per grid step: largest of the chain (8, 4, 2, 1) dividing
    T whose VMEM residency fits. Bytes model: the tiles block is
    double-buffered by the pipeline; binary kernels additionally
    materialize the (SG, TB, TM, TK) f32 expanded mask in scoped VMEM
    (measured: 4 MB expansion fits alongside a 12 MB resident X;
    8 MB — SG·TM = 512 at tm=128 — OOMs)."""
    sg_max = min(_SG, max(1, _SG_ROWS_CAP // tile_m))
    SG = sg_max if ns % sg_max == 0 else 1
    for TB in (8, 4, 2, 1):
        if T % TB:
            continue
        blk = SG * TB * tile_m * (tile_k // 8 if binary else tile_k * 4)
        exp = SG * TB * tile_m * tile_k * 4 if binary else 0
        if 2 * blk + exp <= 4 * 1024 * 1024:
            return SG, TB
    return SG, 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_k", "binary", "n_block", "strategy", "precision",
        "binary_path",
    ),
)
def bucket_spmm(
    slab_ids,  # int32[ns, T]
    tiles,  # dtype[ns,T,TM,TK] | uint32[ns,T,TM,W]
    x,  # dtype[n_slabs*TK, Npad] (already padded)
    *,
    tile_m: int,
    tile_k: int,
    binary: bool,
    n_block: int,
    strategy: str,
    precision: str = "highest",
    binary_path: str = "planes_n",
) -> jax.Array:
    """One bucket's ``Y_b = A_b @ X``: returns dtype[ns*TM, Npad].

    ``precision='highest'`` keeps fp32 parity (rtol 1e-6, 6 bf16 MXU
    passes); ``'default'`` is one bf16 pass — ~2.7x faster, rel ~1e-3.

    ``binary_path`` selects the binary-HIGHEST-resident kernel body (the
    host wrapper must ship the matching X layout — see
    `bsr_ops.binary_plane_path`): ``'planes_k'`` = 3 bf16 planes stacked
    along K (3 slices + 3 dots per tile), ``'planes_n'`` = planes stacked
    along lanes (1 slice + 1 wide dot), ``'expand'`` = f32 mask at
    HIGHEST (6 MXU passes, plain f32 X).
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    ns, T = slab_ids.shape
    bpath = "none"
    if precision == "highest" and strategy == "resident":
        if binary:
            bpath = binary_path
        elif tiles.dtype == jnp.bfloat16 and binary_path == "planes_n":
            # bf16-exact valued tiles (e.g. 0/1 stored as bf16 values):
            # the wide-plane body at fp32 parity, no expansion at all.
            bpath = "planes_n"
    K_all, Npad = x.shape
    if bpath == "planes_k":
        K_all //= 3
    elif bpath == "planes_n":
        Npad //= 3
    NB = n_block
    nj = Npad // NB
    # Mosaic requires a 32-bit matmul accumulator: a bf16 X panel still
    # produces an f32 Y (callers may narrow afterwards).
    out_dtype = (
        jnp.float32
        if bpath in ("planes_k", "planes_n") or x.dtype == jnp.bfloat16
        else x.dtype
    )

    if strategy == "resident":
        # Cap SG·TM (output rows per grid step): the batched bitmask
        # expansion materializes (SG, TB, TM, TK) f32 in VMEM — at
        # tile_m=128 the full SG=8 group is 16 MB and OOMs scoped vmem.
        SG, TB = _pick_batch(ns, T, tile_m, tile_k, binary)
        if bpath == "planes_k":
            body = functools.partial(
                _spmm_resident_body_binary3,
                tile_k, tile_m, SG, TB, T, K_all,
            )
        elif bpath == "planes_n":
            body = functools.partial(
                _spmm_resident_body_wide,
                tile_k, tile_m, SG, TB, T, NB, binary,
            )
        else:
            body = functools.partial(
                _spmm_resident_body, binary, tile_k, tile_m, SG, TB, T, prec
            )
        xnb = 3 * NB if bpath == "planes_n" else NB
        x_spec = pl.BlockSpec(
            x.shape[:1] + (xnb,),
            lambda j, i, t, s: (0, j),
            memory_space=pltpu.VMEM,
        )
        tiles_spec = pl.BlockSpec(
            (SG, TB, tile_m, tiles.shape[-1]),
            lambda j, i, t, s: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (SG * tile_m, NB), lambda j, i, t, s: (i, j), memory_space=pltpu.VMEM
        )
        grid = (nj, ns // SG, T // TB)
    else:
        body = functools.partial(_spmm_streamed_body, binary, tile_k, prec)
        x_spec = pl.BlockSpec(
            (tile_k, NB),
            lambda j, i, t, s: (s[i * T + t], j),
            memory_space=pltpu.VMEM,
        )
        tiles_spec = pl.BlockSpec(
            (1, 1, tile_m, tiles.shape[-1]),
            lambda j, i, t, s: (i, t, 0, 0),
            memory_space=pltpu.VMEM,
        )
        out_spec = pl.BlockSpec(
            (tile_m, NB), lambda j, i, t, s: (i, j), memory_space=pltpu.VMEM
        )
        grid = (nj, ns, T)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[tiles_spec, x_spec],
        out_specs=out_spec,
    )
    flops = 2 * ns * T * tile_m * tile_k * Npad
    abytes = tiles.size * tiles.dtype.itemsize
    xbytes = (
        x.size * x.dtype.itemsize
        if strategy == "resident"
        else ns * T * tile_k * Npad * x.dtype.itemsize
    )
    with named(f"bucket_spmm_{strategy}_{bpath}"):
        return pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns * tile_m, Npad), out_dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops, bytes_accessed=abytes + xbytes, transcendentals=0
            ),
            interpret=_interpret(),
        )(slab_ids.reshape(-1), tiles, x)


# ---------------------------------------------------------------------------
# Panel kernel: Y[strip] = panel(i) @ X[start(i)·TK : start(i)·TK + PK]
# One dynamic slice + one wide MXU dot per strip (PanelBucket layout) —
# no per-tile loop, no tile-count padding, no accumulation grid axis.
# ---------------------------------------------------------------------------


def _panel_body(
    binary, PK, TK, TM, SG, NB, fold, prec,
    seg_ref, start_ref, panels_ref, x_ref, o_ref,
):
    del seg_ref  # consumed by the X BlockSpec index map only
    i = pl.program_id(1)
    # whole (SG, TM, PK) block expanded in ONE call when bitmask (batched
    # VPU expansion amortizes — see _expand_bits)
    mats = (
        _block_mats(panels_ref[:], True, PK, jnp.float32)
        if binary
        else panels_ref[:]
    )
    for g in range(SG):
        st = start_ref[i * SG + g]
        a = mats[g]
        if binary:
            # exact: the 0/1 mask is bf16-representable; one MXU pass per
            # X plane instead of HIGHEST's six
            a = a.astype(jnp.bfloat16)
        elif a.dtype == jnp.int8:
            # half the panel DMA bytes of bf16; small-int values are
            # exact through the bf16 cast (binary_tiles="int8" default)
            a = a.astype(jnp.bfloat16)
        xs = x_ref[pl.ds(st * TK, PK), :]
        if fold == "f32":
            # fp32-parity planes computed IN-KERNEL on the (PK, NB) slice:
            # X stays a plain f32 resident (4 B/col-elem vs the 6 B of the
            # pre-split 3-plane layout), and the XLA-level plane prep —
            # measured ~40% of headline device time in the 2026-08-19
            # trace (docs/TRACE.md) — disappears. bf16 casts are exact
            # rounding steps; the three dots reproduce the wide fold.
            x0 = xs.astype(jnp.bfloat16)
            r1 = xs - x0.astype(jnp.float32)
            x1 = r1.astype(jnp.bfloat16)
            x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            d = (
                jnp.dot(a, x0, preferred_element_type=o_ref.dtype)
                + jnp.dot(a, x1, preferred_element_type=o_ref.dtype)
                + jnp.dot(a, x2, preferred_element_type=o_ref.dtype)
            )
            o_ref[pl.ds(g * TM, TM), :] = d
            continue
        a, xs = _match_dot_dtypes(a, xs)
        p = None if a.dtype == jnp.bfloat16 else prec
        d = jnp.dot(a, xs, preferred_element_type=o_ref.dtype, precision=p)
        if fold:  # 3 bf16 X planes stacked along lanes -> fp32 parity
            d = d[:, :NB] + d[:, NB : 2 * NB] + d[:, 2 * NB :]
        o_ref[pl.ds(g * TM, TM), :] = d


def _pick_panel_group(ns: int, tile_m: int, PK: int, binary: bool, itemsize: int):
    """Strips per grid step: largest of (8, 4, 2, 1) dividing ns whose
    double-buffered panel block (+ batched bitmask expansion) fits the
    same 4 MB VMEM allowance as `_pick_batch`."""
    for SG in (8, 4, 2, 1):
        if ns % SG:
            continue
        blk = SG * tile_m * (PK // 8 if binary else PK * itemsize)
        exp = SG * tile_m * PK * 4 if binary else 0
        if 2 * blk + exp <= 4 * 1024 * 1024:
            return SG
    return 1


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_k", "width", "binary", "n_block", "fold",
        "precision", "x_rows",
    ),
)
def panel_spmm(
    start_slabs,  # int32[ns]
    panels,  # dtype[ns, TM, PK] | uint32[ns, TM, PK//32]
    x,  # dtype[n_slabs*TK, Npad or 3*Npad] (resident VMEM)
    *,
    tile_m: int,
    tile_k: int,
    width: int,
    binary: bool,
    n_block: int,
    fold: bool,
    precision: str = "highest",
    x_rows: int | None = None,
    seg=None,  # int32[1] — which (x_rows)-row window of x is resident
) -> jax.Array:
    """One panel bucket's ``Y_b = A_b @ X``: returns f32[ns*TM, Npad].

    ``fold=True`` means ``x`` carries 3 bf16 planes per panel-j along the
    lane axis (``[x0_j | x1_j | x2_j]``, fp32-parity layout — see
    `bsr_ops._split_bf16_planes`); the body folds thirds after one wide
    dot. X must be VMEM-resident (callers segment columns to fit).

    ``x_rows``/``seg`` window a GLOBAL padded X: the resident block is rows
    ``[seg·x_rows, (seg+1)·x_rows)`` of ``x``, DMA'd by the BlockSpec —
    column-segmented callers thereby share one padded X across segments
    with zero per-segment host-level slice/pad copies. ``seg`` is a traced
    scalar-prefetch operand, so all segments share ONE compiled program."""
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    ns = start_slabs.shape[0]
    PK = width * tile_k
    NB = n_block
    # fold=True: x carries 3 pre-split bf16 planes along lanes.
    # fold="f32": x is plain f32; planes are computed in-kernel.
    xnb = 3 * NB if fold is True else NB
    Npad = x.shape[1] // 3 if fold is True else x.shape[1]
    nj = Npad // NB
    SG = _pick_panel_group(ns, tile_m, PK, binary, panels.dtype.itemsize)
    if x_rows is None:
        x_rows = x.shape[0]
    # unsegmented calls use a compile-time-constant X row-block index: a
    # traced sb[0] map forces Mosaic to double-buffer the resident X
    # (2x8.4 MB at 16k-col segments blew the 16 MB scoped-vmem limit)
    windowed = seg is not None
    if seg is None:
        seg = jnp.zeros((1,), jnp.int32)
    x_index = (
        (lambda j, i, sb, s: (sb[0], j))
        if windowed
        else (lambda j, i, sb, s: (0, j))
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nj, ns // SG),
        in_specs=[
            pl.BlockSpec(
                (SG, tile_m, panels.shape[-1]),
                lambda j, i, sb, s: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (x_rows, xnb),
                x_index,
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (SG * tile_m, NB),
            lambda j, i, sb, s: (i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    flops = 2 * ns * tile_m * PK * (3 * Npad if fold else Npad)
    abytes = panels.size * panels.dtype.itemsize
    with named(f"panel_spmm_w{width}"):
        return pl.pallas_call(
            functools.partial(
                _panel_body, binary, PK, tile_k, tile_m, SG, NB, fold, prec
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns * tile_m, Npad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=abytes + x_rows * xnb * nj * x.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(seg, start_slabs, panels, x)


# ---------------------------------------------------------------------------
# Mono-panel kernel: the WHOLE product in one launch. Grid (j, item); each
# item is one (TM, W·TK) panel: its X slice comes from the scalar-prefetch-
# selected window of the global padded X (windows replace column segments),
# its output lands directly at its strip's row block (items sorted by strip;
# first-flag selects init vs accumulate — consecutive same-strip items keep
# the output block resident in VMEM). No per-class launches, no assembly.
# ---------------------------------------------------------------------------


def _densecols_body(N, b_ref, q_ref, s_ref, o_ref):
    """Dense-column block product with IN-KERNEL radix fold: one
    (BR, D) int8 block row-panel x 3 resident int8 X planes -> (BR, N)
    f32. The XLA dot formulation materialized the (nrow, 3N) int32
    intermediate (402 MB on rmat s18, ~0.6 ms of pure fold traffic)."""
    a = b_ref[:]
    acc = None
    for p, w in ((0, 65536.0), (1, 256.0), (2, 1.0)):
        xs = q_ref[:, p * N : (p + 1) * N]
        d = jax.lax.dot_general(
            a, xs, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        ).astype(jnp.float32) * w
        acc = d if acc is None else acc + d
    o_ref[:] = acc * s_ref[0:1, :]


@jax.jit
def densecols_spmm_pallas(block, q3, s8) -> jax.Array:
    """``Y = block @ X_sel`` for a lane-padded DenseCols block.

    block: int8[nrow, D] (D a 128 multiple); q3: int8[D, 3N] radix-256
    planes of the selected X rows (N a 128 multiple); s8: f32[8, N]
    per-column recombination scale. Returns f32[nrow, N]. The block
    streams exactly once."""
    nrow, D = block.shape
    N = q3.shape[1] // 3
    BR = next(b for b in (512, 256, 128, 64, 32) if nrow % b == 0)
    return pl.pallas_call(
        functools.partial(_densecols_body, N),
        grid=(nrow // BR,),
        in_specs=[
            pl.BlockSpec((BR, D), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((D, 3 * N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, N), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BR, N), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nrow, N), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * nrow * D * 3 * N,
            bytes_accessed=block.size + q3.size + nrow * N * 4,
            transcendentals=0,
        ),
        interpret=_interpret(),
    )(block, q3, s8)


def _colmax_body(x_ref, o_ref):
    m = jnp.max(jnp.abs(x_ref[:]), axis=0, keepdims=True)
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    o_ref[:] = jnp.maximum(o_ref[:], jnp.broadcast_to(m, o_ref.shape))


@jax.jit
def colmax_pallas(Xp) -> jax.Array:
    """Per-column abs-max of f32 (K, Npad): returns f32 (8, Npad) (all
    rows equal). The XLA column reduction ran at ~147 GB/s on the
    (51200, 128) headline X (0.036 ms traced; floor ~0.010) — this
    sequential-accumulate kernel reads X once at DMA rate."""
    K, Npad = Xp.shape
    BR = next(b for b in (2048, 1024, 512, 256, 128, 64, 32, 8)
              if K % b == 0)
    return pl.pallas_call(
        _colmax_body,
        grid=(K // BR,),
        in_specs=[
            pl.BlockSpec((BR, Npad), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((8, Npad), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, Npad), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=_interpret(),
    )(Xp)


def _quant3_body(NB, x_ref, sinv_ref, o_ref):
    """Radix-256 3-plane int8 quantization, one pass: read an f32 X
    block, write its [q0|q1|q2] int8 planes. The XLA formulation of the
    same computation measured 0.056 ms on the (51200, 128) headline X —
    2x its bandwidth floor (materialized int32/int8 intermediates);
    this kernel pins the single read+write pass (~0.03 ms)."""
    X = x_ref[:]
    i = jnp.round(X * sinv_ref[0:1, :]).astype(jnp.int32)
    q2 = ((i + 128) & 255) - 128
    i1 = (i - q2) >> 8
    q1 = ((i1 + 128) & 255) - 128
    q0 = (i1 - q1) >> 8
    # one concatenated store beat three lane-slice stores in 3 of 4
    # interleaved A/B pairs (probe_quant3_tpu, 2026-08-21)
    o_ref[:] = jnp.concatenate(
        [q0.astype(jnp.int8), q1.astype(jnp.int8), q2.astype(jnp.int8)],
        axis=1,
    )


@functools.partial(jax.jit, static_argnames=("n_block",))
def quant3_planes_pallas(Xp, sinv, *, n_block: int) -> jax.Array:
    """f32 (K, Npad) + per-column 1/scale f32 (8, Npad) -> int8
    (K, nj·3·NB) planes in the mono fold="i8" lane layout
    (``[q0_j | q1_j | q2_j]`` per NB panel). K must be a multiple of 32
    (int8 sublane tile); callers' K is always a tile_k=128 multiple.
    Scale semantics match `bsr_ops._quant3_carry` exactly (same round,
    same radix extraction)."""
    K, Npad = Xp.shape
    NB = n_block
    nj = Npad // NB
    BR = next(b for b in (1024, 512, 256, 128, 64, 32) if K % b == 0)
    return pl.pallas_call(
        functools.partial(_quant3_body, NB),
        grid=(K // BR, nj),
        in_specs=[
            pl.BlockSpec((BR, NB), lambda i, j: (i, j),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, NB), lambda i, j: (0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (BR, 3 * NB), lambda i, j: (i, j), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((K, nj * 3 * NB), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )(Xp, sinv)


def _i8_dot(a, xs):
    """One s8×s8→s32 MXU pass (2× the bf16 rate on v5e — probed
    313 vs 174 TOPS, probe_exact_out 2026-08-20), widened to f32.
    Accumulator values stay < 2^24 (PK·127·127), so the cast is exact."""
    d = jax.lax.dot_general(
        a, xs, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return d.astype(jnp.float32)


def _mono_body(
    binary, PK, TK, TM, NB, fold, prec, has_scale,
    *refs,
):
    if has_scale:
        (win_ref, strip_ref, start_ref, first_ref, panels_ref, x_ref,
         s_ref, o_ref, *scratch) = refs
    else:
        (win_ref, strip_ref, start_ref, first_ref, panels_ref, x_ref,
         o_ref, *scratch) = refs
        s_ref = None
    del strip_ref  # consumed by the out BlockSpec index map
    i = pl.program_id(1)
    a = panels_ref[0]  # (TM, PKstore)
    i8x = fold in ("i8", "i8w") or (
        a.dtype == jnp.int8 and x_ref.dtype == jnp.int8
    )
    if binary:
        # the 0/1 mask is exact in bf16: one MXU pass per X plane on the
        # parity paths (fold / bf16-packed narrow X)
        a = _expand_bits(a, PK, jnp.float32)
        if fold or x_ref.dtype == jnp.bfloat16:
            a = a.astype(jnp.bfloat16)
    elif a.dtype == jnp.int8 and not i8x:
        # half the panel DMA bytes of bf16; small-int values are exact
        # through the bf16 cast, so the parity paths still apply
        a = a.astype(jnp.bfloat16)
    st = start_ref[i]
    if fold == "i8w":
        # ONE wide s8 dot over all 3 plane blocks (3NB lanes) + an
        # in-kernel radix fold — same arithmetic as fold="i8"'s 3 dots
        # but a single MXU issue per item (the narrow path already
        # works this way)
        xs = x_ref[pl.ds(st * TK, PK), :]
        d3 = _i8_dot(a, xs)
        d = (
            d3[:, :NB] * 65536.0
            + d3[:, NB : 2 * NB] * 256.0
            + d3[:, 2 * NB :]
        ) * s_ref[0:1, :]
    elif fold == "i8":
        # radix-256 int8 planes [q0_j|q1_j|q2_j]: 3 s8 MXU passes, f32
        # recombination (d0 < 2^24 ⇒ the 2^16/2^8 weights are exact),
        # per-column scale from the prep (bsr_ops._quant3_planes)
        acc = None
        for p, w in ((0, 65536.0), (1, 256.0), (2, 1.0)):
            xs = x_ref[pl.ds(st * TK, PK), p * NB : (p + 1) * NB]
            df = _i8_dot(a, xs) * w
            acc = df if acc is None else acc + df
        d = acc * s_ref[0:1, :]
    elif i8x:
        # narrow int8 planes: ONE s8 dot over all 3·nq lanes; the radix
        # fold happens at the XLA level (bsr_ops._fold_narrow_q)
        xs = x_ref[pl.ds(st * TK, PK), :]
        d = _i8_dot(a, xs)
    elif fold == "f32" and not scratch:
        # per-item plane split — the DEFAULT: the per-window scratch
        # variant below measured ~2x SLOWER in-process (0.57 vs 0.31 ms,
        # probe_mono6 2026-08-20: reading 3 plane slices from VMEM
        # scratch costs more than recomputing them from one xs read)
        xs = x_ref[pl.ds(st * TK, PK), :]
        x0 = xs.astype(jnp.bfloat16)
        r1 = xs - x0.astype(jnp.float32)
        x1 = r1.astype(jnp.bfloat16)
        x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
        d = (
            jnp.dot(a, x0, preferred_element_type=jnp.float32)
            + jnp.dot(a, x1, preferred_element_type=jnp.float32)
            + jnp.dot(a, x2, preferred_element_type=jnp.float32)
        )
    elif fold == "f32":
        # per-WINDOW planes in VMEM scratch (opt-in scratch_planes=True;
        # measured slower than the per-item split — kept as probe
        # evidence, see probe_mono6)
        planes = scratch[0]

        @pl.when((i == 0) | (win_ref[i] != win_ref[jnp.maximum(i - 1, 0)]))
        def _():
            xw = x_ref[:]
            x0 = xw.astype(jnp.bfloat16)
            r1 = xw - x0.astype(jnp.float32)
            x1 = r1.astype(jnp.bfloat16)
            x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            planes[:, :NB] = x0
            planes[:, NB : 2 * NB] = x1
            planes[:, 2 * NB :] = x2

        d = (
            jnp.dot(
                a, planes[pl.ds(st * TK, PK), :NB],
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                a, planes[pl.ds(st * TK, PK), NB : 2 * NB],
                preferred_element_type=jnp.float32,
            )
            + jnp.dot(
                a, planes[pl.ds(st * TK, PK), 2 * NB :],
                preferred_element_type=jnp.float32,
            )
        )
    else:
        xs = x_ref[pl.ds(st * TK, PK), :]
        a, xs = _match_dot_dtypes(a, xs)
        p = None if a.dtype == jnp.bfloat16 else prec
        d = jnp.dot(a, xs, preferred_element_type=jnp.float32, precision=p)
        if fold:  # 3 bf16 X planes stacked along lanes -> fp32 parity
            d = d[:, :NB] + d[:, NB : 2 * NB] + d[:, 2 * NB :]

    f = first_ref[i]

    @pl.when(f == 1)
    def _():
        o_ref[:] = d

    @pl.when(f == 0)
    def _():
        o_ref[:] += d


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_k", "width", "win_slabs", "binary", "n_block",
        "fold", "precision", "out_rows", "scratch_planes",
    ),
)
def mono_panel_spmm(
    window,  # int32[ni] — X window block of each item
    strip_ids,  # int32[ni] — output row block of each item (ascending)
    start_rel,  # int32[ni] — item start slab, window-relative
    first,  # int32[ni] — 1 on a strip's first item
    panels,  # dtype[ni, TM, PK] | uint32[ni, TM, PK//32]
    x,  # dtype[n_windows·win_slabs·TK, Npad (3·Npad when fold=True/"i8")]
    *,
    tile_m: int,
    tile_k: int,
    width: int,
    win_slabs: int,
    binary: bool,
    n_block: int,
    fold,
    precision: str = "highest",
    out_rows: int | None = None,
    scratch_planes: bool = False,
    scale=None,  # f32[1, Npad] — fold="i8" per-column recombination scale
) -> jax.Array:
    """``Y = A @ X`` for a MonoPanelBucket in ONE kernel launch.

    Returns f32[out_rows, Npad]. Every output row block must be covered by
    at least one item (empty strips carry zero items — see
    `formats.bsr.MonoPanelBucket`); ``out_rows`` defaults to
    ``(max strip + 1)·TM`` and must be a TM multiple.

    ``fold="i8"`` marks radix-256 int8 X planes (``x`` int8, 3·Npad
    lanes, ``scale`` required — see `bsr_ops._quant3_planes`): 3 s8 MXU
    passes per item at 2× the bf16 rate, exact f32 recombination.
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    ni = strip_ids.shape[0]
    PK = width * tile_k
    NB = n_block
    three = fold in (True, "i8", "i8w")
    xnb = 3 * NB if three else NB
    Npad = x.shape[1] // 3 if three else x.shape[1]
    nj = Npad // NB
    win_rows = win_slabs * tile_k
    assert x.shape[0] % win_rows == 0
    has_scale = fold in ("i8", "i8w")
    if has_scale:
        assert scale is not None

    scratch = (
        [pltpu.VMEM((win_rows, 3 * NB), jnp.bfloat16)]
        if fold == "f32" and scratch_planes
        else []
    )
    in_specs = [
        pl.BlockSpec(
            (1, tile_m, panels.shape[-1]),
            lambda j, i, sw, ss, sr, sf: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (win_rows, xnb),
            lambda j, i, sw, ss, sr, sf: (sw[i], j),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [window, strip_ids, start_rel, first, panels, x]
    if has_scale:
        in_specs.append(
            pl.BlockSpec(
                (8, NB),
                lambda j, i, sw, ss, sr, sf: (0, j),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.broadcast_to(scale, (8, Npad)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(nj, ni),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (tile_m, NB),
            lambda j, i, sw, ss, sr, sf: (ss[i], j),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=scratch,
    )
    flops = 2 * ni * tile_m * PK * (3 * Npad if fold else Npad)
    abytes = panels.size * panels.dtype.itemsize
    with named("mono_spmm"):
        return pl.pallas_call(
            functools.partial(
                _mono_body, binary, PK, tile_k, tile_m, NB, fold, prec,
                has_scale,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((out_rows, Npad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=abytes + x.size * x.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(*args)


# ---------------------------------------------------------------------------
# Grouped mono kernel: G strips per grid step (the panel kernel's SG trick
# applied to the single-launch layout — G=1 -> G=8 measured ~3.3x less
# per-item overhead, probe_mono3/4). Preconditions the builder guarantees:
# exactly ONE item per strip (uniform width W), strips G-aligned per step,
# all G strips of a step read the SAME prefetched X window, output written
# once (no accumulate branch). Entries a strip's single item cannot cover
# (window clamp / span > W) live in a SIDE MonoPanelBucket handled by
# `mono_panel_spmm` + a strip scatter-add (ops.bsr_ops._mono_impl).
# ---------------------------------------------------------------------------


def _mono_g_body(
    binary, PK, TK, TM, NB, G, fold, prec, has_scale,
    *refs,
):
    if has_scale:
        win_ref, start_ref, panels_ref, x_ref, s_ref, o_ref = refs
    else:
        win_ref, start_ref, panels_ref, x_ref, o_ref = refs
        s_ref = None
    del win_ref  # consumed by the X BlockSpec index map
    i = pl.program_id(1)
    for g in range(G):
        a = panels_ref[g]
        i8x = fold in ("i8", "i8w") or (
            a.dtype == jnp.int8 and x_ref.dtype == jnp.int8
        )
        if binary:
            a = _expand_bits(a, PK, jnp.float32)
            if fold or x_ref.dtype == jnp.bfloat16:
                a = a.astype(jnp.bfloat16)
        elif a.dtype == jnp.int8 and not i8x:
            a = a.astype(jnp.bfloat16)
        st = start_ref[i * G + g]
        if fold == "i8w":
            xs = x_ref[pl.ds(st * TK, PK), :]
            d3 = _i8_dot(a, xs)
            o_ref[pl.ds(g * TM, TM), :] = (
                d3[:, :NB] * 65536.0
                + d3[:, NB : 2 * NB] * 256.0
                + d3[:, 2 * NB :]
            ) * s_ref[0:1, :]
            continue
        if fold == "i8":
            acc = None
            for p, w in ((0, 65536.0), (1, 256.0), (2, 1.0)):
                xs = x_ref[pl.ds(st * TK, PK), p * NB : (p + 1) * NB]
                df = _i8_dot(a, xs) * w
                acc = df if acc is None else acc + df
            o_ref[pl.ds(g * TM, TM), :] = acc * s_ref[0:1, :]
            continue
        xs = x_ref[pl.ds(st * TK, PK), :]
        if i8x:
            o_ref[pl.ds(g * TM, TM), :] = _i8_dot(a, xs)
            continue
        if fold == "f32":
            x0 = xs.astype(jnp.bfloat16)
            r1 = xs - x0.astype(jnp.float32)
            x1 = r1.astype(jnp.bfloat16)
            x2 = (r1 - x1.astype(jnp.float32)).astype(jnp.bfloat16)
            d = (
                jnp.dot(a, x0, preferred_element_type=jnp.float32)
                + jnp.dot(a, x1, preferred_element_type=jnp.float32)
                + jnp.dot(a, x2, preferred_element_type=jnp.float32)
            )
        else:
            a, xs = _match_dot_dtypes(a, xs)
            p = None if a.dtype == jnp.bfloat16 else prec
            d = jnp.dot(
                a, xs, preferred_element_type=jnp.float32, precision=p
            )
            if fold:
                d = d[:, :NB] + d[:, NB : 2 * NB] + d[:, 2 * NB :]
        o_ref[pl.ds(g * TM, TM), :] = d


@functools.partial(
    jax.jit,
    static_argnames=(
        "tile_m", "tile_k", "width", "win_slabs", "binary", "n_block",
        "fold", "precision", "group",
    ),
)
def mono_group_spmm(
    windows,  # int32[ng] — X window block per strip-GROUP
    starts,  # int32[ns] — item start slab per strip, window-relative
    panels,  # dtype[ns, TM, PK] | uint32[ns, TM, PK//32]
    x,  # dtype[n_windows·win_slabs·TK, Npad (3·Npad when fold=True)]
    *,
    tile_m: int,
    tile_k: int,
    width: int,
    win_slabs: int,
    binary: bool,
    n_block: int,
    fold,
    precision: str = "highest",
    group: int = 8,
    scale=None,
) -> jax.Array:
    """``Y = A @ X`` for a MonoGroupBucket in ONE launch, G strips/step.

    Returns f32[ns·TM, Npad]; ``ns`` must be a multiple of ``group``.
    ``fold="i8"`` as in `mono_panel_spmm` (radix-256 int8 X planes).
    """
    prec = (
        jax.lax.Precision.HIGHEST
        if precision == "highest"
        else jax.lax.Precision.DEFAULT
    )
    ns = starts.shape[0]
    G = group
    assert ns % G == 0
    PK = width * tile_k
    NB = n_block
    three = fold in (True, "i8", "i8w")
    xnb = 3 * NB if three else NB
    Npad = x.shape[1] // 3 if three else x.shape[1]
    nj = Npad // NB
    win_rows = win_slabs * tile_k
    assert x.shape[0] % win_rows == 0
    has_scale = fold in ("i8", "i8w")
    if has_scale:
        assert scale is not None

    in_specs = [
        pl.BlockSpec(
            (G, tile_m, panels.shape[-1]),
            lambda j, i, sw, ss: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        pl.BlockSpec(
            (win_rows, xnb),
            lambda j, i, sw, ss: (sw[i], j),
            memory_space=pltpu.VMEM,
        ),
    ]
    args = [windows, starts, panels, x]
    if has_scale:
        in_specs.append(
            pl.BlockSpec(
                (8, NB),
                lambda j, i, sw, ss: (0, j),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(jnp.broadcast_to(scale, (8, Npad)))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nj, ns // G),
        in_specs=in_specs,
        out_specs=pl.BlockSpec(
            (G * tile_m, NB),
            lambda j, i, sw, ss: (i, j),
            memory_space=pltpu.VMEM,
        ),
    )
    flops = 2 * ns * tile_m * PK * (3 * Npad if fold else Npad)
    abytes = panels.size * panels.dtype.itemsize
    with named("mono_g_spmm"):
        return pl.pallas_call(
            functools.partial(
                _mono_g_body, binary, PK, tile_k, tile_m, NB, G, fold,
                prec, has_scale,
            ),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((ns * tile_m, Npad), jnp.float32),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("arbitrary", "arbitrary"),
            ),
            cost_estimate=pl.CostEstimate(
                flops=flops,
                bytes_accessed=abytes + x.size * x.dtype.itemsize,
                transcendentals=0,
            ),
            interpret=_interpret(),
        )(*args)


# ---------------------------------------------------------------------------
# SpMV kernel: y[strip] = sum_t tile(i,t) @ x[slab(i,t)]
# x resident in VMEM as (n_slabs, TK); per-strip lane reduction at t == T-1.
# ---------------------------------------------------------------------------


_SPMV_GROUP = 8  # strips per grid step (Mosaic wants >= 8 output sublanes)


def _spmv_body(binary, TK, TB, T, slab_ref, tiles_ref, x_ref, o_ref, acc_ref):
    i = pl.program_id(0)
    t = pl.program_id(1)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    mats = _block_mats(tiles_ref[:], binary, TK, o_ref.dtype)
    for g in range(_SPMV_GROUP):
        acc = None
        for u in range(TB):
            slab = slab_ref[(i * _SPMV_GROUP + g) * T + t * TB + u]
            xs = x_ref[pl.ds(slab, 1), :]  # (1, TK)
            d = mats[g, u] * xs
            acc = d if acc is None else acc + d
        acc_ref[g] += acc

    @pl.when(t == pl.num_programs(1) - 1)
    def _():
        # (G, TM, TK) -> per-strip row sums -> (G, TM) output block.
        o_ref[:] = jnp.sum(acc_ref[:], axis=2)


@functools.partial(jax.jit, static_argnames=("tile_m", "tile_k", "binary"))
def bucket_spmv(
    slab_ids,  # int32[ns, T]
    tiles,
    x,  # dtype[n_slabs, TK]
    *,
    tile_m: int,
    tile_k: int,
    binary: bool,
) -> jax.Array:
    """One bucket's ``y_b = A_b @ x``: returns dtype[ns, TM]."""
    ns, T = slab_ids.shape
    out_dtype = x.dtype
    G = _SPMV_GROUP
    assert ns % G == 0, f"bucket ns={ns} not a multiple of {G}"
    TB = _TB if T % _TB == 0 else (2 if T % 2 == 0 else 1)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(ns // G, T // TB),
        in_specs=[
            pl.BlockSpec(
                (G, TB, tile_m, tiles.shape[-1]),
                lambda i, t, s: (i, t, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # x fully resident
        ],
        out_specs=pl.BlockSpec(
            (G, tile_m), lambda i, t, s: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((G, tile_m, tile_k), out_dtype)],
    )
    return pl.pallas_call(
        functools.partial(_spmv_body, binary, tile_k, TB, T),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((ns, tile_m), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(slab_ids.reshape(-1), tiles, x)


def pick_strategy(
    n_slabs: int,
    tile_k: int,
    n_block: int,
    itemsize: int,
    total_tiles: int,
    n_panels: int,
) -> str:
    """Choose X placement by modeled HBM bytes.

    resident: X DMA'd once per panel sweep -> n_slabs·TK·NB·itemsize each.
    streamed: one slab DMA per tile       -> tiles·TK·NB·itemsize each.
    Resident additionally must fit the VMEM budget.
    """
    x_panel_bytes = n_slabs * tile_k * n_block * itemsize
    if x_panel_bytes > RESIDENT_VMEM_BUDGET:
        return "streamed"
    # Strongly prefer resident: the streamed kernel runs one tile per grid
    # step (grid overhead + 4 KB DMAs); resident batches SG×TB tiles.
    return "resident"
