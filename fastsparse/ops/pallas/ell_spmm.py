"""Pallas TPU gather engine: SpMM / SpMV over bucketed ELL rows.

The tiled-BSR MXU path (`bsr_spmm`) wins when reordering produces dense
tiles; for *hypersparse* structure (≈1 nnz per (8×128) tile — e.g. random
power-law with ~60 nnz/row over 64k columns) tile padding makes it move
hundreds of bytes per nonzero. This engine is the TPU answer to the
reference's CSR row loop (SURVEY.md §3.2) for that regime:

* the dense operand panel X lives **resident in VMEM** (column segments
  must fit — the dispatcher picks the panel width);
* each nonzero is one dynamic sublane slice ``x_ref[pl.ds(col, 1), :]`` —
  a VREG row load at ~1/cycle issue rate — times its value, accumulated
  in registers and written once per (row, step);
* no MXU, no bf16 passes: pure f32 multiply-adds ⇒ exact fp32 parity.

Per-nnz cost is instruction-rate bound (~1–2 ns/nnz), independent of
sparsity pattern — the robust floor for unclustered matrices. Column
indices are scalar-prefetched (flat, SMEM — see CLAUDE.md for the 2-D
lane-padding trap); buckets are chunked by the caller to fit SMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...utils.profiling import named

__all__ = [
    "ell_bucket_spmm",
    "ell_bucket_spmm_smem",
    "ell_bucket_spmm_dd",
    "ell_bucket_spmm_dd_valued",
    "ELL_GROUP",
    "SMEM_BLOCK_K_UNIT",
    "SMEM_BLOCK_K_VALUED",
]

ELL_GROUP = 8  # bucket rows per grid step (>= 8 output sublanes)
_N_ACC = 4  # independent accumulators per row (breaks VPU add latency chain)
_KB_MAX = 16  # entries unrolled per grid step per row
# Whole-row unroll cap: buckets with K <= this run ONE grid step per row
# group — no zero-init pass, no += read-modify-write on o_ref, no t-grid
# arithmetic. Measured 1.18-1.32 ns/slot vs the chunked body's 1.52-1.70
# across three interleaved A/B runs (probe_gather3_tpu, v5e 2026-08-21) —
# the only variant that won every run.
_FULL_K_MAX = 64
# Packed column pairs (two 16-bit columns per int32 SMEM word) for large-K
# unit buckets: halves both the scalar loads per slot and the SMEM
# prefetch footprint (=> half the chunk launches on hypersparse rows).
# Legal when every column (incl. the sentinel) is < 2^16 — the engine is
# column-segmented at <=24064 cols so this holds for all segmented paths.
_PACKED_KB_MAX = 32  # packed-pair entries unrolled per grid step


def packed_pair_ok(K: int, nx_rows: int) -> bool:
    """True when a unit bucket of width K against an X panel with
    ``nx_rows`` rows (sentinel included) may use the packed-pair body.

    Caller invariant (pinned here — ADVICE r4): every column value,
    sentinel included, must be a valid row index of the X panel, i.e.
    ``cols.max() < nx_rows <= 2**16``. The builders guarantee this (cols
    index the segment's padded X; the unit sentinel is ``ncol`` and
    ``rows_pad = round_up(ncol+1, 8) == nx_rows``); a column >= nx_rows
    would be an out-of-bounds X read regardless of packing, so the
    16-bit pack introduces no NEW failure mode for in-range inputs.
    ``utils.debug.validate`` checks the col-range invariant host-side.
    """
    return K % 2 == 0 and nx_rows <= 65536


def _pick_kb(K: int) -> int:
    """Entries per grid step: the largest divisor of K that is <= _KB_MAX.

    The t-grid is ``K // KB`` steps - KB MUST divide K or the kernel
    silently drops the remainder entries (the 2026-08-17 tune=True bug:
    interval-DP widths like 18/24/35 lost rows' tails at rel ~0.4).
    Pow2 widths always hit KB=16; odd widths degrade gracefully.
    """
    for kb in range(min(_KB_MAX, K), 0, -1):
        if K % kb == 0:
            return kb
    return 1


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _body(K, KB, G, cols_ref, vals_ref, x_ref, o_ref):
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        # Independent accumulators break the add dependency chain (VPU
        # add latency would otherwise serialize the unrolled loop).
        accs = [None] * _N_ACC
        for u in range(KB):
            k = (i * G + g) * K + t * KB + u
            c = cols_ref[k]
            # vals live in SMEM (scalar prefetch): arbitrary-index scalar
            # reads are legal there, unlike VMEM lane offsets.
            v = vals_ref[k]
            xr = x_ref[pl.ds(c, 1), :]  # (1, NB) — one VREG row
            d = xr * v
            a = u % _N_ACC
            accs[a] = d if accs[a] is None else accs[a] + d
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


def _body_unit(K, KB, G, cols_ref, x_ref, o_ref):
    """Binary (unit-values) variant: padding columns point at a zero X
    row (sentinel), so each nonzero is a bare load+add — no value fetch,
    no multiply."""
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        accs = [None] * _N_ACC
        for u in range(KB):
            k = (i * G + g) * K + t * KB + u
            c = cols_ref[k]
            xr = x_ref[pl.ds(c, 1), :]
            a = u % _N_ACC
            accs[a] = xr if accs[a] is None else accs[a] + xr
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


def _body_full(K, G, unit, cols_ref, *rest):
    """Whole-row unroll (K <= _FULL_K_MAX): one grid step per row group,
    direct store — no zero-init pass, no += read on o_ref."""
    if unit:
        x_ref, o_ref = rest
    else:
        vals_ref, x_ref, o_ref = rest
    i = pl.program_id(1)
    for g in range(G):
        accs = [None] * _N_ACC
        for u in range(K):
            k = (i * G + g) * K + u
            c = cols_ref[k]
            xr = x_ref[pl.ds(c, 1), :]
            d = xr if unit else xr * vals_ref[k]
            a = u % _N_ACC
            accs[a] = d if accs[a] is None else accs[a] + d
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] = acc


def _body_full_packed(K2, G, cols_ref, x_ref, o_ref):
    """Whole-row unroll over PACKED column pairs: one grid step per row
    group, direct store, half the SMEM scalar loads — the fastest body
    (0.91 ns/slot vs full-unpacked 1.10 and chunked 1.25, probe_gather6
    v5e 2026-08-21). Requires even K and 16-bit columns."""
    i = pl.program_id(1)
    for g in range(G):
        accs = [None] * _N_ACC
        for u in range(K2):
            k = (i * G + g) * K2 + u
            p = cols_ref[k]
            c0 = jax.lax.bitwise_and(p, jnp.int32(0xFFFF))
            c1 = jax.lax.shift_right_logical(p, jnp.int32(16))
            xr0 = x_ref[pl.ds(c0, 1), :]
            xr1 = x_ref[pl.ds(c1, 1), :]
            a0 = (2 * u) % _N_ACC
            a1 = (2 * u + 1) % _N_ACC
            accs[a0] = xr0 if accs[a0] is None else accs[a0] + xr0
            accs[a1] = xr1 if accs[a1] is None else accs[a1] + xr1
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] = acc


def _pack_pairs(cols):
    """int32[nb, K even] -> packed int32[nb*K/2] (c0 | c1<<16)."""
    c0 = cols[:, 0::2].astype(jnp.int32)
    c1 = cols[:, 1::2].astype(jnp.int32)
    return jax.lax.bitwise_or(
        c0, jax.lax.shift_left(c1, jnp.int32(16))
    ).reshape(-1)


def _body_unit_packed(K2, KB2, G, cols_ref, x_ref, o_ref):
    """Unit gather over PACKED column pairs (c0 | c1<<16 per int32): half
    the SMEM scalar loads per slot; unpack is one and + one shift on the
    scalar core. K2 = K//2 packed entries per row."""
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        accs = [None] * _N_ACC
        for u in range(KB2):
            k = (i * G + g) * K2 + t * KB2 + u
            p = cols_ref[k]
            c0 = jax.lax.bitwise_and(p, jnp.int32(0xFFFF))
            c1 = jax.lax.shift_right_logical(p, jnp.int32(16))
            xr0 = x_ref[pl.ds(c0, 1), :]
            xr1 = x_ref[pl.ds(c1, 1), :]
            a0 = (2 * u) % _N_ACC
            a1 = (2 * u + 1) % _N_ACC
            accs[a0] = xr0 if accs[a0] is None else accs[a0] + xr0
            accs[a1] = xr1 if accs[a1] is None else accs[a1] + xr1
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


def _body_unit_dd(K, KB, G, K_rows, cols_ref, x_ref, ohi_ref, olo_ref):
    """Compensated (double-word) unit-values gather: fp64-class sums from
    f32 hardware. ``x_ref`` stacks hi/lo planes of the f64 operand
    ((2*K_rows, NB) f32); accumulation is an error-free TwoSum chain into
    (hi, lo) outputs — relative error ~2^-45 for moderate row lengths,
    comfortably under the fp64 parity bar (rtol 1e-10, BASELINE.json:5).
    """
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        ohi_ref[:] = jnp.zeros_like(ohi_ref)
        olo_ref[:] = jnp.zeros_like(olo_ref)

    for g in range(G):
        hi = ohi_ref[pl.ds(g, 1), :]
        lo = olo_ref[pl.ds(g, 1), :]
        for u in range(KB):
            k = (i * G + g) * K + t * KB + u
            c = cols_ref[k]
            bhi = x_ref[pl.ds(c, 1), :]
            blo = x_ref[pl.ds(K_rows + c, 1), :]
            # TwoSum(hi, bhi) -> (s, err); fold err and blo into lo
            s_ = hi + bhi
            bb = s_ - hi
            err = (hi - (s_ - bb)) + (bhi - bb)
            hi = s_
            lo = lo + (err + blo)
        ohi_ref[pl.ds(g, 1), :] = hi
        olo_ref[pl.ds(g, 1), :] = lo


def _body_dd_valued(
    K, KB, G, K_rows, cols_ref, vh_ref, vl_ref, x_ref, ohi_ref, olo_ref
):
    """Valued double-word gather: fp64-class ``Σ v_k · x[col_k]`` from f32
    hardware. Values arrive as two f32 planes (vh + vl == v to ~2^-48);
    the head product ``vh·xh`` is made exact with a Dekker split (the VPU
    exposes no FMA, so TwoProd-by-splitting is the error-free route), the
    cross terms ``vh·xl + vl·xh`` carry at f32 into the low word, and the
    running sum is a branch-free TwoSum chain — same shape as
    `_body_dd_unit`, ~20 vector ops per nonzero instead of 8.

    Magnitude caveat (standard Dekker): ``x·4097`` must not overflow —
    |x| < ~8e34, far beyond any sane fp64 workload's f32 head.
    """
    i = pl.program_id(1)
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        ohi_ref[:] = jnp.zeros_like(ohi_ref)
        olo_ref[:] = jnp.zeros_like(olo_ref)

    for g in range(G):
        hi = ohi_ref[pl.ds(g, 1), :]
        lo = olo_ref[pl.ds(g, 1), :]
        for u in range(KB):
            k = (i * G + g) * K + t * KB + u
            c = cols_ref[k]
            vh = vh_ref[k]
            vl = vl_ref[k]
            xh = x_ref[pl.ds(c, 1), :]
            xl = x_ref[pl.ds(K_rows + c, 1), :]
            # Dekker 12/12-bit splits (exact): scalar vh, vector xh
            vc = vh * 4097.0
            vhh = vc - (vc - vh)
            vhl = vh - vhh
            xc = xh * 4097.0
            xhh = xc - (xc - xh)
            xhl = xh - xhh
            p1 = vh * xh
            perr = vhl * xhl + (vhl * xhh + (vhh * xhl + (vhh * xhh - p1)))
            cross = vh * xl + vl * xh
            # branch-free TwoSum(hi, p1); residue + cross into the low word
            s = hi + p1
            bb = s - hi
            e = (hi - (s - bb)) + (p1 - bb)
            hi = s
            lo = lo + (e + (perr + cross))
        ohi_ref[pl.ds(g, 1), :] = hi
        olo_ref[pl.ds(g, 1), :] = lo


def _sweep_body(parts_meta, G, cols_ref, x_ref, o_ref):
    """Multi-width packed gather: ONE program sweeps several width
    buckets. ``parts_meta``: static tuple of (g0, g1, K2, wbase) — grid
    steps [g0, g1) process the part whose rows hold K2 packed column
    pairs starting at flat word ``wbase``. Each step writes its (G, NB)
    output block exactly once (blocks are part-concatenated, in layout
    order), so the per-width-class pallas launches — each re-DMAing the
    whole resident X panel (~11 MB, 46 calls/product on powerlaw 65k²)
    — collapse to one launch per SMEM chunk."""
    i = pl.program_id(1)
    for g0, g1, K2, wbase in parts_meta:

        @pl.when((i >= g0) & (i < g1))
        def _(g0=g0, K2=K2, wbase=wbase):
            for g in range(G):
                accs = [None] * _N_ACC
                for u in range(K2):
                    k = wbase + ((i - g0) * G + g) * K2 + u
                    p = cols_ref[k]
                    c0 = jax.lax.bitwise_and(p, jnp.int32(0xFFFF))
                    c1 = jax.lax.shift_right_logical(p, jnp.int32(16))
                    xr0 = x_ref[pl.ds(c0, 1), :]
                    xr1 = x_ref[pl.ds(c1, 1), :]
                    a0 = (2 * u) % _N_ACC
                    a1 = (2 * u + 1) % _N_ACC
                    accs[a0] = (
                        xr0 if accs[a0] is None else accs[a0] + xr0
                    )
                    accs[a1] = (
                        xr1 if accs[a1] is None else accs[a1] + xr1
                    )
                acc = accs[0]
                for a in accs[1:]:
                    if a is not None:
                        acc = acc + a
                o_ref[pl.ds(g, 1), :] = acc


@functools.partial(jax.jit, static_argnames=("n_block", "parts"))
def ell_sweep_spmm(flat_words, x, *, n_block: int, parts) -> jax.Array:
    """Unit-mode multi-bucket sweep: ``parts`` is a static tuple of
    (n_rows, K2) per sub-part; ``flat_words`` concatenates each
    sub-part's packed pairs row-major. Returns f32[sum(n_rows), Npad]
    — rows in sub-part order (exactly the layout `_seg_parts` appends).
    Every sub-part's n_rows must be a multiple of ELL_GROUP."""
    NB = n_block
    Npad = x.shape[1]
    nj = Npad // NB
    G = ELL_GROUP
    meta = []
    g_acc = 0
    w_acc = 0
    for n_rows, K2 in parts:
        assert n_rows % G == 0
        ng = n_rows // G
        meta.append((g_acc, g_acc + ng, K2, w_acc))
        g_acc += ng
        w_acc += n_rows * K2
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nj, g_acc),
        in_specs=[
            pl.BlockSpec(
                (x.shape[0], NB), lambda j, i, *_s: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, NB), lambda j, i, *_s: (i, j), memory_space=pltpu.VMEM
        ),
    )
    call = pl.pallas_call(
        functools.partial(_sweep_body, tuple(meta), G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((g_acc * G, Npad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=_interpret(),
    )
    with named("ell_gather_sweep"):
        return call(flat_words, x)


# Largest bucket row length the SMEM-blocked kernel accepts: the per-step
# block is (1, G·K) per index array, double-buffered by the pipeline —
# keep 2·arrays·G·K·4 B within ~half of the 1 MB SMEM so control scalars
# still fit. Beyond this, callers fall back to chunked scalar prefetch.
SMEM_BLOCK_K_UNIT = 8192
SMEM_BLOCK_K_VALUED = 4096


def _body_smem(K, KB, G, unit, *refs):
    """Gather body with cols (and vals) as *blocked SMEM operands* instead
    of whole-array scalar prefetch: each (i) strip group's (1, G, K) index
    block is DMA'd by the pipeline, so bucket size is unbounded — one
    pallas call per bucket regardless of nnz (the scalar-prefetch variant
    must chunk at the 1 MB SMEM budget; hypersparse matrices paid ~100
    launches per product). Same arithmetic as `_body`/`_body_unit`.

    Block shape is 3-D ``(1, G, K)``: Mosaic requires the last two block
    dims divisible by (8, 128) or equal to the array dims — ``(1, G·K)``
    single-row blocks are rejected, ``(1, G=8, K)`` passes (probed on
    real v5e, scripts/probe_smem_block_tpu.py).
    """
    if unit:
        cols_ref, x_ref, o_ref = refs
    else:
        cols_ref, vals_ref, x_ref, o_ref = refs
    t = pl.program_id(2)

    @pl.when(t == 0)
    def _():
        o_ref[:] = jnp.zeros_like(o_ref)

    for g in range(G):
        accs = [None] * _N_ACC
        for u in range(KB):
            k = t * KB + u
            c = cols_ref[0, g, k]
            xr = x_ref[pl.ds(c, 1), :]
            d = xr if unit else xr * vals_ref[0, g, k]
            a = u % _N_ACC
            accs[a] = d if accs[a] is None else accs[a] + d
        acc = accs[0]
        for a in accs[1:]:
            if a is not None:
                acc = acc + a
        o_ref[pl.ds(g, 1), :] += acc


@functools.partial(jax.jit, static_argnames=("n_block", "unit"))
def ell_bucket_spmm_smem(
    cols, vals, x, *, n_block: int, unit: bool = False
) -> jax.Array:
    """One ELL bucket's ``Y_b = A_b @ X`` with SMEM-blocked indices.

    Semantics identical to `ell_bucket_spmm`; use when the bucket's flat
    cols exceed the scalar-prefetch SMEM budget but ``K`` is within
    `SMEM_BLOCK_K_*` — the whole bucket then runs as one program.
    """
    nb, K = cols.shape
    NB = n_block
    Npad = x.shape[1]
    nj = Npad // NB
    G = ELL_GROUP
    assert nb % G == 0, f"bucket nb={nb} not a multiple of {G}"
    KB = _pick_kb(K)

    cols3 = cols.reshape(nb // G, G, K)
    x_spec = pl.BlockSpec(
        (x.shape[0], NB), lambda j, i, t: (0, j), memory_space=pltpu.VMEM
    )
    cols_spec = pl.BlockSpec(
        (1, G, K), lambda j, i, t: (i, 0, 0), memory_space=pltpu.SMEM
    )
    out_spec = pl.BlockSpec(
        (G, NB), lambda j, i, t: (i, j), memory_space=pltpu.VMEM
    )
    in_specs = [cols_spec, x_spec]
    args = [cols3, x]
    if not unit:
        in_specs.insert(1, cols_spec)  # vals: same blocking, f32
        args.insert(1, vals.reshape(nb // G, G, K))
    return pl.pallas_call(
        functools.partial(_body_smem, K, KB, G, unit),
        grid=(nj, nb // G, K // KB),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((nb, Npad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(*args)


@functools.partial(jax.jit, static_argnames=("n_block",))
def ell_bucket_spmm_dd_valued(cols, vh, vl, x2, *, n_block: int):
    """One valued bucket's double-word product.

    cols: int32[nb, K]; vh/vl: f32[nb, K] value planes (padding -> 0);
    x2: f32[2*K_rows, Npad] hi/lo planes of the f64 operand. Returns
    (Y_hi, Y_lo) f32[nb, Npad].
    """
    nb, K = cols.shape
    NB = n_block
    Npad = x2.shape[1]
    K_rows = x2.shape[0] // 2
    nj = Npad // NB
    G = ELL_GROUP
    assert nb % G == 0, f"bucket nb={nb} not a multiple of {G}"
    KB = _pick_kb(K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(nj, nb // G, K // KB),
        in_specs=[
            pl.BlockSpec(
                (x2.shape[0], NB),
                lambda j, i, t, *_s: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (G, NB), lambda j, i, t, *_s: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, NB), lambda j, i, t, *_s: (i, j), memory_space=pltpu.VMEM
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_body_dd_valued, K, KB, G, K_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, Npad), jnp.float32),
            jax.ShapeDtypeStruct((nb, Npad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(cols.reshape(-1), vh.reshape(-1), vl.reshape(-1), x2)


@functools.partial(jax.jit, static_argnames=("n_block",))
def ell_bucket_spmm_dd(cols, x2, *, n_block: int):
    """Unit-values bucket product with compensated accumulation.

    cols: int32[nb, K] (sentinel padding); x2: f32[2*K_rows, Npad] — the
    f64 operand split into hi/lo planes. Returns (Y_hi, Y_lo) f32.
    """
    nb, K = cols.shape
    NB = n_block
    Npad = x2.shape[1]
    K_rows = x2.shape[0] // 2
    nj = Npad // NB
    G = ELL_GROUP
    assert nb % G == 0, f"bucket nb={nb} not a multiple of {G}"
    KB = _pick_kb(K)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nj, nb // G, K // KB),
        in_specs=[
            pl.BlockSpec(
                (x2.shape[0], NB),
                lambda j, i, t, c: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (G, NB), lambda j, i, t, c: (i, j), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (G, NB), lambda j, i, t, c: (i, j), memory_space=pltpu.VMEM
            ),
        ),
    )
    return pl.pallas_call(
        functools.partial(_body_unit_dd, K, KB, G, K_rows),
        grid_spec=grid_spec,
        out_shape=(
            jax.ShapeDtypeStruct((nb, Npad), jnp.float32),
            jax.ShapeDtypeStruct((nb, Npad), jnp.float32),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )(cols.reshape(-1), x2)


@functools.partial(jax.jit, static_argnames=("n_block", "unit"))
def ell_bucket_spmm(
    cols, vals, x, *, n_block: int, unit: bool = False, packed=None
) -> jax.Array:
    """One ELL bucket's ``Y_b = A_b @ X``.

    cols: int32[nb, K]; vals: f32[nb, K] (ignored when ``unit``);
    x: f32[nx_rows, Npad] fully VMEM-resident. In unit mode padding
    columns MUST point at a zero row of x (the builder's sentinel).
    ``packed``: optional build-time packed pairs int32[nb, K/2]
    (`formats.ell.EllBucket.packed`) — without it the packed bodies
    re-pack cols per product (~0.4 ms/product on powerlaw 65k²).
    Returns f32[nb, Npad].
    """
    nb, K = cols.shape
    NB = n_block
    Npad = x.shape[1]
    nj = Npad // NB
    G = ELL_GROUP
    assert nb % G == 0, f"bucket nb={nb} not a multiple of {G}"
    KB = _pick_kb(K)

    n_scalar = 1 if unit else 2
    if K <= _FULL_K_MAX:
        # Whole-row unroll: 2-D grid, each (G, NB) output block written
        # exactly once. Unit buckets with even K additionally pack two
        # 16-bit columns per SMEM word — the fastest body at
        # 0.91 ns/slot (probe_gather6; unpacked full 1.10, chunked 1.25).
        use_packed = unit and packed_pair_ok(K, int(x.shape[0]))
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=n_scalar,
            grid=(nj, nb // G),
            in_specs=[
                pl.BlockSpec(
                    (x.shape[0], NB),
                    lambda j, i, *_s: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, NB), lambda j, i, *_s: (i, j), memory_space=pltpu.VMEM
            ),
        )
        body = (
            functools.partial(_body_full_packed, K // 2, G)
            if use_packed
            else functools.partial(_body_full, K, G, unit)
        )
        call = pl.pallas_call(
            body,
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, Npad), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel"),
            ),
            interpret=_interpret(),
        )
        with named("ell_gather_full"):
            if use_packed:
                flat = (
                    packed.reshape(-1)
                    if packed is not None
                    else _pack_pairs(cols)
                )
                return call(flat, x)
            if unit:
                return call(cols.reshape(-1), x)
            return call(cols.reshape(-1), vals.reshape(-1), x)
    if unit and packed_pair_ok(K, int(x.shape[0])):
        # Packed column pairs: half the SMEM loads AND half the prefetch
        # footprint (the ell_ops chunk budget doubles to match).
        K2 = K // 2
        KB2 = next(
            kb for kb in range(min(_PACKED_KB_MAX, K2), 0, -1)
            if K2 % kb == 0
        )
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nj, nb // G, K2 // KB2),
            in_specs=[
                pl.BlockSpec(
                    (x.shape[0], NB),
                    lambda j, i, t, *_s: (0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (G, NB), lambda j, i, t, *_s: (i, j),
                memory_space=pltpu.VMEM,
            ),
        )
        call = pl.pallas_call(
            functools.partial(_body_unit_packed, K2, KB2, G),
            grid_spec=grid_spec,
            out_shape=jax.ShapeDtypeStruct((nb, Npad), x.dtype),
            compiler_params=pltpu.CompilerParams(
                dimension_semantics=("parallel", "parallel", "arbitrary"),
            ),
            interpret=_interpret(),
        )
        with named("ell_gather_packed"):
            return call(_pack_pairs(cols), x)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=n_scalar,
        grid=(nj, nb // G, K // KB),
        in_specs=[
            pl.BlockSpec(
                (x.shape[0], NB),
                lambda j, i, t, *_s: (0, j),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (G, NB), lambda j, i, t, *_s: (i, j), memory_space=pltpu.VMEM
        ),
    )
    body = functools.partial(_body_unit if unit else _body, K, KB, G)
    call = pl.pallas_call(
        body,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, Npad), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
        ),
        interpret=_interpret(),
    )
    with named(f"ell_gather_{'unit' if unit else 'valued'}"):
        if unit:
            return call(cols.reshape(-1), x)
        return call(cols.reshape(-1), vals.reshape(-1), x)
