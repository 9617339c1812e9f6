"""Row partitioning of sparse matrices across a device mesh.

TPU-native equivalent of the reference's row-block ownership (``BlockedSBM``,
SURVEY.md §2 R6, §3.4): rows are split into ``P`` contiguous blocks, one per
device along the mesh's row axis; only the dense operand ever moves
(BASELINE.json:5, :11 — "matrices row/block-partitioned across hosts, halo
segments of x exchanged via all-gather/all-to-all collectives").

SPMD needs *uniform* local shapes, so every shard's local format is padded
to common capacities and stacked along a leading device axis; inside
`shard_map` the leading axis is sliced away and the local pytree is a plain
single-device format (see `parallel.ops`).

Two layouts are built:

* ``local``  — each shard's rows as one local matrix over the full column
  range (used by the all-gather schedule);
* ``blocks`` — each shard's rows further split into ``P`` column blocks, one
  per source shard (used by the ring schedule: at ring step ``s`` the shard
  holds the x-block of source ``(me + s) mod P`` and multiplies the matching
  column block — compute overlapped with the next `ppermute`).
"""
from __future__ import annotations

from typing import Any, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..formats.bsr import (
    BsrBucket,
    BsrMatrix,
    MonoPanelBucket,
    build_bsr,
    build_bsr_mono_uniform,
)
from ..formats.coo import COO, BinaryCOO
from ..formats.csr import CSR, BinaryCSR
from ..utils.pytree import pytree_dataclass, static_field

__all__ = ["RowPartitioned", "partition_rows"]


from ..utils.shapes import round_up as _round_up


@pytree_dataclass
class RowPartitioned:
    """A matrix row-partitioned into ``P`` shards (stacked leading axis).

    ``local``: COO pytree with arrays of shape ``(P, cap…)`` — shard p's
    rows (local row ids) over the full padded column range.
    ``blocks``: COO pytree with arrays of shape ``(P, P, capb…)`` — shard
    p's rows × source-shard q's columns (both ids local). May be None.
    Padding entries carry zero values, so no validity mask is needed.
    """

    local: COO
    blocks: Optional[COO]
    local_bsr: Optional[BsrMatrix]  # stacked tiled shards (Pallas path)
    local_bsr_t: Optional[BsrMatrix]  # stacked dual tilings of each shard's Aᵀ
    blocks_bsr: Optional[BsrMatrix]  # (P, P)-stacked column-block tilings
    shape: tuple = static_field()  # global (nrow, ncol)
    n_shards: int = static_field()
    row_block: int = static_field()  # rows per shard (padded)
    col_block: int = static_field()  # cols per source block (padded)
    # reorder permutations (None = identity): the partition holds the
    # permuted matrix; operands permute at the boundary (parallel.ops)
    row_perm: Optional[jax.Array] = None
    col_perm: Optional[jax.Array] = None
    row_inv: Optional[jax.Array] = None
    col_inv: Optional[jax.Array] = None
    # (P, P)-stacked TRANSPOSE tilings of each column block (A_{p,q}ᵀ,
    # shape (col_block, row_block)) — the reduce-scatter ring of
    # pnormal_mm(schedule='ring') / pspmm_t(schedule='ring') multiplies
    # these against local rows while partial outputs travel the ring.
    blocks_bsr_t: Optional[BsrMatrix] = None
    # stacked per-shard ELL slabs (gather-engine / XLA-ELL shard path):
    # one uniform (row_block, K) slab per shard, K = pow2 global max row
    # degree — plain padded ELL keeps SPMD shapes trivially identical
    local_ell: Optional[Any] = None


def _to_host_coo(mat, dtype):
    """Any supported input -> (rows, cols, vals) np arrays + shape."""
    if hasattr(mat, "tocoo") and not isinstance(
        mat, (COO, BinaryCOO, CSR, BinaryCSR)
    ):
        m = mat.tocoo()
        vals = m.data if dtype is None else m.data.astype(dtype)
        return (
            m.row.astype(np.int64),
            m.col.astype(np.int64),
            vals,
            tuple(m.shape),
        )
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    rows = np.asarray(mat.rows)[: mat.n_valid].astype(np.int64)
    cols = np.asarray(mat.cols)[: mat.n_valid].astype(np.int64)
    if isinstance(mat, BinaryCOO):
        vals = np.ones(rows.shape[0], dtype or np.float32)
    else:
        vals = np.asarray(mat.vals)[: mat.n_valid]
        if dtype is not None:
            vals = vals.astype(dtype)
    return rows, cols, vals, tuple(mat.shape)


def _stack_padded(groups, row_block, col_block, cap, dtype):
    """List of (rows, cols, vals) -> stacked int32/val arrays [G, cap]."""
    G = len(groups)
    R = np.zeros((G, cap), np.int32)
    Cc = np.zeros((G, cap), np.int32)
    V = np.zeros((G, cap), dtype)
    for g, (r, c, v) in enumerate(groups):
        n = r.shape[0]
        R[g, :n] = r
        Cc[g, :n] = c
        V[g, :n] = v
    return R, Cc, V


def _stack_bsr_shards(shard_mats, config: Config, stack_shape=None) -> BsrMatrix:
    """Stack per-shard BsrMatrix pytrees into one uniform-shape container.

    SPMD needs identical local shapes on every device: the bucket-width set
    is the union across shards and every bucket's ``ns`` is padded to the
    per-width max (padding rows carry the dump strip id and zero tiles).
    Static metadata (nnz, tiles) becomes the aggregate — consumers only use
    the uniform structural fields inside `shard_map`. ``stack_shape``
    reshapes the leading stack axis (e.g. (P, P) for column blocks).
    """
    P = len(shard_mats)
    widths = sorted({b.ntiles for A in shard_mats for b in A.buckets})
    nsp = shard_mats[0].n_strips
    TM, TK = shard_mats[0].tile_m, shard_mats[0].tile_k
    binary = shard_mats[0].binary
    tiles_last = TK // 32 if binary else TK
    # dtype from the first shard WITH buckets: an empty shard's .dtype
    # property falls back to f32 and would silently upcast every other
    # shard's bf16 tiles (doubling stacked tile bytes)
    tiles_dtype = jnp.uint32 if binary else next(
        (A.dtype for A in shard_mats if A.buckets), shard_mats[0].dtype
    )
    buckets = []
    for w in widths:
        per = [
            next((b for b in A.buckets if b.ntiles == w), None)
            for A in shard_mats
        ]
        ns_max = max((b.ns for b in per if b is not None), default=0)
        ns_max = _round_up(max(ns_max, 8), 8)
        S = np.full((P, ns_max), nsp, np.int32)
        L = np.zeros((P, ns_max, w), np.int32)
        Tt = [None] * P
        for p, b in enumerate(per):
            if b is not None:
                S[p, : b.ns] = np.asarray(b.strip_ids)
                L[p, : b.ns] = np.asarray(b.slab_ids)
            pad_tiles = jnp.zeros((ns_max, w, TM, tiles_last), tiles_dtype)
            if b is not None:
                pad_tiles = pad_tiles.at[: b.ns].set(b.tiles)
            Tt[p] = pad_tiles
        buckets.append(
            BsrBucket(
                strip_ids=jnp.asarray(S),
                slab_ids=jnp.asarray(L),
                tiles=jnp.stack(Tt),
                ntiles=w,
            )
        )
    if stack_shape is not None:
        buckets = [
            BsrBucket(
                strip_ids=b.strip_ids.reshape(stack_shape + b.strip_ids.shape[1:]),
                slab_ids=b.slab_ids.reshape(stack_shape + b.slab_ids.shape[1:]),
                tiles=b.tiles.reshape(stack_shape + b.tiles.shape[1:]),
                ntiles=b.ntiles,
            )
            for b in buckets
        ]
    return BsrMatrix(
        buckets=tuple(buckets),
        shape=shard_mats[0].shape,
        nnz=sum(A.nnz for A in shard_mats),
        n_tiles=sum(A.n_tiles for A in shard_mats),
        padded_tiles=max(A.padded_tiles for A in shard_mats),
        tile_m=TM,
        tile_k=TK,
        binary=binary,
    )


def _stack_mono_shards(
    shard_mats, stack_shape=None
) -> BsrMatrix:
    """Stack uniform-geometry mono shards (`build_bsr_mono_uniform`) into
    one container with a leading device axis — `parallel.ops` slices it
    away inside `shard_map` and each shard's product is ONE mono launch."""
    bs = [A.buckets[0] for A in shard_mats]
    b0 = bs[0]
    assert all(
        (b.width, b.win_slabs, b.n_windows, b.out_strips, b.panels.shape)
        == (
            b0.width, b0.win_slabs, b0.n_windows, b0.out_strips,
            b0.panels.shape,
        )
        for b in bs
    ), "mono shards must share one static geometry"

    def stk(xs):
        out = jnp.stack(xs)
        if stack_shape is not None:
            out = out.reshape(stack_shape + out.shape[1:])
        return out

    bucket = MonoPanelBucket(
        strip_ids=stk([b.strip_ids for b in bs]),
        window=stk([b.window for b in bs]),
        start_rel=stk([b.start_rel for b in bs]),
        first=stk([b.first for b in bs]),
        panels=stk([b.panels for b in bs]),
        width=b0.width,
        win_slabs=b0.win_slabs,
        n_windows=b0.n_windows,
        out_strips=b0.out_strips,
    )
    A0 = shard_mats[0]
    return BsrMatrix(
        buckets=(bucket,),
        shape=A0.shape,
        nnz=sum(A.nnz for A in shard_mats),
        n_tiles=sum(A.n_tiles for A in shard_mats),
        padded_tiles=max(A.padded_tiles for A in shard_mats),
        tile_m=A0.tile_m,
        tile_k=A0.tile_k,
        binary=A0.binary,
    )


def partition_rows(
    mat,
    n_shards: int,
    config: Config = DEFAULT,
    dtype=None,
    build_blocks: bool = True,
    build_bsr_shards: bool = False,
    build_ell_shards: bool = False,
    reorder: Optional[str] = None,
    shard_layout: str = "auto",
) -> RowPartitioned:
    """Partition ``mat`` (scipy / COO / CSR) into ``n_shards`` row blocks.

    Host-side compile step (it fixes static shard shapes), mirroring the
    reference's ``new_bsbm`` block construction (SURVEY.md §2 R6). Values
    are always materialized (binary inputs get unit values) so padding is
    zero-valued and mask-free. With ``build_bsr_shards=True`` each shard is
    additionally compiled to tiled BSR (forward + dual transpose tiling)
    so the distributed products run the Pallas MXU kernels.

    ``reorder`` ('degree' | 'minhash' | 'tilepack' | 'auto') permutes
    rows/columns before partitioning — better per-shard tile density for
    the BSR engine (note: degree order *concentrates* heavy rows into the
    first shards; prefer 'tilepack'/'minhash' when shard balance matters).
    Operands are permuted at the boundary by `parallel.ops.pad_operand` /
    `unpad_result`.
    """
    rows, cols, vals, shape = _to_host_coo(mat, dtype)
    nrow, ncol = shape
    P = int(n_shards)

    row_perm = col_perm = row_inv = col_inv = None
    if reorder not in (None, "none"):
        from ..reorder.cluster import (
            best_perms,
            degree_perms,
            hilbert_perms,
            invert_perm,
            minhash_perms,
            tilepack_perms,
        )

        gcoo = COO.from_arrays(rows, cols, vals, shape)
        fn = {
            "degree": degree_perms,
            "minhash": minhash_perms,
            "tilepack": tilepack_perms,
            "hilbert": hilbert_perms,
            "auto": best_perms,
        }.get(reorder)
        if fn is None:
            raise ValueError(f"unknown reorder {reorder!r}")
        row_perm, col_perm = fn(gcoo)
        if row_perm is not None:
            row_inv = invert_perm(row_perm)
            col_inv = invert_perm(col_perm)
            rinv = np.asarray(row_inv, np.int64)
            cinv = np.asarray(col_inv, np.int64)
            rows = rinv[rows]
            cols = cinv[cols]
        else:
            row_perm = col_perm = None
    vdtype = vals.dtype
    row_block = _round_up(max(-(-nrow // P), 1), 8)
    col_block = _round_up(max(-(-ncol // P), 1), 8)

    owner = np.clip(rows // row_block, 0, P - 1)
    local_groups = []
    for p in range(P):
        sel = owner == p
        local_groups.append((rows[sel] - p * row_block, cols[sel], vals[sel]))
    cap = max(max((g[0].shape[0] for g in local_groups), default=1), 1)
    R, C, V = _stack_padded(local_groups, row_block, col_block, cap, vdtype)
    local = COO(
        rows=jnp.asarray(R),
        cols=jnp.asarray(C),
        vals=jnp.asarray(V),
        shape=(row_block, P * col_block),
        n_valid=cap,
    )

    blocks = None
    if build_blocks:
        block_groups = []  # [P][P] of (r, c, v)
        capb = 1
        for p in range(P):
            r, c, v = local_groups[p]
            src = np.clip(c // col_block, 0, P - 1)
            row_blocks = []
            for q in range(P):
                sel = src == q
                row_blocks.append((r[sel], c[sel] - q * col_block, v[sel]))
                capb = max(capb, int(sel.sum()))
            block_groups.append(row_blocks)
        Rb = np.zeros((P, P, capb), np.int32)
        Cb = np.zeros((P, P, capb), np.int32)
        Vb = np.zeros((P, P, capb), vdtype)
        for p in range(P):
            for q in range(P):
                r, c, v = block_groups[p][q]
                n = r.shape[0]
                Rb[p, q, :n] = r
                Cb[p, q, :n] = c
                Vb[p, q, :n] = v
        blocks = COO(
            rows=jnp.asarray(Rb),
            cols=jnp.asarray(Cb),
            vals=jnp.asarray(Vb),
            shape=(row_block, col_block),
            n_valid=capb,
        )

    local_bsr = local_bsr_t = blocks_bsr = blocks_bsr_t = None
    if build_bsr_shards:
        # binary inputs (all-unit values): store shard tiles as bf16 —
        # exact for 0/1 and ~2x faster than f32 tiles on the MXU path
        # (Config.binary_tiles; same win as the single-chip default)
        all_unit = bool(vals.size) and bool((vals == 1).all())
        tile_dtype = (
            jnp.bfloat16
            if dtype is None
            and config.binary_tiles in ("bf16", "int8")
            and all_unit
            else None
        )
        # mono shards carry the single-chip int8 default (1 B/slot panels,
        # exact through the in-kernel bf16 cast)
        mono_dtype = (
            jnp.int8
            if tile_dtype == jnp.bfloat16 and config.binary_tiles == "int8"
            else tile_dtype
        )
        # auto tile height from the GLOBAL structure so every shard (and
        # the dual tilings) agrees — same rule as operator()'s BSR path
        bsr_config = config.resolve()
        if config.tile_m is None and rows.size:
            import dataclasses

            from ..bench.model import best_tile_m

            bsr_config = dataclasses.replace(
                config,
                tile_m=best_tile_m(rows, cols, shape, config.tile_k),
            )

        def _mono_or_tiles(coo_list, stack_shape=None):
            """Uniform mono shards when the footprint gate accepts
            (VERDICT r3 #3: the flagship single-launch engine must be the
            one that runs distributed); stacked tile buckets otherwise."""
            mats = None
            if shard_layout in ("auto", "mono"):
                mats = build_bsr_mono_uniform(
                    coo_list, config=bsr_config, dtype=mono_dtype
                )
            if mats is not None:
                return _stack_mono_shards(mats, stack_shape=stack_shape)
            if shard_layout == "mono":
                raise ValueError(
                    "shard_layout='mono' but the mono footprint gate "
                    "rejected this structure"
                )
            built = [
                build_bsr(c, config=bsr_config, dtype=tile_dtype, panels=False)
                for c in coo_list
            ]
            return _stack_bsr_shards(
                built, bsr_config, stack_shape=stack_shape
            )

        fwd_coos, bwd_coos = [], []
        for p in range(P):
            r, c, v = local_groups[p]
            fwd_coos.append(
                COO.from_arrays(r, c, v, (row_block, P * col_block))
            )
            bwd_coos.append(
                COO.from_arrays(c, r, v, (P * col_block, row_block))
            )
        local_bsr = _mono_or_tiles(fwd_coos)
        local_bsr_t = _mono_or_tiles(bwd_coos)
        if build_blocks:
            blk_coos, blk_coos_t = [], []
            for p in range(P):
                r, c, v = local_groups[p]
                src = np.clip(c // col_block, 0, P - 1)
                for q in range(P):
                    sel = src == q
                    cq = c[sel] - q * col_block
                    blk_coos.append(
                        COO.from_arrays(
                            r[sel], cq, v[sel], (row_block, col_block)
                        )
                    )
                    blk_coos_t.append(
                        COO.from_arrays(
                            cq, r[sel], v[sel], (col_block, row_block)
                        )
                    )
            blocks_bsr = _mono_or_tiles(blk_coos, stack_shape=(P, P))
            blocks_bsr_t = _mono_or_tiles(
                blk_coos_t, stack_shape=(P, P)
            )

    local_ell = None
    if build_ell_shards:
        # One uniform (row_block, K) ELL slab per shard, K = pow2 global
        # max row degree: plain padded ELL (no per-shard bucket ladders)
        # keeps SPMD local shapes identical with zero stacking logic. The
        # hypersparse gather engine consumes it on TPU; the XLA ELL
        # fallback everywhere else (padding carries zero values).
        from ..formats.ell import EllBucket, EllMatrix

        deg = np.zeros(row_block, np.int64)
        Ke = 1
        for r, c, v in local_groups:
            deg[:] = 0
            np.add.at(deg, r, 1)
            Ke = max(Ke, int(deg.max()) if r.size else 1)
        Ke = 1 << (Ke - 1).bit_length()
        Ce = np.zeros((P, row_block, Ke), np.int32)
        Ve = np.zeros((P, row_block, Ke), vdtype)
        for p, (r, c, v) in enumerate(local_groups):
            order = np.argsort(r, kind="stable")
            r, c, v = r[order], c[order], v[order]
            k = np.arange(r.size) - np.searchsorted(r, r)
            Ce[p, r, k] = c
            Ve[p, r, k] = v
        rid = np.broadcast_to(
            np.arange(row_block, dtype=np.int32), (P, row_block)
        ).copy()
        local_ell = EllMatrix(
            buckets=(
                EllBucket(
                    row_ids=jnp.asarray(rid),
                    cols=jnp.asarray(Ce),
                    vals=jnp.asarray(Ve),
                    width=Ke,
                    n_real=row_block,
                ),
            ),
            shape=(row_block, P * col_block),
            nnz=int(rows.shape[0]),
            padded_nnz=P * row_block * Ke,
        )

    return RowPartitioned(
        local=local,
        blocks=blocks,
        local_bsr=local_bsr,
        local_bsr_t=local_bsr_t,
        blocks_bsr=blocks_bsr,
        blocks_bsr_t=blocks_bsr_t,
        local_ell=local_ell,
        shape=shape,
        n_shards=P,
        row_block=row_block,
        col_block=col_block,
        row_perm=row_perm,
        col_perm=col_perm,
        row_inv=row_inv,
        col_inv=col_inv,
    )
