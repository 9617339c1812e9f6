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

from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..utils.pytree import pytree_dataclass, static_field
from .coo import COO, BinaryCOO
from .csr import CSR, BinaryCSR

__all__ = ["BsrBucket", "BsrMatrix", "build_bsr", "expand_bits_reference"]


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
        return self.buckets[0].tiles.dtype if self.buckets else jnp.float32

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


def build_bsr(mat, config: Config = DEFAULT, dtype=None, binary=None) -> BsrMatrix:
    """Compile a COO/CSR matrix into bucketed (TM × TK) tiles.

    Bucket membership (which strips, how many tiles) fixes static shapes and
    is decided host-side — it is a compile step, exactly like the reference
    deciding block boundaries in ``new_bsbm`` (SURVEY.md §2 R6). The bulk
    value/bit fill runs as one jitted device scatter.

    ``binary=None`` auto-detects: BinaryCOO/BinaryCSR inputs produce bitmask
    tiles unless ``binary=False`` forces valued tiles.
    """
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
    if binary is None:
        # bf16-valued tiles (0/1 exact in bf16) beat bitmask+expansion
        # 2.1x on v5e (the per-use VPU mask expansion dominates bitmask
        # tiles — scripts/probe_tilecost_tpu.py); bitmask remains the
        # capacity-optimal storage via Config(binary_tiles="bitmask") or
        # binary=True.
        if is_bin_in and dtype is None and config.binary_tiles == "bf16":
            binary = False
            dtype = jnp.bfloat16
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
