"""SpGEMM ``C = A @ B`` with fused output-structure estimation.

Reference capability R8 (SURVEY.md §2; BASELINE.json:10 — "SpGEMM … with
fused output-nnz estimation"). TPU-native design (SURVEY.md §7.2 M5):

* **Symbolic phase (host, compile step)** — tile the operands:
  A into (TM × TK) tiles keyed by (row-strip i, k-slab), B into (TK × TJ)
  tiles keyed by (k-strip, col-slab j). Join on k: every A-tile (i,k) ×
  B-tile (k,j) pair contributes to output tile (i,j). The join *is* the
  output-nnz estimation — ``len(unique (i,j))·TM·TJ`` upper-bounds nnz(C)
  (returned as ``est_nnz`` before any numerics run), and it fixes the
  static shapes XLA needs.
* **Numeric phase (device)** — one batched MXU contraction per pair chunk:
  ``C_tiles[out] += A_tiles[p] @ B_tiles[p]`` via `dot_general` + segment
  scatter-add over output-tile ids; then exact-nnz compaction of the dense
  output tiles back to COO.

Dynamic output size vs XLA static shapes (SURVEY.md §7.3 item 2) is handled
by the symbolic upper bound: the dense output-tile buffer is allocated from
the estimate, and the final COO carries ``n_valid = exact nnz`` with
padding entries beyond it.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..config import DEFAULT, Config
from ..formats.coo import COO, BinaryCOO
from ..formats.csr import CSR, BinaryCSR

__all__ = [
    "spgemm", "spgemm_info", "spgemm_device", "symbolic_device", "spgemm_esc",
]

_PAIR_CHUNK = 4096  # tile pairs per batched matmul step

# Measured v5e `lax.sort` rate for the ESC key-sort (3 operands,
# num_keys=2): 24 ms per 2^23 elements (CLAUDE.md session 5). Each ESC
# block pays one p_cap-sized sort — the dominant device cost, reported
# per product as ``info["floor_sort_s"]``.
ESC_SORT_S_PER_ELEM = 24e-3 / (1 << 23)


def _host_coo(mat):
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    if isinstance(mat, BinaryCOO):
        rows = np.asarray(mat.rows)[: mat.n_valid]
        cols = np.asarray(mat.cols)[: mat.n_valid]
        vals = np.ones(rows.shape[0], np.float32)
        return rows, cols, vals, mat.shape
    if isinstance(mat, COO):
        rows = np.asarray(mat.rows)[: mat.n_valid]
        cols = np.asarray(mat.cols)[: mat.n_valid]
        vals = np.asarray(mat.vals)[: mat.n_valid]
        return rows, cols, vals, mat.shape
    m = mat.tocoo()  # scipy
    return m.row, m.col, m.data, m.shape


def _device_coo(mat):
    """(rows, cols, vals, valid, shape) as device arrays — zero transfer
    for fastsparse containers (the round-2 ESC path round-tripped through
    host numpy: ~0.5 s of upload per product); scipy input uploads once."""
    if isinstance(mat, (CSR, BinaryCSR)):
        mat = mat.to_coo()
    if isinstance(mat, BinaryCOO):
        ok = mat.valid_mask()
        return mat.rows, mat.cols, ok.astype(jnp.float32), ok, mat.shape
    if isinstance(mat, COO):
        return (
            mat.rows,
            mat.cols,
            mat.vals.astype(jnp.float32),
            mat.valid_mask(),
            mat.shape,
        )
    m = mat.tocoo()  # scipy
    r = jnp.asarray(m.row, jnp.int32)
    return (
        r,
        jnp.asarray(m.col, jnp.int32),
        jnp.asarray(m.data, jnp.float32),
        jnp.ones(r.shape, bool),
        m.shape,
    )


def _tile_up(rows, cols, vals, shape, tm, tk):
    """Dense tiles: returns (tile_vals f32[nt, tm, tk], strip[nt], slab[nt])."""
    strip = rows // tm
    slab = cols // tk
    n_slabs = -(-shape[1] // tk)
    pair = strip * n_slabs + slab
    upair, inv = np.unique(pair, return_inverse=True)
    nt = upair.size
    slot = inv * (tm * tk) + (rows % tm) * tk + (cols % tk)
    flat = jnp.zeros((max(nt, 1) * tm * tk,), jnp.float32)
    flat = flat.at[jnp.asarray(slot)].add(jnp.asarray(vals, jnp.float32))
    tiles = flat.reshape(max(nt, 1), tm, tk)
    return tiles, (upair // n_slabs).astype(np.int64), (upair % n_slabs).astype(np.int64)


def spgemm_info(A, B, config: Config = DEFAULT) -> dict:
    """Symbolic phase only: output tile structure + nnz upper bound."""
    return _symbolic(A, B, config)[0]


def _symbolic(A, B, config: Config):
    config = config.resolve()
    TM, TK = config.tile_m, config.tile_k
    ra, ca, va, (ma, ka) = _host_coo(A)
    rb, cb, vb, (kb, nb) = _host_coo(B)
    if ka != kb:
        raise ValueError(f"inner dims mismatch: {ka} vs {kb}")

    a_tiles, a_strip, a_kslab = _tile_up(ra, ca, va, (ma, ka), TM, TK)
    # B tiled with row-strip = TK so A-tile @ B-tile chains on the MXU
    b_tiles, b_kstrip, b_jslab = _tile_up(rb, cb, vb, (kb, nb), TK, TK)

    # join on k: sort B tiles by kstrip, then for each A tile emit its pairs
    order = np.argsort(b_kstrip, kind="stable")
    b_kstrip_s = b_kstrip[order]
    starts = np.searchsorted(b_kstrip_s, a_kslab, side="left")
    ends = np.searchsorted(b_kstrip_s, a_kslab, side="right")
    counts = ends - starts
    n_pairs = int(counts.sum())
    ai = np.repeat(np.arange(a_strip.size), counts)
    offs = np.concatenate([[0], np.cumsum(counts)])[:-1]
    pos = np.arange(n_pairs) - np.repeat(offs, counts) + np.repeat(starts, counts)
    bi = order[pos] if n_pairs else np.zeros(0, np.int64)

    n_jslabs = -(-nb // TK)
    out_pair = a_strip[ai] * n_jslabs + b_jslab[bi]
    uout, out_idx = np.unique(out_pair, return_inverse=True)
    info = {
        "n_pairs": n_pairs,
        "n_out_tiles": int(uout.size),
        "est_nnz": int(uout.size) * TM * TK,
        "flops": 2 * n_pairs * TM * TK * TK,
    }
    sym = (a_tiles, b_tiles, ai, bi, uout, out_idx, (ma, ka, nb), n_jslabs)
    return info, sym


@jax.jit
def _numeric_scan(C_tiles, a_tiles, b_tiles, ai, bi, oi):
    """All pair-chunk contractions in one jitted scan (one dispatch).

    ai/bi/oi: int32[n_chunks, chunk]; padding pairs point oi at the dump
    tile (last row of C_tiles, sliced off by the caller).
    """

    def step(C, idx):
        a_idx, b_idx, o_idx = idx
        prod = jax.lax.dot_general(
            a_tiles[a_idx],
            b_tiles[b_idx],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            # fp32 parity: TPU default dot precision is one-pass bf16
            precision=jax.lax.Precision.HIGHEST,
        )
        return C.at[o_idx].add(prod), None

    C_tiles, _ = jax.lax.scan(step, C_tiles, (ai, bi, oi))
    return C_tiles


def spgemm(A, B, config: Config = DEFAULT, out_format: str = "coo",
           method: str = "auto"):
    """``C = A @ B``. Returns (C, info).

    ``method='esc'`` (the default for COO output) runs the expand–sort–
    compress path (`spgemm_esc`) — work ∝ true scalar products, exact
    fused nnz estimation. ``method='tiles'`` runs the tile-pair MXU
    contraction; it is the required path for ``out_format='bsr'`` (the
    product stays tiled and chains into further products/SpMM) and wins
    when operand tiles are dense. ``info`` carries the fused estimation:
    ``est_nnz`` (exact for esc; symbolic upper bound for tiles, available
    before numerics), ``nnz``, and the numeric work done
    (``n_products``/``flops`` for esc, ``n_pairs``/``flops`` for tiles).
    """
    if method == "auto":
        method = "tiles" if out_format == "bsr" else "esc"
    if method == "esc":
        if out_format != "coo":
            raise ValueError("method='esc' only produces COO output")
        return spgemm_esc(A, B, config)
    config = config.resolve()
    TM, TK = config.tile_m, config.tile_k
    info, sym = _symbolic(A, B, config)
    a_tiles, b_tiles, ai, bi, uout, out_idx, (ma, ka, nb), n_jslabs = sym

    nt_out = max(int(uout.size), 1)
    # +1 dump tile catches padding pairs
    C_tiles = jnp.zeros((nt_out + 1, TM, TK), jnp.float32)
    n_pairs = info["n_pairs"]
    if n_pairs:
        chunk = min(_PAIR_CHUNK, max(n_pairs, 1))
        n_chunks = -(-n_pairs // chunk)
        pad = n_chunks * chunk - n_pairs
        ai_j = np.concatenate([ai, np.zeros(pad, ai.dtype)])
        bi_j = np.concatenate([bi, np.zeros(pad, bi.dtype)])
        oi_j = np.concatenate(
            [out_idx, np.full(pad, nt_out, out_idx.dtype)]
        )
        C_tiles = _numeric_scan(
            C_tiles,
            a_tiles,
            b_tiles,
            jnp.asarray(ai_j.reshape(n_chunks, chunk), jnp.int32),
            jnp.asarray(bi_j.reshape(n_chunks, chunk), jnp.int32),
            jnp.asarray(oi_j.reshape(n_chunks, chunk), jnp.int32),
        )

    if out_format == "bsr":
        C = _tiles_to_bsr(
            C_tiles[:nt_out], uout, (ma, nb), n_jslabs, TM, TK, config
        )
        info["nnz"] = info["est_nnz"]
        return C, info

    # exact-nnz compaction ON DEVICE (`_compact_device`): live entries
    # sort to a contiguous prefix, so the host fetches ~nnz_out entries
    # instead of the dense est_nnz tile block (the old np.nonzero round
    # trip fetched ~250 MB on rmat13 x rmat13 — most of the product's
    # wall time through the remote tunnel).
    if uout.size == 0:
        info["nnz"] = 0
        C = COO.from_arrays(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.float32), (ma, nb),
        )
        return C, info
    if int(uout[-1]) >= np.iinfo(np.int32).max:
        # tile keys overflow the device's int32 (x64 is off): fall back
        # to host compaction rather than silently wrapping indices
        C_host = np.asarray(C_tiles)[:nt_out]
        t, r, c = np.nonzero(C_host)
        rows = (uout[t] // n_jslabs) * TM + r
        cols = (uout[t] % n_jslabs) * TK + c
        keep = (rows < ma) & (cols < nb)
        rows, cols = rows[keep], cols[keep]
        vals = C_host[t[keep], r[keep], c[keep]]
        info["nnz"] = int(rows.size)
        C = COO.from_arrays(rows, cols, vals.astype(np.float32), (ma, nb))
        return C, info
    rows_d, cols_d, vals_d, n_live = _compact_device(
        C_tiles[:nt_out],
        jnp.asarray(uout, jnp.int32),
        tm=TM,
        tk=TK,
        n_jslabs=n_jslabs,
    )
    n = int(n_live)
    rows = np.asarray(rows_d[:n]).astype(np.int64)
    cols = np.asarray(cols_d[:n]).astype(np.int64)
    vals = np.asarray(vals_d[:n])
    # edge-tile padding beyond the matrix bounds carries zero values and
    # is already dropped by the liveness filter; guard anyway
    keep = (rows < ma) & (cols < nb)
    if not keep.all():
        rows, cols, vals = rows[keep], cols[keep], vals[keep]
    info["nnz"] = int(rows.size)
    C = COO.from_arrays(rows, cols, vals.astype(np.float32), (ma, nb))
    return C, info


# --------------------------------------------------------------------------
# Device-side symbolic + numeric phases (docs/ROADMAP.md item 9).
#
# The host symbolic phase above decides static shapes with np.unique; the
# device path below runs the whole product — tile discovery, the k-join
# with fused output-nnz estimation, tile fill, and the contraction — as ONE
# jitted program. XLA needs static bounds, so the caller supplies caps
# (power-of-two-rounded so compiled programs are reused across runs); the
# returned scalars report the dynamic truth and overflow is detectable as
# ``n_pairs > pair_cap``.
# --------------------------------------------------------------------------

_SENTINEL = jnp.iinfo(jnp.int32).max


def _unique_ranks(keys, valid, cap):
    """Sorted-unique machinery: returns (ukeys[cap], rank_of_entry[n],
    n_unique) where rank_of_entry maps each *original* entry to its unique
    key's index (sorted order). Invalid entries get rank cap (dump slot)."""
    n = keys.shape[0]
    skeys, pos = jax.lax.sort(
        [jnp.where(valid, keys, _SENTINEL), jnp.arange(n, dtype=jnp.int32)],
        num_keys=1,
        is_stable=True,
    )
    svalid = skeys != _SENTINEL
    flag = svalid & jnp.concatenate(
        [jnp.ones((1,), bool), skeys[1:] != skeys[:-1]]
    )
    rank_sorted = jnp.cumsum(flag.astype(jnp.int32)) - 1
    rank_sorted = jnp.where(svalid, rank_sorted, cap)
    n_unique = flag.sum()
    ukeys = jnp.full((cap + 1,), _SENTINEL, jnp.int32)
    ukeys = ukeys.at[jnp.where(flag, rank_sorted, cap)].set(skeys)[:cap]
    rank = jnp.zeros((n,), jnp.int32).at[pos].set(rank_sorted)
    return ukeys, rank, n_unique


@partial(
    jax.jit,
    static_argnames=(
        "tm", "tk", "n_kslabs", "n_jslabs",
        "tile_cap_a", "tile_cap_b", "pair_cap", "out_tile_cap",
    ),
)
def symbolic_device(
    a_rows, a_cols, a_valid,
    b_rows, b_cols, b_valid,
    *, tm, tk, n_kslabs, n_jslabs,
    tile_cap_a, tile_cap_b, pair_cap, out_tile_cap,
):
    """Jittable symbolic phase: tile discovery + k-join + output structure.

    Returns ``(ai, bi, oi, pair_valid, ua_key, ub_key, uo_key, a_rank,
    b_rank, n_pairs, n_out_tiles)``; ``est_nnz = n_out_tiles·tm·tk`` is the
    fused output-nnz estimation, available after one device program.
    """
    keyA = (a_rows // tm) * n_kslabs + a_cols // tk
    ua_key, a_rank, n_ta = _unique_ranks(keyA.astype(jnp.int32), a_valid, tile_cap_a)
    keyB = (b_rows // tk) * n_jslabs + b_cols // tk
    ub_key, b_rank, n_tb = _unique_ranks(keyB.astype(jnp.int32), b_valid, tile_cap_b)

    ua_valid = ua_key != _SENTINEL
    ua_strip = jnp.where(ua_valid, ua_key // n_kslabs, 0)
    ua_k = jnp.where(ua_valid, ua_key % n_kslabs, 0)
    ub_valid = ub_key != _SENTINEL
    ub_k = jnp.where(ub_valid, ub_key // n_jslabs, 0)
    ub_j = jnp.where(ub_valid, ub_key % n_jslabs, 0)

    # B tiles are key-sorted => kstrip-major: per-k runs are contiguous.
    counts_b = jnp.zeros((n_kslabs,), jnp.int32).at[ub_k].add(
        ub_valid.astype(jnp.int32)
    )
    b_start = jnp.cumsum(counts_b) - counts_b

    # pairs per A tile, enumerated by global pair index p. Tile lookup is
    # scatter-mark + cummax (jnp.searchsorted's binary-search scan measured
    # 1.02 s at 8M on v5e; this is ~2 bandwidth passes).
    c = jnp.where(ua_valid, counts_b[ua_k], 0)
    offs_incl = jnp.cumsum(c)
    n_pairs = offs_incl[-1] if tile_cap_a else jnp.int32(0)
    starts = offs_incl - c
    iota_t = jnp.arange(c.shape[0], dtype=jnp.int32)
    mark = jnp.full((pair_cap,), -1, jnp.int32)
    mark = mark.at[jnp.where(c > 0, starts, pair_cap)].max(
        iota_t, mode="drop")
    ai = jnp.maximum(jax.lax.cummax(mark), 0)
    p = jnp.arange(pair_cap, dtype=jnp.int32)
    pair_valid = (p < n_pairs) & (ai < tile_cap_a)
    ai_c = jnp.where(pair_valid, ai, 0)
    r = p - (offs_incl[ai_c] - c[ai_c])
    bi = jnp.where(pair_valid, b_start[ua_k[ai_c]] + r, 0)

    out_key = ua_strip[ai_c] * n_jslabs + ub_j[bi]
    uo_key, o_rank, n_out = _unique_ranks(
        out_key.astype(jnp.int32), pair_valid, out_tile_cap
    )
    return (
        ai_c, bi, o_rank, pair_valid,
        ua_key, ub_key, uo_key, a_rank, b_rank,
        n_pairs, n_out, n_ta, n_tb,
    )


@partial(
    jax.jit,
    static_argnames=(
        "tm", "tk", "n_kslabs", "n_jslabs",
        "tile_cap_a", "tile_cap_b", "pair_cap", "out_tile_cap", "chunk",
    ),
)
def _spgemm_device_jit(
    a_rows, a_cols, a_vals, a_valid,
    b_rows, b_cols, b_vals, b_valid,
    *, tm, tk, n_kslabs, n_jslabs,
    tile_cap_a, tile_cap_b, pair_cap, out_tile_cap, chunk,
):
    (ai, bi, oi, pair_valid, ua_key, ub_key, uo_key, a_rank, b_rank,
     n_pairs, n_out, n_ta, n_tb) = symbolic_device(
        a_rows, a_cols, a_valid, b_rows, b_cols, b_valid,
        tm=tm, tk=tk, n_kslabs=n_kslabs, n_jslabs=n_jslabs,
        tile_cap_a=tile_cap_a, tile_cap_b=tile_cap_b,
        pair_cap=pair_cap, out_tile_cap=out_tile_cap,
    )

    # device tile fill: scatter each entry into its tile's dense slot
    def fill(rank, rows, cols, vals, valid, cap, t_m, t_k):
        flat = jnp.zeros((cap + 1) * t_m * t_k, jnp.float32)
        slot = rank * (t_m * t_k) + (rows % t_m) * t_k + (cols % t_k)
        slot = jnp.where(valid, slot, cap * t_m * t_k)
        return flat.at[slot].add(jnp.where(valid, vals, 0.0)).reshape(
            cap + 1, t_m, t_k
        )

    a_tiles = fill(a_rank, a_rows, a_cols, a_vals, a_valid, tile_cap_a, tm, tk)
    b_tiles = fill(b_rank, b_rows, b_cols, b_vals, b_valid, tile_cap_b, tk, tk)

    # contraction: pair chunks through the MXU, scatter-add into C tiles
    n_chunks = pair_cap // chunk
    ai_j = ai.reshape(n_chunks, chunk)
    bi_j = bi.reshape(n_chunks, chunk)
    oi_j = jnp.where(pair_valid, oi, out_tile_cap).reshape(n_chunks, chunk)
    C_tiles = jnp.zeros((out_tile_cap + 1, tm, tk), jnp.float32)

    def step(C, idx):
        a_idx, b_idx, o_idx = idx
        prod = jax.lax.dot_general(
            a_tiles[a_idx], b_tiles[b_idx],
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        return C.at[o_idx].add(prod), None

    C_tiles, _ = jax.lax.scan(step, C_tiles, (ai_j, bi_j, oi_j))
    return C_tiles[:out_tile_cap], uo_key, n_pairs, n_out, n_ta, n_tb


def _pow2(x):
    return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()


@partial(jax.jit, static_argnames=("tm", "tk", "n_jslabs"))
def _compact_device(C_tiles, uo_key, *, tm, tk, n_jslabs):
    """Dense product tiles -> entry-compacted COO arrays, on device.

    Live entries sort to a contiguous prefix (padding rows/cols point at
    0 with zero values — harmless by convention). Returns
    ``(rows, cols, vals, n_live)`` with capacity ``n_tiles·tm·tk``.
    """
    nt = C_tiles.shape[0]
    valid_tile = uo_key != _SENTINEL
    strip = jnp.where(valid_tile, uo_key // n_jslabs, 0)
    jslab = jnp.where(valid_tile, uo_key % n_jslabs, 0)
    r_in = jax.lax.broadcasted_iota(jnp.int32, (nt, tm, tk), 1)
    c_in = jax.lax.broadcasted_iota(jnp.int32, (nt, tm, tk), 2)
    rows = (strip[:, None, None] * tm + r_in).reshape(-1)
    cols = (jslab[:, None, None] * tk + c_in).reshape(-1)
    vals = C_tiles.reshape(-1)
    live = (vals != 0) & jnp.repeat(valid_tile, tm * tk)
    # stream-compact via prefix-sum positions + one scatter per array:
    # O(n) bandwidth vs the previous 4-array stable sort (~27 passes on
    # a 62M-entry rmat13 product). Dead entries all land on the dump
    # slot n, which the [:n] slice drops; live positions are unique so
    # the scatters are exact.
    n = vals.shape[0]
    pos = jnp.cumsum(live.astype(jnp.int32)) - 1
    # dead entries point out of bounds and are DROPPED (no dump-slot
    # duplicate writes); live positions are unique
    idx = jnp.where(live, pos, n)
    rows_c = jnp.zeros(n, rows.dtype).at[idx].set(rows, mode="drop")
    cols_c = jnp.zeros(n, cols.dtype).at[idx].set(cols, mode="drop")
    vals_c = jnp.zeros(n, vals.dtype).at[idx].set(vals, mode="drop")
    return rows_c, cols_c, vals_c, live.sum()


def spgemm_device(
    A, B, config: Config = DEFAULT, caps: dict | None = None,
    out_format: str = "tiles",
):
    """``C = A @ B`` entirely on device — one compiled program.

    Symbolic (tile discovery, k-join, fused output-nnz estimation), tile
    fill, and the MXU contraction all run inside a single jit; the host
    only chooses capacity bounds (power-of-two so programs are reused).
    ``caps`` may pin ``{"tiles_a", "tiles_b", "pairs", "out_tiles"}``; by
    default they come from one dry host pass (`spgemm_info`) — pass caps
    from a structurally similar product to skip that.

    Returns ``(C_tiles f32[out_cap,TM,TK], uo_key i32[out_cap], info)``
    where ``uo_key = strip·n_jslabs + jslab`` per output tile (sentinel =
    padding) and ``info`` carries est_nnz/n_pairs. Raises if a cap
    overflows (re-run with larger caps).

    ``out_format='coo'`` additionally runs the on-device entry compaction
    (`_compact_device`): returns ``(C_coo, info)`` with live entries a
    contiguous prefix, ``info['nnz']`` exact — no host round-trip over
    the dense tiles (docs/ROADMAP.md item 9, second half).
    """
    config = config.resolve()
    TM, TK = config.tile_m, config.tile_k
    ra, ca, va, (ma, ka) = _host_coo(A)
    rb, cb, vb, (kb, nb) = _host_coo(B)
    if ka != kb:
        raise ValueError(f"inner dims mismatch: {ka} vs {kb}")
    n_kslabs = max(-(-ka // TK), 1)
    n_jslabs = max(-(-nb // TK), 1)

    if caps is None:
        info, _ = _symbolic(A, B, config)
        caps = {
            "tiles_a": _pow2(int(np.unique((ra // TM) * n_kslabs + ca // TK).size)),
            "tiles_b": _pow2(int(np.unique((rb // TK) * n_jslabs + cb // TK).size)),
            "pairs": _pow2(max(info["n_pairs"], 1)),
            "out_tiles": _pow2(max(info["n_out_tiles"], 1)),
        }
    chunk = min(_PAIR_CHUNK, caps["pairs"])

    C_tiles, uo_key, n_pairs, n_out, n_ta, n_tb = _spgemm_device_jit(
        jnp.asarray(ra, jnp.int32), jnp.asarray(ca, jnp.int32),
        jnp.asarray(va, jnp.float32), jnp.ones(ra.shape, bool),
        jnp.asarray(rb, jnp.int32), jnp.asarray(cb, jnp.int32),
        jnp.asarray(vb, jnp.float32), jnp.ones(rb.shape, bool),
        tm=TM, tk=TK, n_kslabs=n_kslabs, n_jslabs=n_jslabs,
        tile_cap_a=caps["tiles_a"], tile_cap_b=caps["tiles_b"],
        pair_cap=caps["pairs"], out_tile_cap=caps["out_tiles"], chunk=chunk,
    )
    n_pairs = int(n_pairs)
    n_out = int(n_out)
    if (
        n_pairs > caps["pairs"]
        or n_out > caps["out_tiles"]
        or int(n_ta) > caps["tiles_a"]
        or int(n_tb) > caps["tiles_b"]
    ):
        raise ValueError(
            f"caps overflow: n_pairs={n_pairs} (cap {caps['pairs']}), "
            f"n_out_tiles={n_out} (cap {caps['out_tiles']}), "
            f"tiles_a={int(n_ta)} (cap {caps['tiles_a']}), "
            f"tiles_b={int(n_tb)} (cap {caps['tiles_b']})"
        )
    info = {
        "n_pairs": n_pairs,
        "n_out_tiles": n_out,
        "est_nnz": n_out * TM * TK,
        "flops": 2 * n_pairs * TM * TK * TK,
        "caps": caps,
        "shape": (ma, nb),
        "n_jslabs": n_jslabs,
    }
    if out_format == "coo":
        rows, cols, vals, n_live = _compact_device(
            C_tiles, uo_key, tm=TM, tk=TK, n_jslabs=n_jslabs
        )
        info["nnz"] = int(n_live)
        # live entries are a contiguous prefix after the compaction sort
        C = COO(
            rows=rows, cols=cols, vals=vals,
            shape=(ma, nb), n_valid=int(n_live),
        )
        return C, info
    return C_tiles, uo_key, info


# --------------------------------------------------------------------------
# ESC (expand–sort–compress) SpGEMM — the hypersparse-native path.
#
# The tile-pair MXU contraction above is the right shape when operand tiles
# are dense-ish; on hypersparse inputs (rmat/power-law — BASELINE config 4's
# character) it burns TFLOPs of padding: rmat13² is 3.4 TFLOP of 128³ tile
# dots for only 6.2M true scalar products. The classic Gustavson algorithm
# maps to TPU as expand/sort/compress instead (SURVEY.md §7.2 M5, §7.3
# item 2): enumerate every scalar product a_ik·b_kj, sort by the 64-bit
# output key (i,j) with `lax.sort` (the same on-device co-sort primitive as
# reorder.sort — uint32 key pairs, no x64), then reduce runs of equal keys
# with a segmented Hillis–Steele scan (log₂ passes of shift+add — VPU
# friendly, no scatter-adds with duplicate indices). The fused output-nnz
# estimation is *exact* here: `n_unique` falls out of the sorted key flags
# in the same program, before any value is reduced.
#
# Output blocking: when the expansion exceeds the product cap, A's rows are
# split into row-disjoint blocks (so per-block outputs concatenate with no
# cross-block merge). Caps are pow2-rounded so compiled programs are reused.
# --------------------------------------------------------------------------

_U32_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _esc_block_core(a_rows, a_cols, a_vals, a_valid, b_ptr, b_pair,
                    p_cap, pack16=False):
    """One row-block: expand -> key-sort -> segment-reduce -> compact prefix.

    Returns ``(rows, cols, vals, n_unique, n_products)``; live output
    entries occupy ranks ``[0, n_unique)`` of the returned arrays. Pure
    function of device arrays — jitted standalone (`_esc_block_jit`) or
    scanned over stacked row-blocks (`_esc_run`).

    ``pack16``: both output dims < 2^16 — (row, col) pack into ONE uint32
    sort key, cutting the dominant sort's operand count. Compaction is a
    rank-keyed SORT, not three scatters: 8M-wide scatters measured
    ~41 ms each on v5e vs ~30 ms for one extra multi-operand sort pass.
    """
    a_cols_c = jnp.where(a_valid, a_cols, 0)
    pbase_e = b_ptr[a_cols_c]  # entry-level gather: tiny
    counts = jnp.where(a_valid, b_ptr[a_cols_c + 1] - pbase_e, 0)
    offs_incl = jnp.cumsum(counts)
    total = offs_incl[-1] if counts.shape[0] else jnp.int32(0)

    # Per-product A-side attributes WITHOUT per-product gathers. XLA
    # gathers at product width measured ~7 ns/element on v5e — 8 of them
    # were ~0.5 s/iter of the round-2 ESC (scripts/probe_esc_trace_tpu).
    # Instead, fill-forward by diff-chain: scatter each entry's 32-bit
    # payload DELTA vs the previous expanding entry at its run start,
    # then one int32 cumsum over products. Wrapping int32 addition makes
    # the chain exact for ANY 32-bit payload (f32 via bitcast).
    starts = offs_incl - counts
    ne_valid = counts > 0
    pos = jnp.where(ne_valid, starts, p_cap)
    ne = counts.shape[0]
    iota_e = jnp.arange(ne, dtype=jnp.int32)
    last_ne = jax.lax.cummax(jnp.where(ne_valid, iota_e, -1))
    prev_ne = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_ne[:-1]])

    def fillp(bits_e):
        prev = jnp.where(
            prev_ne >= 0, bits_e[jnp.maximum(prev_ne, 0)], 0
        )  # entry-level gather: tiny
        d = jnp.zeros((p_cap,), jnp.int32).at[pos].set(
            bits_e - prev, mode="drop"
        )
        return jnp.cumsum(d)

    rows_f = fillp(a_rows.astype(jnp.int32))
    boff_f = fillp(pbase_e - starts)  # bpos = this + p
    abits_f = fillp(
        jax.lax.bitcast_convert_type(a_vals.astype(jnp.float32), jnp.int32)
    )

    p = jnp.arange(p_cap, dtype=jnp.int32)
    pv = p < total
    bpos = jnp.where(pv, boff_f + p, 0)
    # the ONE irreducible B-side gather: (col, val-bits) pairs fetched as
    # 2-element row slices — 6.4x faster than two scalar gathers on v5e
    # (134.5 -> 21.0 ms per 2^23 lookups, scripts/probe_escgather_tpu.py)
    g = b_pair[bpos]
    lo32 = g[:, 0].astype(jnp.uint32)
    b_val_p = jax.lax.bitcast_convert_type(g[:, 1], jnp.float32)
    a_val_p = jax.lax.bitcast_convert_type(abits_f, jnp.float32)
    val = jnp.where(pv, a_val_p * b_val_p, 0.0)

    if pack16:
        key = jnp.where(
            pv,
            (rows_f.astype(jnp.uint32) << 16) | lo32,
            _U32_SENTINEL,
        )
        key_s, val_s = jax.lax.sort([key, val], num_keys=1)
        valid_s = key_s != _U32_SENTINEL
        newseg = jnp.concatenate(
            [jnp.ones((1,), bool), key_s[1:] != key_s[:-1]]
        ) & valid_s
    else:
        hi = jnp.where(pv, rows_f.astype(jnp.uint32), _U32_SENTINEL)
        lo = jnp.where(pv, lo32, _U32_SENTINEL)
        hi_s, lo_s, val_s = jax.lax.sort([hi, lo, val], num_keys=2)
        valid_s = hi_s != _U32_SENTINEL
        newseg = jnp.concatenate(
            [
                jnp.ones((1,), bool),
                (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1]),
            ]
        ) & valid_s
    rank = jnp.cumsum(newseg.astype(jnp.int32)) - 1
    n_unique = newseg.sum()

    # segmented inclusive scan: after log2(p_cap) shift+add passes each
    # position holds the sum of its segment's prefix; the segment's last
    # position holds the exact (tree-ordered) segment total.
    seg = jnp.where(valid_s, rank, -1)
    v = val_s
    d = 1
    while d < p_cap:
        same = jnp.concatenate([jnp.zeros((d,), bool), seg[d:] == seg[:-d]])
        shifted = jnp.concatenate([jnp.zeros((d,), v.dtype), v[:-d]])
        v = v + jnp.where(same, shifted, 0.0)
        d <<= 1

    is_end = (
        jnp.concatenate([seg[:-1] != seg[1:], jnp.ones((1,), bool)]) & valid_s
    )
    # compact by a rank-keyed sort (ends first, in rank order)
    ckey = jnp.where(is_end, rank, jnp.int32(p_cap))
    if pack16:
        _, hilo_o, vals_o = jax.lax.sort([ckey, key_s, v], num_keys=1)
        rows_o = (hilo_o >> 16).astype(jnp.int32)
        cols_o = (hilo_o & jnp.uint32(0xFFFF)).astype(jnp.int32)
    else:
        _, rows_u, cols_u, vals_o = jax.lax.sort(
            [ckey, hi_s, lo_s, v], num_keys=1
        )
        rows_o = rows_u.astype(jnp.int32)
        cols_o = cols_u.astype(jnp.int32)
    # padding slots past n_unique carry sentinel-derived ids; zero them so
    # downstream COO consumers see harmless (0, 0, 0.0) entries
    live = jnp.arange(p_cap, dtype=jnp.int32) < n_unique
    rows_o = jnp.where(live, rows_o, 0)
    cols_o = jnp.where(live, cols_o, 0)
    vals_o = jnp.where(live, vals_o, 0.0)
    return rows_o, cols_o, vals_o, n_unique, total


_esc_block_jit = partial(jax.jit, static_argnames=("p_cap", "pack16"))(
    lambda a_rows, a_cols, a_vals, a_valid, b_ptr, b_cols, b_vals, *, p_cap,
    pack16=False:
    _esc_block_core(
        a_rows, a_cols, a_vals, a_valid, b_ptr,
        jnp.stack(
            [b_cols, jax.lax.bitcast_convert_type(b_vals, jnp.int32)],
            axis=1,
        ),
        p_cap, pack16)
)


@partial(
    jax.jit,
    static_argnames=("kb", "ma", "same", "a_sorted", "b_sorted"),
)
def _esc_prep(ar, ac, av, aok, br, bc, bv, bok, *, kb, ma, same=False,
              a_sorted=False, b_sorted=False):
    """Device prep for ESC: CSR-ify B, row-sort A, per-row product/entry
    prefix tables. Everything stays on device; the caller fetches only the
    two ``ma``-length tables to place row-aligned block boundaries.

    Invalid (padding) entries sort to dump rows ``kb``/``ma`` and never
    enter ``b_ptr`` or any block's entry range. ``same=True`` (A ≡ B, the
    squared-matrix benchmarks): ONE row-sort serves both sides.
    ``a_sorted``/``b_sorted`` (`COO.row_sorted`): valid entries already
    ascending by row with trailing padding — the 8M-element prep sort is
    then the identity (lax.sort is stable) and is skipped outright
    (18.5 ms/product on rmat13², traced 2026-08-21)."""
    ard = jnp.where(aok, ar, ma).astype(jnp.int32)
    if a_sorted:
        ar_s, ac_s, av_s, okb = ard, ac, av, aok
    else:
        ar_s, ac_s, av_s, ok_s = jax.lax.sort(
            [ard, ac, av, aok.astype(jnp.int32)], num_keys=1
        )
        okb = ok_s == 1
    if same:
        bc_s, bv_s, brd = ac_s, av_s, ard  # requires kb == ma
    else:
        brd = jnp.where(bok, br, kb).astype(jnp.int32)
        if b_sorted:
            bc_s, bv_s = bc, bv
        else:
            _, bc_s, bv_s = jax.lax.sort([brd, bc, bv], num_keys=1)
    # (col, val-bits) int32 pairs: the numeric phase fetches both with
    # ONE 2-element-slice gather (6.4x two scalar gathers, probe data)
    b_pair = jnp.stack(
        [bc_s, jax.lax.bitcast_convert_type(bv_s, jnp.int32)], axis=1
    )
    cnt_b = jnp.zeros((kb + 1,), jnp.int32).at[brd].add(1)
    b_ptr = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(cnt_b[:kb])]
    )
    ac_c = jnp.where(okb, ac_s, 0)
    cnt = jnp.where(okb, b_ptr[ac_c + 1] - b_ptr[ac_c], 0)
    # int32 throughout (x64 is off on TPU): total products must stay
    # < 2^31 — the benched workloads are O(10^7); larger jobs shard A
    ccnt = jnp.cumsum(cnt.astype(jnp.int32))
    # per-row cumulative products / entry count at the row's last entry
    # (rows with no entries stay 0 — host cummax-fills)
    rid = jnp.where(okb, ar_s, ma)
    prod_end = jnp.zeros((ma,), jnp.int32).at[rid].max(ccnt, mode="drop")
    ent_end = jnp.zeros((ma,), jnp.int32).at[rid].max(
        jnp.arange(1, ar_s.shape[0] + 1, dtype=jnp.int32), mode="drop"
    )
    return ar_s, ac_s, av_s, okb, b_pair, b_ptr, prod_end, ent_end


@partial(jax.jit, static_argnames=("p_cap", "na", "pack16"))
def _esc_run(ar_s, ac_s, av_s, okb, e_lo, e_hi, b_ptr, b_pair,
             *, p_cap, na, pack16=False):
    """All row-blocks in ONE dispatch: device gather of each block's entry
    range into a uniform ``(nb, na)`` stack, then `lax.scan` of the ESC
    core over blocks (replaces the round-2 host loop of per-block jit
    calls, spgemm.py:686-692 then)."""
    idx = e_lo[:, None] + jnp.arange(na, dtype=jnp.int32)[None, :]
    m = idx < e_hi[:, None]
    idc = jnp.where(m, idx, 0)
    # one 4-element-slice gather instead of four scalar gathers (same
    # 6.4x row-slice effect as the B-side pair fetch)
    ent = jnp.stack(
        [
            ar_s.astype(jnp.int32),
            ac_s.astype(jnp.int32),
            jax.lax.bitcast_convert_type(av_s, jnp.int32),
            okb.astype(jnp.int32),
        ],
        axis=1,
    )
    g = ent[idc]
    rows = jnp.where(m, g[..., 0], 0)
    cols = jnp.where(m, g[..., 1], 0)
    vals = jnp.where(
        m, jax.lax.bitcast_convert_type(g[..., 2], jnp.float32), 0.0
    )
    okm = m & (g[..., 3] == 1)

    def step(_, xs):
        r, c, v, o = xs
        return None, _esc_block_core(
            r, c, v, o, b_ptr, b_pair, p_cap, pack16
        )

    _, outs = jax.lax.scan(step, None, (rows, cols, vals, okm))
    return outs  # (rows, cols, vals) stacked (nb, p_cap) + ns, totals (nb,)


@partial(jax.jit, static_argnames=("out_cap",))
def _esc_compact(rows_b, cols_b, vals_b, ns, offs, *, out_cap):
    """Concatenate per-block compact prefixes into one COO triple.

    Gather formulation: output position k maps to (block, slot) via two
    scatter+cummax fills (no per-element table gathers) and ONE packed
    3-slice row gather — the scatter version cost 536 ms/product on the
    4-block cage case (3 scatters x 33.5M elements, traced)."""
    nb, pc = rows_b.shape
    packed = jnp.stack(
        [
            rows_b.reshape(-1),
            cols_b.reshape(-1),
            jax.lax.bitcast_convert_type(vals_b.reshape(-1), jnp.int32),
        ],
        axis=1,
    )
    k = jnp.arange(out_cap, dtype=jnp.int32)
    blk = jnp.zeros((out_cap,), jnp.int32).at[offs].max(
        jnp.arange(nb, dtype=jnp.int32), mode="drop"
    )
    blk = jax.lax.cummax(blk)
    off_of = jnp.zeros((out_cap,), jnp.int32).at[offs].max(
        offs, mode="drop"
    )
    off_of = jax.lax.cummax(off_of)  # offs ascending -> offs[blk[k]]
    total = offs[-1] + ns[-1]
    valid = k < total
    src = jnp.where(valid, blk * pc + (k - off_of), 0)
    g = packed[src]
    ro = jnp.where(valid, g[:, 0], 0)
    co = jnp.where(valid, g[:, 1], 0)
    vo = jnp.where(
        valid, jax.lax.bitcast_convert_type(g[:, 2], jnp.float32), 0.0
    )
    return ro, co, vo


def spgemm_esc(A, B, config: Config = DEFAULT, p_cap: int | None = None):
    """``C = A @ B`` by expand–sort–compress. Returns ``(C_coo, info)``.

    The default SpGEMM path: work is proportional to the true number of
    scalar products (``info['n_products']``), not to padded tile pairs.
    ``info['est_nnz']`` is the fused output-nnz estimation — exact, read
    from the sorted key structure in the same device program. ``p_cap``
    bounds products per device call (default ≤ 2^23); larger expansions
    run as row-disjoint A-blocks whose outputs concatenate directly.
    """
    ra, ca, va, aok, (ma, ka) = _device_coo(A)
    if B is A:
        rb, cb, vb, bok, (kb, nb) = ra, ca, va, aok, (ma, ka)
    else:
        rb, cb, vb, bok, (kb, nb) = _device_coo(B)
    if ka != kb:
        raise ValueError(f"inner dims mismatch: {ka} vs {kb}")
    if ra.shape[0] == 0 or rb.shape[0] == 0 or kb == 0:
        info = {"n_products": 0, "flops": 0, "nnz": 0, "est_nnz": 0}
        C = COO.from_arrays(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.float32), (ma, nb))
        return C, info

    # device prep: B CSR-ified, A row-sorted, per-row prefix tables;
    # containers built from row-major input carry row_sorted=True and
    # skip the 8M-element prep sorts entirely
    same = ra is rb and ca is cb and va is vb and int(ma) == int(kb)
    (ar_s, ac_s, av_s, okb, b_pair, b_ptr, prod_end_d, ent_end_d) = (
        _esc_prep(
            ra, ca, va, aok, rb, cb, vb, bok,
            kb=int(kb), ma=int(ma), same=same,
            a_sorted=getattr(A, "row_sorted", False),
            b_sorted=getattr(B, "row_sorted", False),
        )
    )
    # ONE small fetch (2·ma int32) to place row-aligned block boundaries
    tables = np.asarray(jnp.stack([prod_end_d, ent_end_d]))
    prod_end = np.maximum.accumulate(tables[0].astype(np.int64))
    ent_end = np.maximum.accumulate(tables[1].astype(np.int64))
    P = int(prod_end[-1])
    info = {"n_products": P, "flops": 2 * P}
    if P == 0:
        info["nnz"] = info["est_nnz"] = 0
        C = COO.from_arrays(
            np.zeros(0, np.int32), np.zeros(0, np.int32),
            np.zeros(0, np.float32), (ma, nb))
        return C, info

    row_p = np.diff(np.concatenate([[0], prod_end]))
    cap = p_cap or min(max(_pow2(P), 8), 1 << 23)
    cap = max(cap, _pow2(int(row_p.max())))
    # greedy row-aligned blocks under the cap (row-disjoint outputs)
    bounds = [0]
    while bounds[-1] < ma:
        base = 0 if bounds[-1] == 0 else int(prod_end[bounds[-1] - 1])
        nxt = int(np.searchsorted(prod_end, base + cap, side="right"))
        bounds.append(max(nxt, bounds[-1] + 1))
    e_bnd = [0] + [int(ent_end[r - 1]) for r in bounds[1:]]
    e_lo = np.asarray(e_bnd[:-1], np.int32)
    e_hi = np.asarray(e_bnd[1:], np.int32)
    na = _pow2(max(int((e_hi - e_lo).max()), 8))

    # all blocks in ONE dispatch; outputs stay on device
    # both output dims < 2^16: (row, col) pack into one uint32 sort key
    pack16 = ma <= 0xFFFF and nb <= 0x10000
    rows_b, cols_b, vals_b, ns_d, _tot = _esc_run(
        ar_s, ac_s, av_s, okb,
        jnp.asarray(e_lo), jnp.asarray(e_hi),
        b_ptr, b_pair, p_cap=int(cap), na=int(na), pack16=pack16,
    )
    ns = np.asarray(ns_d).astype(np.int64)  # (n_blocks,) small fetch
    total = int(ns.sum())
    info["nnz"] = info["est_nnz"] = total
    info["p_cap"] = int(cap)
    info["n_blocks"] = int(ns.shape[0])
    # device floor: each block pays one p_cap-sized 3-operand lax.sort
    # (measured ESC_SORT_S_PER_ELEM on v5e) — the dominant device cost
    info["floor_sort_s"] = round(
        float(ns.shape[0]) * ESC_SORT_S_PER_ELEM * cap, 6
    )
    if ns.shape[0] == 1:
        C = COO(rows=rows_b[0], cols=cols_b[0], vals=vals_b[0],
                shape=(ma, nb), n_valid=total)
    else:
        offs = np.zeros(ns.shape[0], np.int64)
        np.cumsum(ns[:-1], out=offs[1:])
        ro, co, vo = _esc_compact(
            rows_b, cols_b, vals_b, ns_d,
            jnp.asarray(offs, jnp.int32), out_cap=_pow2(max(total, 8)),
        )
        C = COO(rows=ro, cols=co, vals=vo, shape=(ma, nb), n_valid=total)
    return C, info


def _tiles_to_bsr(C_tiles, uout, shape, n_jslabs, TM, TK, config):
    """Package the dense product tiles as a bucketed BsrMatrix."""
    from ..formats.bsr import BsrBucket, BsrMatrix

    def _pow2(x):
        return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()

    strips = (uout // n_jslabs).astype(np.int64)
    jslabs = (uout % n_jslabs).astype(np.int32)
    nsp = -(-shape[0] // TM)
    tiles_per_strip = np.bincount(strips, minlength=nsp)
    first = np.zeros(nsp, np.int64)
    np.cumsum(tiles_per_strip[:-1], out=first[1:])
    widths = sorted({int(t) for t in config.bsr_bucket_tiles})
    maxT = int(tiles_per_strip.max()) if uout.size else 1
    if maxT > widths[-1]:
        widths.append(_pow2(maxT))
    T_of = np.zeros(nsp, np.int64)
    for w in reversed(widths):
        T_of[tiles_per_strip <= w] = w
    T_of[tiles_per_strip == 0] = 0

    buckets = []
    padded = 0
    for w in widths:
        sel = np.nonzero(T_of == w)[0]
        if sel.size == 0:
            continue
        ns = _pow2(max(sel.size, 8))
        strip_ids = np.full(ns, nsp, np.int32)
        strip_ids[: sel.size] = sel
        slab_ids = np.zeros((ns, w), np.int32)
        gather = np.zeros((ns, w), np.int64)  # index into C_tiles (+1 pad)
        for k, sid in enumerate(sel):
            cnt = tiles_per_strip[sid]
            lo = first[sid]
            slab_ids[k, :cnt] = jslabs[lo : lo + cnt]
            gather[k, :cnt] = np.arange(lo, lo + cnt) + 1
        # gather==0 -> zero pad tile (C_pad row 0)
        C_pad = jnp.concatenate(
            [jnp.zeros((1, TM, TK), jnp.float32), C_tiles], axis=0
        )
        tiles = C_pad[jnp.asarray(gather)]
        buckets.append(
            BsrBucket(
                strip_ids=jnp.asarray(strip_ids),
                slab_ids=jnp.asarray(slab_ids),
                tiles=tiles,
                ntiles=w,
            )
        )
        padded += ns * w
    return BsrMatrix(
        buckets=tuple(buckets),
        shape=tuple(shape),
        nnz=int(uout.size) * TM * TK,
        n_tiles=int(uout.size),
        padded_tiles=padded,
        tile_m=TM,
        tile_k=TK,
        binary=False,
    )
