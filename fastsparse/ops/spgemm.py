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


@partial(jax.jit, static_argnames=("p_cap",))
def _esc_block_jit(a_rows, a_cols, a_vals, a_valid, b_ptr, b_cols, b_vals,
                   *, p_cap):
    """One row-block: expand -> key-sort -> segment-reduce -> compact prefix.

    Returns ``(rows, cols, vals, n_unique, n_products)``; live output
    entries occupy ranks ``[0, n_unique)`` of the returned arrays.
    """
    a_cols_c = jnp.where(a_valid, a_cols, 0)
    counts = jnp.where(a_valid, b_ptr[a_cols_c + 1] - b_ptr[a_cols_c], 0)
    offs_incl = jnp.cumsum(counts)
    total = offs_incl[-1] if counts.shape[0] else jnp.int32(0)

    # product p -> source A entry: mark each entry's run start, then
    # cummax-fill. (NOT jnp.searchsorted: its binary-search scan measured
    # 1.02 s at 8M on v5e vs ~2 ms for scatter+cummax.)
    starts = offs_incl - counts
    iota_e = jnp.arange(counts.shape[0], dtype=jnp.int32)
    mark = jnp.full((p_cap,), -1, jnp.int32)
    mark = mark.at[jnp.where(counts > 0, starts, p_cap)].max(
        iota_e, mode="drop")
    src = jnp.maximum(jax.lax.cummax(mark), 0)
    p = jnp.arange(p_cap, dtype=jnp.int32)
    pv = p < total
    src_c = jnp.where(pv, src, 0)
    r = p - (offs_incl[src_c] - counts[src_c])
    bpos = jnp.where(pv, b_ptr[a_cols_c[src_c]] + r, 0)
    hi = jnp.where(pv, a_rows[src_c].astype(jnp.uint32), _U32_SENTINEL)
    lo = jnp.where(pv, b_cols[bpos].astype(jnp.uint32), _U32_SENTINEL)
    val = jnp.where(pv, a_vals[src_c] * b_vals[bpos], 0.0)

    hi_s, lo_s, val_s = jax.lax.sort([hi, lo, val], num_keys=2)
    valid_s = hi_s != _U32_SENTINEL
    newseg = jnp.concatenate(
        [jnp.ones((1,), bool), (hi_s[1:] != hi_s[:-1]) | (lo_s[1:] != lo_s[:-1])]
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

    is_end = jnp.concatenate([seg[:-1] != seg[1:], jnp.ones((1,), bool)]) & valid_s
    out_idx = jnp.where(is_end, rank, p_cap)
    rows_o = jnp.zeros(p_cap, jnp.int32).at[out_idx].set(
        hi_s.astype(jnp.int32), mode="drop")
    cols_o = jnp.zeros(p_cap, jnp.int32).at[out_idx].set(
        lo_s.astype(jnp.int32), mode="drop")
    vals_o = jnp.zeros(p_cap, jnp.float32).at[out_idx].set(v, mode="drop")
    return rows_o, cols_o, vals_o, n_unique, total


def spgemm_esc(A, B, config: Config = DEFAULT, p_cap: int | None = None):
    """``C = A @ B`` by expand–sort–compress. Returns ``(C_coo, info)``.

    The default SpGEMM path: work is proportional to the true number of
    scalar products (``info['n_products']``), not to padded tile pairs.
    ``info['est_nnz']`` is the fused output-nnz estimation — exact, read
    from the sorted key structure in the same device program. ``p_cap``
    bounds products per device call (default ≤ 2^23); larger expansions
    run as row-disjoint A-blocks whose outputs concatenate directly.
    """
    ra, ca, va, (ma, ka) = _host_coo(A)
    rb, cb, vb, (kb, nb) = _host_coo(B)
    if ka != kb:
        raise ValueError(f"inner dims mismatch: {ka} vs {kb}")

    # host-side CSR of B (row pointers for the expansion index math)
    order = np.argsort(rb, kind="stable")
    rb_s, cb_s, vb_s = rb[order], cb[order], vb[order]
    b_ptr = np.zeros(kb + 1, np.int64)
    np.cumsum(np.bincount(rb_s, minlength=kb), out=b_ptr[1:])

    # A entries row-sorted so blocks are row-disjoint
    aorder = np.argsort(ra, kind="stable")
    ra_s, ca_s, va_s = ra[aorder], ca[aorder], va[aorder]
    counts = (b_ptr[ca_s + 1] - b_ptr[ca_s]).astype(np.int64)
    P = int(counts.sum())
    info = {"n_products": P, "flops": 2 * P}

    if P == 0 or ra_s.size == 0:
        info["nnz"] = info["est_nnz"] = 0
        C = COO.from_arrays(
            np.zeros(0, np.int64), np.zeros(0, np.int64),
            np.zeros(0, np.float32), (ma, nb))
        return C, info

    # products per A row -> row-disjoint blocks under the cap
    row_end = np.searchsorted(ra_s, np.unique(ra_s), side="right")
    prod_at_row_end = np.cumsum(counts)[row_end - 1]
    max_row_p = int(np.max(np.diff(np.concatenate([[0], prod_at_row_end]))))
    cap = p_cap or min(max(_pow2(P), 8), 1 << 23)
    cap = max(cap, _pow2(max_row_p))

    b_ptr_d = jnp.asarray(b_ptr, jnp.int32)
    b_cols_d = jnp.asarray(cb_s, jnp.int32)
    b_vals_d = jnp.asarray(vb_s, jnp.float32)

    # block boundaries: greedy fill to cap, split only at row ends
    bounds = [0]
    while bounds[-1] < row_end.size:
        lo_e = 0 if bounds[-1] == 0 else prod_at_row_end[bounds[-1] - 1]
        nxt = int(np.searchsorted(prod_at_row_end, lo_e + cap, side="right"))
        bounds.append(max(nxt, bounds[-1] + 1))
    # stack all blocks into uniform (n_blocks, na_max) arrays so the host
    # -> device upload is ONE transfer set (per-block uploads are
    # RTT-bound through the remote tunnel); blocks then slice on device
    spans = []
    for lo_r, hi_r in zip(bounds[:-1], bounds[1:]):
        e_lo = 0 if lo_r == 0 else int(row_end[lo_r - 1])
        e_hi = int(row_end[hi_r - 1])
        blk_p = int(counts[e_lo:e_hi].sum())
        if blk_p > cap:  # greedy invariant: cap >= max single-row expansion
            raise AssertionError(
                f"ESC block products {blk_p} exceed cap {cap}")
        spans.append((e_lo, e_hi))
    na = _pow2(max(max(e_hi - e_lo for e_lo, e_hi in spans), 8))
    nb_blk = len(spans)
    a_rows = np.zeros((nb_blk, na), np.int32)
    a_cols = np.zeros((nb_blk, na), np.int32)
    a_vals = np.zeros((nb_blk, na), np.float32)
    valid = np.zeros((nb_blk, na), bool)
    for i, (e_lo, e_hi) in enumerate(spans):
        w = e_hi - e_lo
        a_rows[i, :w] = ra_s[e_lo:e_hi]
        a_cols[i, :w] = ca_s[e_lo:e_hi]
        a_vals[i, :w] = va_s[e_lo:e_hi]
        valid[i, :w] = True
    a_rows_d = jnp.asarray(a_rows)
    a_cols_d = jnp.asarray(a_cols)
    a_vals_d = jnp.asarray(a_vals)
    valid_d = jnp.asarray(valid)
    parts = [
        _esc_block_jit(
            a_rows_d[i], a_cols_d[i], a_vals_d[i], valid_d[i],
            b_ptr_d, b_cols_d, b_vals_d, p_cap=cap,
        )
        for i in range(nb_blk)
    ]
    # fetch only the per-block scalar counts; the output entries stay on
    # device (single block: zero-copy full-capacity arrays + n_valid —
    # padding beyond the prefix is all-zero by construction)
    ns = [int(p[3]) for p in parts]
    n_est = int(sum(ns))
    info["nnz"] = info["est_nnz"] = n_est
    info["p_cap"] = cap
    info["n_blocks"] = len(parts)
    if len(parts) == 1:
        rows_o, cols_o, vals_o = parts[0][:3]
    else:
        rows_o = jnp.concatenate([p[0][:n] for p, n in zip(parts, ns)])
        cols_o = jnp.concatenate([p[1][:n] for p, n in zip(parts, ns)])
        vals_o = jnp.concatenate([p[2][:n] for p, n in zip(parts, ns)])
    C = COO(rows=rows_o, cols=cols_o, vals=vals_o, shape=(ma, nb),
            n_valid=n_est)
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
