"""Sparse linear operators with precomputed dual tilings.

The reference computes ``Aᵀ·x`` by scatter-adding down the same CSR
(``bcsr_At_mul_B``, SURVEY.md §2 R5). On TPU, scatter down the transpose is
the trap (SURVEY.md §7.3 item 5): the idiomatic design precomputes *both*
tilings at convert time — ``A`` tiled by its rows and ``Aᵀ`` tiled by *its*
rows — so every product (forward, transpose, normal equations) is a pure
forward pass through an MXU-friendly execution format.

`SparseOperator` is the user-facing handle: build once with `operator()`,
then call `.matvec/.rmatvec/.matmat/.rmatmat/.normal_*` inside jitted code.
"""
from __future__ import annotations

from typing import Any, Optional

import jax.numpy as jnp

from .config import DEFAULT, SEG_COLS, Config
from .formats.bsr import BsrMatrix, build_bsr
from .formats.hybrid import HybridMatrix, build_hybrid, dense_tile_fraction
from .formats.convert import to_coo
from .formats.coo import COO, BinaryCOO
from .formats.csr import CSR, BinaryCSR
from .formats.ell import EllMatrix, build_ell, build_ell_segmented
from .ops import spmm as _spmm_mod
from .ops import spmv as _spmv_mod
from .utils.pytree import pytree_dataclass, static_field

__all__ = ["SparseOperator", "operator"]


@pytree_dataclass
class SparseOperator:
    """A sparse matrix with forward (and optionally transpose) tilings.

    ``fwd`` executes ``A·_``; ``bwd`` (a tiling of ``Aᵀ``) executes
    ``Aᵀ·_`` as a forward product. When ``bwd`` is None, transpose products
    fall back to the XLA scatter engines (correct, slower).

    When built with ``reorder=`` the tilings hold the *permuted* matrix
    ``P_r A P_cᵀ`` (degree clustering packs power-law structure into dense
    tiles — `reorder.cluster`); operands are permuted/unpermuted at the
    boundary by cheap O(n) gathers.
    """

    fwd: Any
    bwd: Optional[Any]
    row_perm: Optional[Any]  # old row id of k-th permuted row, or None
    col_perm: Optional[Any]
    row_inv: Optional[Any]
    col_inv: Optional[Any]
    shape: tuple = static_field()

    @property
    def T(self) -> "SparseOperator":
        if self.bwd is None:
            raise ValueError("operator built without transpose=True")
        return SparseOperator(
            fwd=self.bwd,
            bwd=self.fwd,
            row_perm=self.col_perm,
            col_perm=self.row_perm,
            row_inv=self.col_inv,
            col_inv=self.row_inv,
            shape=(self.shape[1], self.shape[0]),
        )

    # -- permutation boundary ------------------------------------------------
    def _in_cols(self, x):
        return x if self.col_perm is None else x[self.col_perm]

    def _in_rows(self, x):
        return x if self.row_perm is None else x[self.row_perm]

    def _out_rows(self, y):
        return y if self.row_inv is None else y[self.row_inv]

    def _out_cols(self, y):
        return y if self.col_inv is None else y[self.col_inv]

    # -- products ----------------------------------------------------------
    def matvec(self, x):
        """``A @ x``."""
        return self._out_rows(_spmv_mod.spmv(self.fwd, self._in_cols(x)))

    def rmatvec(self, x):
        """``Aᵀ @ x`` — forward product over the dual tiling when present."""
        if self.bwd is not None:
            return self._out_cols(_spmv_mod.spmv(self.bwd, self._in_rows(x)))
        return self._out_cols(_spmv_mod.spmv_t(self.fwd, self._in_rows(x)))

    def matmat(self, X):
        """``A @ X``."""
        return self._out_rows(_spmm_mod.spmm(self.fwd, self._in_cols(X)))

    def rmatmat(self, X):
        """``Aᵀ @ X``."""
        if self.bwd is not None:
            return self._out_cols(_spmm_mod.spmm(self.bwd, self._in_rows(X)))
        return self._out_cols(_spmm_mod.spmm_t(self.fwd, self._in_rows(X)))

    def _mono_chainable(self, X) -> bool:
        """Both tilings mono + Pallas-supported operand: normal/gram
        products then run as two back-to-back single-launch kernels with
        no pad/trim/permute copies in between (`ops.bsr_ops.mono_chain`;
        the inner ``row_inv∘row_perm`` gather pair cancels exactly)."""
        if self.bwd is None:
            return False
        if not (
            getattr(self.fwd, "is_mono", False)
            and getattr(self.bwd, "is_mono", False)
        ):
            return False
        from .ops.bsr_ops import pallas_supported

        return pallas_supported(jnp.asarray(X).dtype)

    def normal_matvec(self, x, reg=0.0):
        """``(AᵀA + reg·I) @ x`` — the Macau/SMURFF CG inner product
        (reference ``bcsr_AA_mul_B``, SURVEY.md §3.3). ``reg`` may be a
        traced scalar; the zero case folds away under jit."""
        if self._mono_chainable(x):
            from .ops.bsr_ops import mono_chain

            y = mono_chain(self.fwd, self.bwd, self._in_cols(x)[:, None])
            return self._out_cols(y[:, 0]) + reg * x
        return self.rmatvec(self.matvec(x)) + reg * x

    def normal_matmat(self, X, reg=0.0):
        """``(AᵀA + reg·I) @ X``."""
        if self._mono_chainable(X):
            from .ops.bsr_ops import mono_chain

            Y = mono_chain(self.fwd, self.bwd, self._in_cols(X))
            return self._out_cols(Y) + reg * X
        return self.rmatmat(self.matmat(X)) + reg * X

    def gram_matvec(self, x, reg=0.0):
        """``(AAᵀ + reg·I) @ x``."""
        if self._mono_chainable(x):
            from .ops.bsr_ops import mono_chain

            y = mono_chain(self.bwd, self.fwd, self._in_rows(x)[:, None])
            return self._out_rows(y[:, 0]) + reg * x
        return self.matvec(self.rmatvec(x)) + reg * x

    def __matmul__(self, other):
        other = jnp.asarray(other)
        return self.matvec(other) if other.ndim == 1 else self.matmat(other)


_FORMATS = ("auto", "bsr", "ell", "ell-seg", "hybrid", "coo", "csr")


def dataclasses_replace_rows(coo, rows):
    """The COO with its row array replaced (values/validity untouched)."""
    import dataclasses

    return dataclasses.replace(coo, rows=rows)

# Tiles emptier than this run faster on the gather engine than on the MXU
# tile path (BSR per-tile cost ~50 ns vs ~1.5 ns per ELL slot).
BSR_OCCUPANCY_THRESHOLD = 0.02


def _balanced_seg_cols(ncol: int, cap: int = SEG_COLS) -> int:
    """Equal-width segments (128-aligned) instead of full+remainder: a
    short tail segment still pays full bucket padding for every row that
    appears in it, so balance minimizes the worst case. Widths never
    exceed ``cap`` (the X-residency boundary for the consuming kernel)."""
    nseg = -(-ncol // cap)
    w = -(-(-(-ncol // nseg)) // 128) * 128
    while w > cap:  # 128-rounding may tip over the cap
        nseg += 1
        w = -(-(-(-ncol // nseg)) // 128) * 128
    return w


# X-residency column caps re-exported from config (formats.bsr shares them
# for the panel-layout gate).
from .config import BSR_SEG_COLS_BINARY3, BSR_SEG_COLS_F32  # noqa: E402


def tile_occupancy_estimate(coo, config: Config = DEFAULT) -> float:
    """nnz / (occupied tiles × tile area), computed host-side."""
    import numpy as np

    config = config.resolve()
    rows = np.asarray(coo.rows)[: coo.n_valid]
    cols = np.asarray(coo.cols)[: coo.n_valid]
    if rows.size == 0:
        return 0.0
    n_slabs = max(-(-coo.shape[1] // config.tile_k), 1)
    pair = (rows // config.tile_m) * n_slabs + cols // config.tile_k
    ntiles = np.unique(pair).size
    return rows.size / (ntiles * config.tile_m * config.tile_k)


def _compile_one(coo, fmt: str, config: Config, dtype):
    seg = _balanced_seg_cols(coo.shape[1])
    if fmt == "bsr":
        is_binary3 = isinstance(coo, BinaryCOO) and dtype in (
            None,
            jnp.float32,
        )
        # Panel layouts keep X resident at 4 B/elem (in-kernel fp32-parity
        # fold), so even exact-bf16 matrices segment at the f32 cap — try
        # wide first; only scattered (non-panel) exact-bf16 structure needs
        # the 6 B/elem pre-split-plane cap of the tile-bucket kernels.
        def _build(cap):
            if coo.shape[1] > cap:
                from .formats.segmented import build_bsr_segmented

                # mono panels window X per strip — no segmentation needed
                # at any width, and the whole product is ONE kernel launch
                m = build_bsr(coo, config=config, dtype=dtype, mono_only=True)
                if m is not None:
                    return m
                return build_bsr_segmented(
                    coo,
                    config=config,
                    seg_cols=_balanced_seg_cols(coo.shape[1], cap),
                    dtype=dtype,
                )
            return build_bsr(coo, config=config, dtype=dtype)

        built = _build(BSR_SEG_COLS_F32)
        if is_binary3 and coo.shape[1] > BSR_SEG_COLS_BINARY3:
            pieces = getattr(built, "segments", (built,))
            if not all(getattr(s, "is_panel", False) for s in pieces):
                built = _build(BSR_SEG_COLS_BINARY3)
        return built
    # Sub-row splitting serves the f32 Pallas gather engine only; the
    # fp64-class (dd) paths require the unsplit layout for exactness.
    vdtype = (
        jnp.float32 if isinstance(coo, (BinaryCOO, BinaryCSR))
        else coo.vals.dtype
    )
    if dtype is not None:
        vdtype = jnp.dtype(dtype)
    split = (
        config.resolve().ell_split_rows
        if jnp.dtype(vdtype) == jnp.dtype(jnp.float32)
        else 0
    )
    if fmt == "ell":
        if coo.shape[1] > SEG_COLS:
            return build_ell_segmented(
                coo, config=config, seg_cols=seg, dtype=dtype,
                split_rows=split,
            )
        return build_ell(coo, config=config, dtype=dtype, split_rows=split)
    if fmt == "hybrid":
        return build_hybrid(coo, config=config, seg_cols=SEG_COLS, dtype=dtype)
    if fmt == "ell-seg":
        return build_ell_segmented(
            coo, config=config, seg_cols=seg, dtype=dtype, split_rows=split
        )
    if fmt == "csr":
        from .formats.convert import to_csr

        return to_csr(coo)
    return coo


def operator(
    mat,
    format: str = "auto",
    transpose: bool = True,
    config: Config = DEFAULT,
    dtype=None,
    reorder: Optional[str] = None,
    tune: bool = False,
) -> SparseOperator:
    """Compile ``mat`` (COO/CSR/scipy) into a :class:`SparseOperator`.

    ``format='auto'`` picks BSR for f32/bf16 (Pallas MXU path) and ELL for
    f64 (XLA engine path — TPU f64 is emulated, SURVEY.md §7.3 item 4).
    ``transpose=True`` additionally compiles the dual tiling of ``Aᵀ``.
    ``reorder`` permutes rows/columns before tiling (products are unchanged
    — operands are permuted at the boundary): ``'degree'`` (descending
    degree), ``'minhash'`` (similarity co-clustering), ``'tilepack'``
    (iterated cluster + column-packing — strongest on community structure),
    ``'hilbert'`` (first-appearance renumbering along the Hilbert curve —
    the reference's sort_sbm locality trick recast as tile density),
    or ``'auto'`` (pick by modeled product cost).
    ``tune=True`` replaces the power-of-two bucket edges with per-matrix
    optimal ones (`tuning.tuned_config`) — less padding, but compiled
    program shapes become matrix-specific.
    """
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}")
    if hasattr(mat, "tocoo") and not isinstance(
        mat, (COO, BinaryCOO, CSR, BinaryCSR, EllMatrix, BsrMatrix, HybridMatrix)
    ):
        # scipy input
        from .formats.coo import binary_coo_from_scipy, coo_from_scipy
        import numpy as np

        m = mat.tocoo()
        if (m.data == 1.0).all() and dtype is None:
            coo = binary_coo_from_scipy(m)
        else:
            coo = coo_from_scipy(m, dtype=dtype)
    else:
        coo = to_coo(mat)

    # Power-of-two entry capacity: bounded jit shapes for the on-device
    # sort/conversion programs (compile-cache reuse across matrices).
    def _pow2(x):
        return 1 if x <= 1 else 1 << (int(x) - 1).bit_length()

    if hasattr(coo, "pad_to") and coo.nnz_cap != _pow2(coo.nnz_cap):
        coo = coo.pad_to(_pow2(coo.nnz_cap))

    # Reorder BEFORE resolving format='auto': occupancy/dense-fraction must
    # reflect the layout the tilings will actually be built from.
    row_perm = col_perm = row_inv = col_inv = None
    if reorder in ("degree", "minhash", "tilepack", "hilbert", "auto"):
        from .reorder.cluster import (
            best_perms,
            degree_perms,
            hilbert_perms,
            invert_perm,
            minhash_perms,
            permute_coo,
            tilepack_perms,
        )

        if reorder == "degree":
            row_perm, col_perm = degree_perms(coo)
        elif reorder == "minhash":
            row_perm, col_perm = minhash_perms(coo)
        elif reorder == "tilepack":
            row_perm, col_perm = tilepack_perms(coo)
        elif reorder == "hilbert":
            row_perm, col_perm = hilbert_perms(coo)
        else:
            row_perm, col_perm = best_perms(coo)
        if row_perm is not None:
            row_inv = invert_perm(row_perm)
            col_inv = invert_perm(col_perm)
            coo = permute_coo(coo, row_perm, col_perm)
    elif reorder not in (None, "none"):
        raise ValueError(f"unknown reorder {reorder!r}")

    if tune:
        from .tuning import tuned_config

        # on the permuted layout: reordering changes strip/slab populations
        config = tuned_config(coo, config=config)

    if format == "auto":
        is_binary = isinstance(coo, BinaryCOO)
        vdtype = jnp.float32 if is_binary else coo.vals.dtype
        if dtype is not None:
            vdtype = jnp.dtype(dtype)
        if vdtype in (jnp.float32, jnp.bfloat16):
            # MXU tile path only pays off when tiles are reasonably full;
            # mixed structure splits (hybrid); hypersparse structure runs
            # the gather engine. Hybrid-vs-ELL decided by the measured
            # cost model (bench.model) on this matrix's tile histogram.
            occ = tile_occupancy_estimate(coo, config)
            if occ >= BSR_OCCUPANCY_THRESHOLD:
                format = "bsr"
            else:
                import numpy as np

                from .bench.model import (
                    GATHER_PAD,
                    GATHER_SLOT_S,
                    _tile_counts,
                    auto_threshold_from_counts,
                )

                cnt = _tile_counts(
                    np.asarray(coo.rows)[: coo.n_valid],
                    np.asarray(coo.cols)[: coo.n_valid],
                    coo.shape,
                    config.resolve().tile_m,
                    config.tile_k,
                )
                th, hybrid_cost = auto_threshold_from_counts(cnt)
                all_sparse = GATHER_SLOT_S * GATHER_PAD * int(cnt.sum())
                fmt_is_hybrid = (
                    cnt.size > 0
                    and th <= int(cnt.max())
                    and hybrid_cost < 0.9 * all_sparse
                )
                # dense-column extraction alone can justify hybrid for
                # binary power-law structure (high-degree columns move
                # to one MXU block — bench.model.dense_col_select)
                if not fmt_is_hybrid and is_binary:
                    from .bench.model import dense_col_select

                    coldeg = np.bincount(
                        np.asarray(coo.cols)[: coo.n_valid],
                        minlength=coo.shape[1],
                    )
                    fmt_is_hybrid = (
                        dense_col_select(coldeg, coo.shape[0]).size > 0
                    )
                format = "hybrid" if fmt_is_hybrid else "ell"
        else:
            format = "ell"

    # tile_m=None (the default) = auto: pick the modeled-best height for
    # this structure. Keying on the sentinel — NOT on `config is DEFAULT` —
    # means a field-for-field-equal Config() gets the same fast layouts
    # (a pinned tile_m=8 measured 6x slower on the banded mono headline).
    # Permutation-boundary elision for gather-engine-family formats.
    # The op boundary pays fully-random 512 B-row gathers (measured
    # ~104 GB/s: X[col_perm] and Y[row_inv] cost 2.56 ms EACH per rmat
    # s18 product — 1/3 of its device time, traced 2026-08-21), but:
    # * ELL bucket membership, the dense-column block, and the hybrid
    #   split are ROW-ID-AGNOSTIC — rows can go back to ORIGINAL order
    #   before building, deleting the output gather outright;
    # * only column SEGMENT MEMBERSHIP is load-bearing (X residency) —
    #   sorting each segment's perm slice ascending keeps membership
    #   while X[col_perm] reads quasi-sequentially; single-segment
    #   matrices drop the column perm entirely.
    # Gated on the TILE share: clustered structure (ecfp scaffolds)
    # needs both perms for its dense BSR tiles, so formats whose tile
    # part would carry >25% of nnz keep them. Tiled BSR and
    # transpose=True operators always keep both (strips need row
    # clustering; the dual tiling's segments live on this tiling's
    # row order).
    if (
        format in ("ell", "ell-seg", "hybrid")
        and not transpose
        and (row_perm is not None or col_perm is not None)
    ):
        import dataclasses

        import numpy as np

        from .bench.model import _tile_counts, auto_threshold_from_counts

        tile_share = 0.0
        if format == "hybrid":
            rcfg = config.resolve()
            r_np = np.asarray(coo.rows)[: coo.n_valid]
            c_np = np.asarray(coo.cols)[: coo.n_valid]
            if isinstance(coo, BinaryCOO):
                # the share must reflect the structure the tile engine
                # will ACTUALLY see: high-degree columns leave for the
                # dense-column block first (rmat's hot columns read as
                # 30% "tile share" pre-extraction and kept the perms —
                # and their 2x2.5 ms boundary gathers — alive)
                from .bench.model import dense_col_select

                coldeg = np.bincount(c_np, minlength=coo.shape[1])
                sel = dense_col_select(coldeg, coo.shape[0])
                if sel.size:
                    keep = ~np.isin(c_np, sel)
                    r_np, c_np = r_np[keep], c_np[keep]
            cnt = _tile_counts(
                r_np, c_np, coo.shape, rcfg.tile_m, rcfg.tile_k
            )
            if cnt.size:
                th_, _ = auto_threshold_from_counts(cnt)
                tile_share = float(
                    cnt[cnt >= th_].sum() / max(cnt.sum(), 1)
                )
        if tile_share < 0.25:
            if row_perm is not None:
                rp = jnp.asarray(row_perm)
                coo = dataclasses_replace_rows(coo, rp[coo.rows])
                row_perm = row_inv = None
            if col_perm is not None:
                ncol_ = coo.shape[1]
                w = _balanced_seg_cols(ncol_)
                cp_old = np.asarray(col_perm)
                c_cur = np.asarray(coo.cols)[: coo.n_valid]
                r_cur = np.asarray(coo.rows)[: coo.n_valid].astype(np.int64)
                orig = cp_old[c_cur]
                nseg_ = max(-(-ncol_ // w), 1)
                # Keep the column perm ONLY if its segment-locality win
                # pays for the X[col_perm] boundary gather. MEASURED
                # constants (rmat s18 A/B, 2026-08-21): dropping the
                # perm grew incidences 299k -> 578k and the product
                # 17.4 -> 28.7 ms — ~40 ns per extra (row, segment)
                # incidence (part-row padding to the width ladder,
                # per-row kernel issue, extra plan classes/launches),
                # far above the naive 3x512B-pass estimate. The input
                # gather costs ~10 ns per X row REGARDLESS of index
                # order (a piecewise-sorted perm gathered no faster
                # than a random one — XLA row gathers are per-row-
                # overhead-bound).
                pairs_perm = np.unique(
                    r_cur * nseg_ + c_cur // w
                ).size
                pairs_orig = np.unique(
                    r_cur * nseg_ + orig // w
                ).size
                saved_s = (pairs_orig - pairs_perm) * 30e-9
                inperm_s = ncol_ * 10e-9
                if ncol_ <= w or saved_s < inperm_s:
                    # segments keep ORIGINAL contiguous column ranges:
                    # no boundary gather, X windows become plain slices
                    coo = dataclasses.replace(
                        coo, cols=jnp.asarray(cp_old)[coo.cols]
                    )
                    col_perm = col_inv = None
                else:
                    # worth keeping — canonicalize each segment's slice
                    # ascending (membership unchanged; the gather output
                    # order is then quasi-sequential per segment)
                    cp_new = cp_old.copy()
                    for off in range(0, ncol_, w):
                        cp_new[off : off + w].sort()
                    from .reorder.cluster import invert_perm

                    inv_new = np.asarray(invert_perm(cp_new))
                    remap = inv_new[cp_old]
                    coo = dataclasses.replace(
                        coo, cols=jnp.asarray(remap)[coo.cols]
                    )
                    col_perm = jnp.asarray(cp_new)
                    col_inv = jnp.asarray(inv_new)

    auto_tm = config.tile_m is None
    if format == "bsr" and auto_tm:
        # Taller tiles amortize fixed per-tile overheads when structure
        # merges vertically (banded/blocked: measured 1.3x at tm>=32);
        # explicit tile_m values are never overridden.
        import dataclasses

        import numpy as np

        from .bench.model import best_tile_m

        tm = best_tile_m(
            np.asarray(coo.rows)[: coo.n_valid],
            np.asarray(coo.cols)[: coo.n_valid],
            coo.shape,
            config.tile_k,
        )
        config = dataclasses.replace(config, tile_m=tm)
    elif auto_tm:
        config = config.resolve()

    fwd = _compile_one(coo, format, config, dtype)
    # Mono layouts get cheaper with taller items (fewer grid steps, same
    # bytes when structure merges vertically): plain mono at tile_m=256
    # measured 0.208 vs 0.338 ms (tm=128) on the banded headline
    # (probe_mono4, same process). Auto path only; keep 256 only if the
    # 256-build still selects a mono layout.
    if (
        format == "bsr"
        and auto_tm
        and config.tile_m == 128
        and getattr(fwd, "is_mono", False)
    ):
        import dataclasses as _dc

        cfg256 = _dc.replace(config, tile_m=256)
        fwd256 = _compile_one(coo, format, cfg256, dtype)
        if getattr(fwd256, "is_mono", False):
            fwd, config = fwd256, cfg256
    bwd = None
    if transpose:
        # plain index swap; builders row-sort host-side themselves
        if isinstance(coo, BinaryCOO):
            coo_t = BinaryCOO(
                rows=coo.cols,
                cols=coo.rows,
                shape=(coo.shape[1], coo.shape[0]),
                n_valid=coo.n_valid,
            )
        else:
            coo_t = COO(
                rows=coo.cols,
                cols=coo.rows,
                vals=coo.vals,
                shape=(coo.shape[1], coo.shape[0]),
                n_valid=coo.n_valid,
            )
        bwd = _compile_one(coo_t, format, config, dtype)
    # Scatter-free Y assembly for the gather engine: precompute the
    # slot->row gather schedule at build time (ops.assemble).
    from .ops.assemble import attach_plan

    fwd = attach_plan(fwd)
    bwd = attach_plan(bwd)
    return SparseOperator(
        fwd=fwd,
        bwd=bwd,
        row_perm=row_perm,
        col_perm=col_perm,
        row_inv=row_inv,
        col_inv=col_inv,
        shape=tuple(coo.shape),
    )
