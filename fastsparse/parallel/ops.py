"""Distributed SpMV / SpMM / normal-equation products over a device mesh.

TPU-native replacement for the communication layer the reference never had
(single node, OpenMP — SURVEY.md §2.2 N4): XLA collectives over ICI/DCN via
`shard_map` on a 1-D `jax.sharding.Mesh`. Rows are owned (no communication
on y — §3.4's trick); only the dense operand moves:

* **all-gather schedule** — one `all_gather` of the x shards, then local
  tile compute. Simple; XLA's latency-hiding scheduler already overlaps the
  gather with any preceding compute.
* **ring schedule** — P-step `ppermute` ring: at step s each shard
  multiplies the column block matching the x-block it currently holds while
  the next block is in flight (BASELINE.json:5 "halo segments … overlapped
  with local tile SpMV compute" — the ring-attention mechanics applied to
  SpMV, SURVEY.md §5.7).

Normal equations ``AᵀAx`` use the row shards twice: forward with gathered
x, then the transpose contribution of *local* rows only, combined with
`psum_scatter` — one all-gather + one reduce-scatter per product, no
scatter down a transpose tiling anywhere.

Everything here is mesh-shape-generic: tests run on 8 fake CPU devices
(SURVEY.md §4.3); pods only change the mesh constructor.
"""
from __future__ import annotations

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

try:  # JAX >= 0.4.35 exposes shard_map at the top level
    from jax import shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from ..formats.coo import COO
from ..utils.profiling import named
from .partition import RowPartitioned

__all__ = [
    "make_row_mesh",
    "shard_partitioned",
    "pad_operand",
    "unpad_result",
    "pspmv",
    "pspmm",
    "pspmv_t",
    "pspmm_t",
    "pnormal_mv",
    "pnormal_mm",
]


def make_row_mesh(n_devices: Optional[int] = None, axis: str = "rows") -> Mesh:
    """A 1-D mesh over the first ``n_devices`` devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return jax.make_mesh((len(devs),), (axis,), devices=devs)


def shard_partitioned(Ap: RowPartitioned, mesh: Mesh, axis: str = "rows"):
    """Place the stacked shard arrays so leading axis maps to the mesh.

    Reorder permutations (global (nrow,)/(ncol,) vectors) are replicated —
    they are consumed at the operand boundary, not inside shard_map.
    """

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    def rep(x):
        return (
            None if x is None else jax.device_put(x, NamedSharding(mesh, P()))
        )

    import dataclasses

    sharded = jax.tree.map(
        put,
        (
            Ap.local,
            Ap.blocks,
            Ap.local_bsr,
            Ap.local_bsr_t,
            Ap.blocks_bsr,
            Ap.blocks_bsr_t,
            Ap.local_ell,
        ),
    )
    return dataclasses.replace(
        Ap,
        local=sharded[0],
        blocks=sharded[1],
        local_bsr=sharded[2],
        local_bsr_t=sharded[3],
        blocks_bsr=sharded[4],
        blocks_bsr_t=sharded[5],
        local_ell=sharded[6],
        row_perm=rep(Ap.row_perm),
        col_perm=rep(Ap.col_perm),
        row_inv=rep(Ap.row_inv),
        col_inv=rep(Ap.col_inv),
    )


def _local(tree):
    """Strip the leading stacked-shard axis inside shard_map."""
    return jax.tree.map(lambda a: a[0], tree)


def _take_block(tree, q):
    """Dynamically select column block ``q`` from a (1, P, cap…) stack."""
    return jax.tree.map(lambda a: a[0, q], tree)


def pad_operand(v, Ap: RowPartitioned, side: str):
    """Permute (if the partition was reordered) and zero-pad a global dense
    operand to the padded partitioned extent.

    side='cols': operand indexed by columns (x of A·x) -> P·col_block.
    side='rows': operand indexed by rows (x of Aᵀ·x)   -> P·row_block.
    """
    perm = Ap.col_perm if side == "cols" else Ap.row_perm
    if perm is not None:
        v = v[perm]
    n = Ap.n_shards * (Ap.col_block if side == "cols" else Ap.row_block)
    pad = n - v.shape[0]
    if pad == 0:
        return v
    widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
    return jnp.pad(v, widths)


def unpad_result(v, Ap: RowPartitioned, side: str):
    """Trim padding and undo the partition's reorder permutation."""
    n = Ap.shape[0] if side == "rows" else Ap.shape[1]
    if (
        isinstance(v, jax.Array)
        and not isinstance(v, jax.core.Tracer)
        and isinstance(v.sharding, NamedSharding)
    ):
        # Slicing a sharded dim is ambiguous under sharding-in-types;
        # replicate first (host-side convenience path only).
        v = jax.device_put(v, NamedSharding(v.sharding.mesh, P()))
    v = v[:n]
    inv = Ap.row_inv if side == "rows" else Ap.col_inv
    if inv is not None:
        v = v[inv]
    return v


@named("pspmv_local")
def _spmv_local(A_coo: COO, x, n_out: int):
    g = A_coo.vals * x[A_coo.cols]
    return jnp.zeros((n_out,), g.dtype).at[A_coo.rows].add(g)


@named("pspmm_local")
def _spmm_local(A_coo: COO, X, n_out: int):
    g = A_coo.vals[:, None] * X[A_coo.cols]
    return jnp.zeros((n_out, X.shape[1]), g.dtype).at[A_coo.rows].add(g)


@named("pspmv_t_local")
def _spmv_t_local(A_coo: COO, y, n_out: int):
    g = A_coo.vals * y[A_coo.rows]
    return jnp.zeros((n_out,), g.dtype).at[A_coo.cols].add(g)


@named("pspmm_t_local")
def _spmm_t_local(A_coo: COO, Y, n_out: int):
    g = A_coo.vals[:, None] * Y[A_coo.rows]
    return jnp.zeros((n_out, Y.shape[1]), g.dtype).at[A_coo.cols].add(g)


def _ring_perm(axis: str):
    n = jax.lax.axis_size(axis)
    return [(i, (i - 1) % n) for i in range(n)]


def _pvary(x, axis: str):
    """Mark ``x`` as device-varying over ``axis`` (scan carries inside
    shard_map must have uniform varying-manual-axes types)."""
    if hasattr(jax.lax, "pcast"):
        return jax.lax.pcast(x, (axis,), to="varying")
    if hasattr(jax.lax, "pvary"):  # pragma: no cover - older JAX
        return jax.lax.pvary(x, (axis,))
    return x  # pragma: no cover - ancient JAX: vma types don't exist


def pspmv(
    Ap: RowPartitioned,
    x,
    mesh: Mesh,
    *,
    schedule: str = "allgather",
    axis: str = "rows",
    engine: str = "coo",
):
    """Distributed ``y = A @ x``.

    ``x``: f[ncol] replicated or sharded; returns y sharded over rows
    (padded extent P·row_block; `unpad_result` trims). Must be called under
    a mesh context or with sharded inputs created by `shard_partitioned`.
    ``engine='bsr'`` runs each shard through the Pallas tile kernels.
    """
    xp = pad_operand(x, Ap, "cols")
    if schedule == "allgather":
        if engine == "bsr":
            if Ap.local_bsr is None:
                raise ValueError(
                    "partition built without build_bsr_shards=True"
                )
            from ..ops.bsr_ops import bsr_spmv

            def body(local, xs):
                A = _local(local)
                x_full = jax.lax.all_gather(xs, axis, tiled=True)
                return bsr_spmv(A, x_full)

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.local_bsr, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.local_bsr, xp)

        def body(local, xs):
            A = _local(local)
            x_full = jax.lax.all_gather(xs, axis, tiled=True)
            return _spmv_local(A, x_full, Ap.row_block)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.local, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.local, xp)

    if schedule == "ring":
        if Ap.blocks is None:
            raise ValueError("partition built with build_blocks=False")
        nsh = Ap.n_shards

        def body(blocks, xs):
            me = jax.lax.axis_index(axis)

            def step(carry, s):
                buf, y = carry
                q = (me + s) % nsh
                Ablk = _take_block(blocks, q)
                y = y + _spmv_local(Ablk, buf, Ap.row_block)
                buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
                return (buf, y), None

            y0 = _pvary(jnp.zeros((Ap.row_block,), xs.dtype), axis)
            (_, y), _ = jax.lax.scan(
                step, (xs, y0), jnp.arange(nsh, dtype=jnp.int32)
            )
            return y

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.blocks, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.blocks, xp)

    raise ValueError(f"unknown schedule {schedule!r}")


def pspmm(
    Ap: RowPartitioned,
    X,
    mesh: Mesh,
    *,
    schedule: str = "allgather",
    axis: str = "rows",
    engine: str = "coo",
):
    """Distributed ``Y = A @ X`` (X sharded over its row dim).

    ``engine='bsr'`` runs each shard's product through the Pallas tiled-BSR
    kernels (requires ``partition_rows(..., build_bsr_shards=True)``); the
    default COO engine is the portable XLA path.
    """
    Xp = pad_operand(X, Ap, "cols")
    if schedule == "allgather":
        if engine == "ell":
            # hypersparse gather-engine shard path (ELL slabs per shard):
            # the Pallas gather engine on TPU, the XLA ELL path elsewhere
            if Ap.local_ell is None:
                raise ValueError(
                    "partition built without build_ell_shards=True"
                )
            from ..ops.spmm import spmm as _spmm_fmt

            def body_ell(local, Xs):
                A = _local(local)
                X_full = jax.lax.all_gather(Xs, axis, tiled=True)
                return _spmm_fmt(A, X_full)

            return shard_map(
                body_ell,
                mesh=mesh,
                in_specs=(_specs_of(Ap.local_ell, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.local_ell, Xp)
        if engine == "bsr":
            if Ap.local_bsr is None:
                raise ValueError(
                    "partition built without build_bsr_shards=True"
                )
            from ..ops.bsr_ops import bsr_spmm

            def body(local, Xs):
                A = _local(local)
                X_full = jax.lax.all_gather(Xs, axis, tiled=True)
                return bsr_spmm(A, X_full)

            # check_vma=False: pallas_call outputs carry no vma type yet
            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.local_bsr, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.local_bsr, Xp)

        def body(local, Xs):
            A = _local(local)
            X_full = jax.lax.all_gather(Xs, axis, tiled=True)
            return _spmm_local(A, X_full, Ap.row_block)

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.local, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.local, Xp)

    if schedule == "ring":
        if engine == "bsr":
            if Ap.blocks_bsr is None:
                raise ValueError(
                    "partition built without build_bsr_shards+build_blocks"
                )
            from ..ops.bsr_ops import bsr_spmm

            nsh = Ap.n_shards

            def body(blocks, Xs):
                me = jax.lax.axis_index(axis)

                def step(carry, s):
                    buf, Y = carry
                    q = (me + s) % nsh
                    Ablk = _take_block(blocks, q)
                    # tile compute on the held x-block while the next
                    # ppermute is in flight (BASELINE.json:5 overlap)
                    Y = Y + bsr_spmm(Ablk, buf)
                    buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
                    return (buf, Y), None

                Y0 = _pvary(
                    jnp.zeros((Ap.row_block, Xs.shape[1]), Xs.dtype), axis
                )
                (_, Y), _ = jax.lax.scan(
                    step, (Xs, Y0), jnp.arange(nsh, dtype=jnp.int32)
                )
                return Y

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.blocks_bsr, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.blocks_bsr, Xp)

        if Ap.blocks is None:
            raise ValueError("partition built with build_blocks=False")
        nsh = Ap.n_shards

        def body(blocks, Xs):
            me = jax.lax.axis_index(axis)

            def step(carry, s):
                buf, Y = carry
                q = (me + s) % nsh
                Ablk = _take_block(blocks, q)
                Y = Y + _spmm_local(Ablk, buf, Ap.row_block)
                buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
                return (buf, Y), None

            Y0 = _pvary(jnp.zeros((Ap.row_block, Xs.shape[1]), Xs.dtype), axis)
            (_, Y), _ = jax.lax.scan(
                step, (Xs, Y0), jnp.arange(nsh, dtype=jnp.int32)
            )
            return Y

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.blocks, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.blocks, Xp)

    raise ValueError(f"unknown schedule {schedule!r}")


def _rs_ring(axis: str, nsh: int, contrib, out_shape, dtype):
    """P-step reduce-scatter ring: at step ``s`` each shard adds its
    partial for destination ``(me + s) % P`` to the traveling buffer,
    then forwards it one hop (i → i-1). After P steps the buffer on
    shard ``d`` holds ``Σ_p contrib_p(d)`` — the transpose-product analog
    of the forward ring, with the same compute/`ppermute` overlap
    (SURVEY.md §5.7 applied to the Aᵀ pass)."""
    me = jax.lax.axis_index(axis)

    def step(buf, s):
        q = (me + s) % nsh
        buf = buf + contrib(q)
        buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
        return buf, None

    b0 = _pvary(jnp.zeros(out_shape, dtype), axis)
    out, _ = jax.lax.scan(step, b0, jnp.arange(nsh, dtype=jnp.int32))
    return out


def pspmm_t(
    Ap: RowPartitioned,
    Y,
    mesh: Mesh,
    *,
    schedule: str = "allgather",
    axis: str = "rows",
    engine: str = "coo",
):
    """Distributed ``Z = Aᵀ @ Y`` (reference ``At_mul_B``, SURVEY.md §2 R5).

    ``Y``: f[nrow, N] indexed by A's rows; returns Z sharded over columns
    (padded extent P·col_block; `unpad_result(..., 'cols')` trims). Row
    ownership means the transpose product gathers nothing — each shard
    contributes ``A_pᵀ·Y_p``:

    * ``allgather`` schedule — local dual-tiling product + one
      `psum_scatter` (one collective total);
    * ``ring`` schedule — reduce-scatter ring over per-block transpose
      tilings: partial Z blocks travel the ring while each shard computes
      the next block's contribution.
    """
    Yp = pad_operand(Y, Ap, "rows")
    nsh = Ap.n_shards
    if schedule == "allgather":
        if engine == "bsr":
            if Ap.local_bsr_t is None:
                raise ValueError(
                    "partition built without build_bsr_shards=True"
                )
            from ..ops.bsr_ops import bsr_spmm

            def body(bwd, Ys):
                part = bsr_spmm(_local(bwd), Ys)
                return jax.lax.psum_scatter(
                    part, axis, scatter_dimension=0, tiled=True
                )

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.local_bsr_t, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.local_bsr_t, Yp)

        def body(local, Ys):
            part = _spmm_t_local(
                _local(local), Ys, Ap.n_shards * Ap.col_block
            )
            return jax.lax.psum_scatter(
                part, axis, scatter_dimension=0, tiled=True
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.local, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.local, Yp)

    if schedule == "ring":
        if engine == "bsr":
            if Ap.blocks_bsr_t is None:
                raise ValueError(
                    "partition built without build_bsr_shards+build_blocks"
                )
            from ..ops.bsr_ops import bsr_spmm

            def body(blocks_t, Ys):
                return _rs_ring(
                    axis,
                    nsh,
                    lambda q: bsr_spmm(_take_block(blocks_t, q), Ys),
                    (Ap.col_block, Ys.shape[1]),
                    Ys.dtype,
                )

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.blocks_bsr_t, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.blocks_bsr_t, Yp)

        if Ap.blocks is None:
            raise ValueError("partition built with build_blocks=False")

        def body(blocks, Ys):
            return _rs_ring(
                axis,
                nsh,
                lambda q: _spmm_t_local(
                    _take_block(blocks, q), Ys, Ap.col_block
                ),
                (Ap.col_block, Ys.shape[1]),
                Ys.dtype,
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.blocks, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.blocks, Yp)

    raise ValueError(f"unknown schedule {schedule!r}")


def pspmv_t(
    Ap: RowPartitioned,
    y,
    mesh: Mesh,
    *,
    schedule: str = "allgather",
    axis: str = "rows",
    engine: str = "coo",
):
    """Distributed ``z = Aᵀ @ y`` — vector variant of `pspmm_t`."""
    yp = pad_operand(y, Ap, "rows")
    nsh = Ap.n_shards
    if schedule == "allgather":
        if engine == "bsr":
            if Ap.local_bsr_t is None:
                raise ValueError(
                    "partition built without build_bsr_shards=True"
                )
            from ..ops.bsr_ops import bsr_spmv

            def body(bwd, ys):
                part = bsr_spmv(_local(bwd), ys)
                return jax.lax.psum_scatter(
                    part, axis, scatter_dimension=0, tiled=True
                )

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(_specs_of(Ap.local_bsr_t, axis), P(axis)),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.local_bsr_t, yp)

        def body(local, ys):
            part = _spmv_t_local(
                _local(local), ys, Ap.n_shards * Ap.col_block
            )
            return jax.lax.psum_scatter(
                part, axis, scatter_dimension=0, tiled=True
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.local, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.local, yp)

    if schedule == "ring":
        if Ap.blocks is None:
            raise ValueError("partition built with build_blocks=False")

        def body(blocks, ys):
            return _rs_ring(
                axis,
                nsh,
                lambda q: _spmv_t_local(
                    _take_block(blocks, q), ys, Ap.col_block
                ),
                (Ap.col_block,),
                ys.dtype,
            )

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.blocks, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.blocks, yp)

    raise ValueError(f"unknown schedule {schedule!r}")


def pnormal_mv(Ap: RowPartitioned, x, mesh: Mesh, reg: float = 0.0, *, axis: str = "rows"):
    """Distributed ``(AᵀA + reg·I) x``: all-gather x → local A·x →
    local Aᵀ·(tmp) partials → reduce-scatter (psum_scatter)."""
    xp = pad_operand(x, Ap, "cols")
    def body(local, xs):
        A = _local(local)
        x_full = jax.lax.all_gather(xs, axis, tiled=True)
        tmp = _spmv_local(A, x_full, Ap.row_block)  # local rows
        part = _spmv_t_local(A, tmp, Ap.n_shards * Ap.col_block)
        out = jax.lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True)
        return out + reg * xs

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(_specs_of(Ap.local, axis), P(axis)),
        out_specs=P(axis),
    )(Ap.local, xp)


def pnormal_mm(
    Ap: RowPartitioned,
    X,
    mesh: Mesh,
    reg: float = 0.0,
    *,
    schedule: str = "allgather",
    axis: str = "rows",
    engine: str = "coo",
):
    """Distributed ``(AᵀA + reg·I) X`` — multi-RHS variant.

    ``engine='bsr'``: both passes run the Pallas kernels over the shard's
    forward tiling and its precompiled dual (transpose) tiling — no
    scatter anywhere (SURVEY.md §7.3 item 5), one all-gather + one
    reduce-scatter of collectives.

    ``schedule='ring'``: both passes overlap compute with communication —
    the forward pass rings X blocks (`ppermute` in flight during the
    column-block products), the Aᵀ pass rings partial Z blocks
    (reduce-scatter ring over per-block transpose tilings). No bulk
    all-gather/psum anywhere (ROADMAP item 8).
    """
    Xp = pad_operand(X, Ap, "cols")
    if schedule == "ring":
        nsh = Ap.n_shards
        if engine == "bsr":
            if Ap.blocks_bsr is None or Ap.blocks_bsr_t is None:
                raise ValueError(
                    "partition built without build_bsr_shards+build_blocks"
                )
            from ..ops.bsr_ops import bsr_spmm

            def body(blocks, blocks_t, Xs):
                me = jax.lax.axis_index(axis)

                def fstep(carry, s):
                    buf, acc = carry
                    q = (me + s) % nsh
                    acc = acc + bsr_spmm(_take_block(blocks, q), buf)
                    buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
                    return (buf, acc), None

                t0 = _pvary(
                    jnp.zeros((Ap.row_block, Xs.shape[1]), Xs.dtype), axis
                )
                (_, tmp), _ = jax.lax.scan(
                    fstep, (Xs, t0), jnp.arange(nsh, dtype=jnp.int32)
                )
                out = _rs_ring(
                    axis,
                    nsh,
                    lambda q: bsr_spmm(_take_block(blocks_t, q), tmp),
                    (Ap.col_block, Xs.shape[1]),
                    Xs.dtype,
                )
                return out + reg * Xs

            return shard_map(
                body,
                mesh=mesh,
                in_specs=(
                    _specs_of(Ap.blocks_bsr, axis),
                    _specs_of(Ap.blocks_bsr_t, axis),
                    P(axis),
                ),
                out_specs=P(axis),
                check_vma=False,
            )(Ap.blocks_bsr, Ap.blocks_bsr_t, Xp)

        if Ap.blocks is None:
            raise ValueError("partition built with build_blocks=False")

        def body(blocks, Xs):
            me = jax.lax.axis_index(axis)

            def fstep(carry, s):
                buf, acc = carry
                q = (me + s) % nsh
                acc = acc + _spmm_local(
                    _take_block(blocks, q), buf, Ap.row_block
                )
                buf = jax.lax.ppermute(buf, axis, _ring_perm(axis))
                return (buf, acc), None

            t0 = _pvary(
                jnp.zeros((Ap.row_block, Xs.shape[1]), Xs.dtype), axis
            )
            (_, tmp), _ = jax.lax.scan(
                fstep, (Xs, t0), jnp.arange(nsh, dtype=jnp.int32)
            )
            out = _rs_ring(
                axis,
                nsh,
                lambda q: _spmm_t_local(
                    _take_block(blocks, q), tmp, Ap.col_block
                ),
                (Ap.col_block, Xs.shape[1]),
                Xs.dtype,
            )
            return out + reg * Xs

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(_specs_of(Ap.blocks, axis), P(axis)),
            out_specs=P(axis),
        )(Ap.blocks, Xp)
    if engine == "bsr":
        if Ap.local_bsr is None or Ap.local_bsr_t is None:
            raise ValueError("partition built without build_bsr_shards=True")
        from ..ops.bsr_ops import bsr_spmm, mono_chain

        # mono shard layouts (partition_rows shard_layout='auto'/'mono'):
        # both passes fuse into one `mono_chain` per shard — two
        # single-launch kernels with zero pad/trim copies between them,
        # the same flagship path the single-chip operator runs
        # (VERDICT r3 #3). The check is static (layout class, py-level).
        is_mono = Ap.local_bsr.is_mono and Ap.local_bsr_t.is_mono

        def body(fwd, bwd, Xs):
            A = _local(fwd)
            At = _local(bwd)
            X_full = jax.lax.all_gather(Xs, axis, tiled=True)
            if is_mono:
                part = mono_chain(A, At, X_full)
            else:
                part = bsr_spmm(At, bsr_spmm(A, X_full))
            out = jax.lax.psum_scatter(
                part, axis, scatter_dimension=0, tiled=True
            )
            return out + reg * Xs

        return shard_map(
            body,
            mesh=mesh,
            in_specs=(
                _specs_of(Ap.local_bsr, axis),
                _specs_of(Ap.local_bsr_t, axis),
                P(axis),
            ),
            out_specs=P(axis),
            check_vma=False,
        )(Ap.local_bsr, Ap.local_bsr_t, Xp)

    def body(local, Xs):
        A = _local(local)
        X_full = jax.lax.all_gather(Xs, axis, tiled=True)
        tmp = _spmm_local(A, X_full, Ap.row_block)
        part = _spmm_t_local(A, tmp, Ap.n_shards * Ap.col_block)
        out = jax.lax.psum_scatter(part, axis, scatter_dimension=0, tiled=True)
        return out + reg * Xs

    return shard_map(
        body,
        mesh=mesh,
        in_specs=(_specs_of(Ap.local, axis), P(axis)),
        out_specs=P(axis),
    )(Ap.local, Xp)


def _specs_of(tree, axis: str):
    """in_specs pytree: shard every leaf's leading axis over ``axis``."""
    return jax.tree.map(
        lambda a: P(axis, *([None] * (a.ndim - 1))), tree
    )

