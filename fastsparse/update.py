"""Incremental value updates: same sparsity pattern, new values.

The reference rebuilds its structs from scratch for any change (matrices
are read-only inputs — SURVEY.md §5.4). Production iterative workloads
(IRLS reweighting, time-varying graph weights, Gibbs-sampled precision
terms) change *values* far more often than *structure*, and rebuilding a
tiled format costs host round-trips plus device scatters per bucket.

`ValueUpdater` separates the two: structure is compiled once (any execution
format, or a whole `SparseOperator` with dual tilings), and a value update
is a single jitted scatter into the existing storage — O(nnz), no host
work, safe inside `lax.scan` loops.

How it works — **probe builds**: building the structure with distinguisher
values (entry ids, split into two f32-exact halves) recovers, for every
floating-point leaf of the result pytree, which flat position each original
COO entry landed in. That mapping is format-agnostic: it covers EllMatrix,
BsrMatrix (valued), SegmentedEll, ColSegmented, HybridMatrix, CSR/COO
engines, and SparseOperator (both tilings + permutations) without knowing
any builder's internals. Formats that *derive* stored values nonlinearly
from entry values (bitmask binary tiles, compensated double-word planes)
cannot be value-updated and are rejected at creation time.
"""
from __future__ import annotations

from typing import Any, Callable, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .formats.coo import COO, BinaryCOO
from .utils.pytree import pytree_dataclass, static_field

__all__ = ["ValueUpdater", "value_updater"]

_CHUNK = 1 << 16  # per-probe id range; two probes cover 2^32 entries


def _is_value_leaf(leaf) -> bool:
    return jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating)


@pytree_dataclass
class _Plan:
    """Scatter map per floating leaf of the structure pytree."""

    positions: Tuple[jax.Array, ...]  # flat index into the leaf
    entry_ids: Tuple[jax.Array, ...]  # original COO entry index
    leaf_is_value: tuple = static_field()
    n_entries: int = static_field()


@jax.jit
def _apply(plan: _Plan, template, new_vals):
    leaves, treedef = jax.tree_util.tree_flatten(template)
    out = []
    vi = 0
    for k, leaf in enumerate(leaves):
        if plan.leaf_is_value[k]:
            pos = plan.positions[vi]
            eid = plan.entry_ids[vi]
            vi += 1
            flat = leaf.ravel().at[pos].set(new_vals[eid].astype(leaf.dtype))
            out.append(flat.reshape(leaf.shape))
        else:
            out.append(leaf)
    return jax.tree_util.tree_unflatten(treedef, out)


def _probe_build(build_fn, coo: COO, probe_vals: np.ndarray):
    # f64 matrices probe in f64 (exact, and keeps dtype-driven format
    # auto-selection identical to the real build); everything else f32.
    pdt = jnp.float64 if coo.vals.dtype == jnp.float64 else jnp.float32
    probe = COO(
        rows=coo.rows,
        cols=coo.cols,
        vals=jnp.asarray(probe_vals, pdt),
        shape=coo.shape,
        n_valid=coo.n_valid,
    )
    return build_fn(probe)


@pytree_dataclass
class ValueUpdater:
    """Compiled structure + jitted value-update path.

    Create with :func:`value_updater`; then ``updater.update(new_vals)``
    returns the same structure holding ``new_vals`` (indexed in the
    original COO entry order). The updater is a pytree — it can be closed
    over or passed through jitted code.
    """

    matrix: Any  # the built structure with the original values
    plan: _Plan

    @property
    def n_entries(self) -> int:
        return self.plan.n_entries

    def update(self, new_vals) -> Any:
        """New structure with ``new_vals``; one jitted scatter per leaf."""
        new_vals = jnp.asarray(new_vals)
        if new_vals.shape != (self.plan.n_entries,):
            raise ValueError(
                f"expected vals of shape ({self.plan.n_entries},), "
                f"got {new_vals.shape}"
            )
        return _apply(self.plan, self.matrix, new_vals)

    def updated_self(self, new_vals) -> "ValueUpdater":
        """Updater wrapping the updated structure (for chained use)."""
        return ValueUpdater(matrix=self.update(new_vals), plan=self.plan)


def value_updater(
    mat,
    build_fn: Optional[Callable[[COO], Any]] = None,
    **operator_kwargs,
) -> ValueUpdater:
    """Build ``mat``'s structure once and a reusable value-update plan.

    ``mat``: COO / scipy matrix with values (binary structures have nothing
    to update). ``build_fn`` maps a COO to any execution structure; default
    is ``operator(coo, **operator_kwargs)`` (a full `SparseOperator`,
    including the dual transpose tiling and any ``reorder=`` permutation).

    The probe builds run with f32 values — ``build_fn`` must not quantize
    below f32 *during construction* (bf16/f64 storage is fine: the update
    scatter casts to each leaf's dtype).
    """
    from .linops import operator as _operator

    if isinstance(mat, BinaryCOO):
        raise TypeError("binary matrices store no values to update")
    if not isinstance(mat, COO):
        if hasattr(mat, "tocoo"):
            from .formats.coo import coo_from_scipy

            mat = coo_from_scipy(mat.tocoo())
        else:
            from .formats.convert import to_coo

            mat = to_coo(mat)
    if build_fn is None:
        def build_fn(c, _kw=operator_kwargs):
            return _operator(c, **_kw)

    n = int(mat.n_valid)
    cap = int(mat.nnz_cap)
    ids = np.arange(cap, dtype=np.int64)
    lo = (ids % _CHUNK + 1).astype(np.float32)
    hi = (ids // _CHUNK + 1).astype(np.float32)

    built_lo = _probe_build(build_fn, mat, lo)
    built_hi = _probe_build(build_fn, mat, hi)

    lo_leaves, treedef_lo = jax.tree_util.tree_flatten(built_lo)
    hi_leaves, _ = jax.tree_util.tree_flatten(built_hi)
    leaf_is_value = tuple(_is_value_leaf(l) for l in lo_leaves)

    positions = []
    entry_ids = []
    covered = np.zeros(n, bool)
    for k, (ll, hl) in enumerate(zip(lo_leaves, hi_leaves)):
        if not leaf_is_value[k]:
            continue
        lf = np.asarray(ll, np.float64).ravel()
        hf = np.asarray(hl, np.float64).ravel()
        pos = np.nonzero(lf)[0]
        lo_ids = np.rint(lf[pos]).astype(np.int64) - 1
        hi_ids = np.rint(hf[pos]).astype(np.int64) - 1
        ids_k = hi_ids * _CHUNK + lo_ids
        bad = (
            (np.rint(lf[pos]) != lf[pos]).any()
            or (hf[pos] == 0).any()
            or (ids_k < 0).any()
            or (ids_k >= cap).any()
        )
        if bad:
            raise TypeError(
                "structure derives stored values nonlinearly from entry "
                "values (e.g. compensated double-word planes) — it cannot "
                "be value-updated; rebuild instead"
            )
        live = ids_k < n
        pos, ids_k = pos[live], ids_k[live]
        covered[ids_k] = True
        idx_dt = np.int32 if lf.size < 2**31 else np.int64
        positions.append(jnp.asarray(pos.astype(idx_dt)))
        entry_ids.append(jnp.asarray(ids_k.astype(np.int32 if n < 2**31 else np.int64)))
    if n and not covered.all():
        raise TypeError(
            f"probe build dropped {int((~covered).sum())} of {n} entries — "
            "structure is not value-updatable"
        )

    plan = _Plan(
        positions=tuple(positions),
        entry_ids=tuple(entry_ids),
        leaf_is_value=leaf_is_value,
        n_entries=n,
    )
    # the real build, with the actual values
    matrix = build_fn(mat)
    return ValueUpdater(matrix=matrix, plan=plan)
