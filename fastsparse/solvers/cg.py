"""Conjugate-gradient solvers for sparse normal equations.

The reference exists to serve exactly this consumer: Macau/SMURFF's Gibbs
sampler solves ``(AᵀA + reg·I) v = b`` by CG every iteration, calling
``bcsr_AA_mul_B`` thousands of times per run (SURVEY.md §3.3). Here the
whole solve is one jitted `lax.while_loop` over `SparseOperator` products —
zero host round-trips per iteration — with a multi-RHS variant (columnwise
CG over independent RHS columns, the Macau "A'A·X panel" workload,
BASELINE.json:9).
"""
from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

__all__ = ["cg", "cg_normal", "normal_jacobi", "CGResult"]


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # int32 — iterations executed
    resnorm: jax.Array  # final ‖r‖ per RHS


def _cg_impl(matvec, b, x0, tol, maxiter, minv=None):
    # Supports b of shape (n,) or (n, k): all math is columnwise.
    # ``minv``: optional preconditioner apply (Jacobi: elementwise scale).
    def dot(u, v):
        return jnp.sum(u * v, axis=0)

    def prec(r):
        return r if minv is None else minv(r)

    r0 = b - matvec(x0)
    z0 = prec(r0)
    p0 = z0
    gamma0 = dot(r0, z0)
    res0 = dot(r0, r0)
    bnorm2 = jnp.maximum(dot(b, b), jnp.finfo(b.dtype).tiny)
    tol2 = (tol * tol) * bnorm2

    def cond(state):
        _, _, _, _, res, k = state
        return jnp.logical_and(k < maxiter, jnp.any(res > tol2))

    def body(state):
        x, r, p, gamma, _, k = state
        q = matvec(p)
        denom = dot(p, q)
        alpha = jnp.where(denom != 0, gamma / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * q
        z = prec(r)
        gamma_new = dot(r, z)
        beta = jnp.where(gamma != 0, gamma_new / gamma, 0.0)
        p = z + beta * p
        return (x, r, p, gamma_new, dot(r, r), k + 1)

    x, r, _, _, res, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, gamma0, res0, jnp.int32(0))
    )
    return CGResult(x=x, iters=k, resnorm=jnp.sqrt(res))


def cg(
    matvec: Callable,
    b,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> CGResult:
    """Solve ``M x = b`` for SPD ``M`` given ``matvec``; b: (n,) or (n,k).

    Traces ``matvec`` on every call — wrap the enclosing computation in
    `jax.jit` (or use `cg_normal`, which is jit-cached on the operator
    structure) for repeated solves.
    """
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _cg_impl(matvec, b, x0, jnp.asarray(tol, b.dtype), maxiter)


@partial(jax.jit, static_argnames=("maxiter", "has_dinv"))
def _cg_normal_impl(op, b, x0, reg, tol, dinv, maxiter, has_dinv):
    if b.ndim == 1:
        matvec = lambda v: op.normal_matvec(v, reg=reg)  # noqa: E731
        minv = (lambda r: dinv * r) if has_dinv else None
    else:
        matvec = lambda v: op.normal_matmat(v, reg=reg)  # noqa: E731
        minv = (lambda r: dinv[:, None] * r) if has_dinv else None
    return _cg_impl(matvec, b, x0, tol, maxiter, minv)


def normal_jacobi(mat, reg: float = 0.0):
    """Inverse Jacobi diagonal of ``AᵀA + reg·I``: 1 / (Σ_i A_ij² + reg).

    Host-side from the original matrix (scipy / COO / CSR); pass the
    result as ``cg_normal(..., precond=...)``. Power-law column degrees
    make the normal-equation diagonal span orders of magnitude — Jacobi
    scaling collapses that part of the condition number.
    """
    import numpy as np

    if hasattr(mat, "tocoo") and not hasattr(mat, "rows"):
        m = mat.tocoo()
        cols, vals, ncol = m.col, m.data, m.shape[1]
    else:
        from ..formats.convert import to_coo

        coo = to_coo(mat)
        cols = np.asarray(coo.cols)[: coo.n_valid]
        ncol = coo.shape[1]
        if hasattr(coo, "vals"):
            vals = np.asarray(coo.vals)[: coo.n_valid]
        else:
            vals = np.ones(cols.shape[0], np.float32)
    d = np.zeros(ncol, np.float64)
    np.add.at(d, cols, np.asarray(vals, np.float64) ** 2)
    d = d + reg
    d[d == 0] = 1.0
    return jnp.asarray(1.0 / d, jnp.result_type(vals.dtype, jnp.float32))


def cg_normal(
    op,
    b,
    reg: float = 0.0,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
    precond=None,
) -> CGResult:
    """Solve ``(AᵀA + reg·I) x = b`` over a `SparseOperator` — the Macau
    inner solve (multi-RHS when b is (ncol, k)). Jit-cached on the
    operator's bucket structure: repeated solves don't retrace.

    ``precond``: optional inverse-diagonal vector (see `normal_jacobi`)
    enabling Jacobi-preconditioned CG — typically 2-5× fewer iterations on
    power-law columns."""
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    has_dinv = precond is not None
    dinv = (
        jnp.asarray(precond, b.dtype)
        if has_dinv
        else jnp.zeros((b.shape[0],), b.dtype)
    )
    return _cg_normal_impl(
        op, b, x0,
        jnp.asarray(reg, b.dtype), jnp.asarray(tol, b.dtype),
        dinv, maxiter, has_dinv,
    )
