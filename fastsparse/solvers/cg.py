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

__all__ = ["cg", "cg_normal", "CGResult"]


class CGResult(NamedTuple):
    x: jax.Array
    iters: jax.Array  # int32 — iterations executed
    resnorm: jax.Array  # final ‖r‖ per RHS


def _cg_impl(matvec, b, x0, tol, maxiter):
    # Supports b of shape (n,) or (n, k): all math is columnwise.
    def dot(u, v):
        return jnp.sum(u * v, axis=0)

    r0 = b - matvec(x0)
    p0 = r0
    gamma0 = dot(r0, r0)
    bnorm2 = jnp.maximum(dot(b, b), jnp.finfo(b.dtype).tiny)
    tol2 = (tol * tol) * bnorm2

    def cond(state):
        _, _, _, gamma, k = state
        return jnp.logical_and(k < maxiter, jnp.any(gamma > tol2))

    def body(state):
        x, r, p, gamma, k = state
        q = matvec(p)
        denom = dot(p, q)
        alpha = jnp.where(denom != 0, gamma / denom, 0.0)
        x = x + alpha * p
        r = r - alpha * q
        gamma_new = dot(r, r)
        beta = jnp.where(gamma != 0, gamma_new / gamma, 0.0)
        p = r + beta * p
        return (x, r, p, gamma_new, k + 1)

    x, r, _, gamma, k = jax.lax.while_loop(
        cond, body, (x0, r0, p0, gamma0, jnp.int32(0))
    )
    return CGResult(x=x, iters=k, resnorm=jnp.sqrt(gamma))


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


@partial(jax.jit, static_argnames=("maxiter",))
def _cg_normal_impl(op, b, x0, reg, tol, maxiter):
    if b.ndim == 1:
        matvec = lambda v: op.normal_matvec(v, reg=reg)  # noqa: E731
    else:
        matvec = lambda v: op.normal_matmat(v, reg=reg)  # noqa: E731
    return _cg_impl(matvec, b, x0, tol, maxiter)


def cg_normal(
    op,
    b,
    reg: float = 0.0,
    x0=None,
    *,
    tol: float = 1e-6,
    maxiter: int = 1000,
) -> CGResult:
    """Solve ``(AᵀA + reg·I) x = b`` over a `SparseOperator` — the Macau
    inner solve (multi-RHS when b is (ncol, k)). Jit-cached on the
    operator's bucket structure: repeated solves don't retrace."""
    b = jnp.asarray(b)
    if x0 is None:
        x0 = jnp.zeros_like(b)
    return _cg_normal_impl(
        op, b, x0, jnp.asarray(reg, b.dtype), jnp.asarray(tol, b.dtype), maxiter
    )
