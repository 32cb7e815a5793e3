"""Batched small-matrix Cholesky + solve with compact lowering.

XLA's `jnp.linalg.cholesky`/`cho_solve` lower tiny (n<=64) systems into large
blocked HLO with triangular-solve loops — slow to compile on the remote TPU
toolchain and latency-heavy to run for the IPM's (B, nz, nz) KKT systems.
This module hand-rolls the factorization as `fori_loop`s of rank-1 updates
vectorized across the batch: O(n) sequential steps of (B, n) VPU ops, compact
HLO, identical math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def chol_batched(M: jax.Array) -> jax.Array:
    """Cholesky factor L (lower) of a batch of SPD matrices, shape (..., n, n).

    Column-by-column (left-looking) algorithm; each of the n steps updates the
    trailing submatrix with a rank-1 product vectorized over batch and rows.
    """
    n = M.shape[-1]

    def body2(j, state):
        A, L = state
        d = jnp.sqrt(jnp.maximum(A[..., j, j], 1e-300))
        col = A[..., :, j] / d[..., None]
        below = jnp.arange(n) > j
        colb = jnp.where(below, col, 0.0)
        Lcol = jnp.where(jnp.arange(n) >= j, col, 0.0)
        L = L.at[..., :, j].set(Lcol)
        A = A - colb[..., :, None] * colb[..., None, :]
        return A, L

    L0 = jnp.zeros_like(M)
    _, L = jax.lax.fori_loop(0, n, body2, (M, L0))
    return L


def solve_tri_lower(L: jax.Array, b: jax.Array) -> jax.Array:
    """Solve L y = b (L lower-triangular), batched: (..., n, n), (..., n)."""
    n = L.shape[-1]

    def body(i, y):
        # y_i = (b_i - L[i, :i] @ y[:i]) / L[i, i]
        row = L[..., i, :]
        mask = jnp.arange(n) < i
        s = jnp.sum(jnp.where(mask, row * y, 0.0), axis=-1)
        yi = (b[..., i] - s) / L[..., i, i]
        return y.at[..., i].set(yi)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(b))


def solve_tri_upper_t(L: jax.Array, y: jax.Array) -> jax.Array:
    """Solve L^T x = y, batched."""
    n = L.shape[-1]

    def body(k, x):
        i = n - 1 - k
        col = L[..., :, i]          # L[:, i] -> L^T[i, :]
        mask = jnp.arange(n) > i
        s = jnp.sum(jnp.where(mask, col * x, 0.0), axis=-1)
        xi = (y[..., i] - s) / L[..., i, i]
        return x.at[..., i].set(xi)

    return jax.lax.fori_loop(0, n, body, jnp.zeros_like(y))


def cholesky_solve(M: jax.Array, b: jax.Array) -> jax.Array:
    """x = M^-1 b for batched SPD M via the compact Cholesky above."""
    L = chol_batched(M)
    return solve_tri_upper_t(L, solve_tri_lower(L, b))
