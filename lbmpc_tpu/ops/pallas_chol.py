"""Pallas-fused batched Cholesky factor+solve for the IPM's KKT systems.

Hybrid strategy (docs/ROADMAP.md): the IPM's matmuls are MXU-bound and XLA
handles them well; the ~100 tiny sequential ops of the factorization and
triangular solves are dispatch-bound on the remote TPU runtime. This module
fuses exactly that part: one kernel factors TB problems' (n, n) SPD matrices
and solves one RHS; a second kernel re-solves with the stored factor (the
Mehrotra corrector reuses the predictor's factorization).

Layout: column-major flat pack M_t (n*n, B) with row (j*n + i) = M[i, j] and
the batch in lanes; column j of every problem is the contiguous sublane block
M_t[j*n:(j+1)*n, :], so the left-looking recurrences are static row slices —
no reshapes, no relayouts. Large tiles (default 512 lanes) amortize VPU op
issue; VMEM stays small because the (mI, ...) constraint operands never enter.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.partial(jax.jit, static_argnames=("tile", "interpret"))
def chol_factor_solve(M: jax.Array, b: jax.Array, tile: int = 512,
                      interpret: bool = False):
    """Factor SPD M (B, n, n) and solve M x = b (B, n).

    Returns (L_flat (B, n*n) column-major-packed factor, x (B, n)).
    float32 compute; pad n to sublane multiple with identity diagonal.
    """
    B, n, _ = M.shape
    n_p = _round_up(n, 8)
    with jax.enable_x64(False):
        Mp = jnp.zeros((B, n_p, n_p), jnp.float32)
        Mp = Mp.at[:, :n, :n].set(M.astype(jnp.float32))
        idx = jnp.arange(n, n_p)
        Mp = Mp.at[:, idx, idx].set(1.0)
        bp = jnp.zeros((B, n_p), jnp.float32).at[:, :n].set(b.astype(jnp.float32))
        # flat pack: row (j*n_p + i) = M[i, j]  -> transpose to (n_p, n_p, B)
        M_t = jnp.transpose(Mp, (2, 1, 0)).reshape(n_p * n_p, B)
        b_t = bp.T
        L_t, x_t = _factor_solve_call(M_t, b_t, n_p, tile, interpret)
        return L_t.T, x_t[:n, :].T


@functools.partial(jax.jit, static_argnames=("n_p", "tile", "interpret"))
def _factor_solve_call(M_t, b_t, n_p, tile, interpret):
    B = M_t.shape[1]
    n2 = n_p * n_p

    def kernel(M_ref, b_ref, L_out, x_out):
        Ls = _chol_cols(M_ref, n_p)
        y = _tri_lower(Ls, b_ref[:], n_p)
        x = _tri_upper_t(Ls, y, n_p)
        for j in range(n_p):
            L_out[j * n_p : (j + 1) * n_p, :] = Ls[j]
        x_out[:] = x

    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n2, B), jnp.float32),
            jax.ShapeDtypeStruct((n_p, B), jnp.float32),
        ],
        interpret=interpret,
    )(M_t, b_t)


@functools.partial(jax.jit, static_argnames=("n", "tile", "interpret"))
def chol_resolve(L_flat: jax.Array, b: jax.Array, n: int, tile: int = 512,
                 interpret: bool = False):
    """Solve M x = b reusing a factor from chol_factor_solve.

    L_flat: (B, n_p*n_p) packed factor; b (B, n). Returns x (B, n).
    """
    B = L_flat.shape[0]
    n_p = int(np.sqrt(L_flat.shape[1]))
    with jax.enable_x64(False):
        bp = jnp.zeros((B, n_p), jnp.float32).at[:, :n].set(b.astype(jnp.float32))
        x_t = _resolve_call(L_flat.T.astype(jnp.float32), bp.T, n_p, tile, interpret)
        return x_t[:n, :].T


@functools.partial(jax.jit, static_argnames=("n_p", "tile", "interpret"))
def _resolve_call(L_t, b_t, n_p, tile, interpret):
    B = L_t.shape[1]
    n2 = n_p * n_p

    def kernel(L_ref, b_ref, x_out):
        Ls = [L_ref[j * n_p : (j + 1) * n_p, :] for j in range(n_p)]
        y = _tri_lower(Ls, b_ref[:], n_p)
        x_out[:] = _tri_upper_t(Ls, y, n_p)

    return pl.pallas_call(
        kernel,
        grid=(B // tile,),
        in_specs=[
            pl.BlockSpec((n2, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((n_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_p, B), jnp.float32),
        interpret=interpret,
    )(L_t, b_t)


# ---- shared in-kernel recurrences (lists of (n_p, T) column blocks) ----


def _chol_cols(M_ref, n_p):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    Ls = []
    for j in range(n_p):
        acc = M_ref[j * n_p : (j + 1) * n_p, :]
        for k in range(j):
            acc = acc - Ls[k][j : j + 1, :] * Ls[k]
        djj = jnp.sqrt(jnp.maximum(acc[j : j + 1, :], 1e-30))
        Ls.append(jnp.where(rows >= j, acc / djj, 0.0))
    return Ls


def _tri_lower(Ls, b, n_p):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    y = jnp.zeros_like(b)
    for j in range(n_p):
        yj = b[j : j + 1, :] / Ls[j][j : j + 1, :]
        y = y + jnp.where(rows == j, yj, 0.0)
        b = b - jnp.where(rows > j, Ls[j] * yj, 0.0)
    return y


def _tri_upper_t(Ls, y, n_p):
    rows = jax.lax.broadcasted_iota(jnp.int32, (n_p, 1), 0)
    xs = [None] * n_p
    for idx in range(n_p):
        j = n_p - 1 - idx
        acc = y[j : j + 1, :]
        for k in range(j + 1, n_p):
            acc = acc - Ls[j][k : k + 1, :] * xs[k]
        xs[j] = acc / Ls[j][j : j + 1, :]
    x = jnp.zeros_like(y)
    for j in range(n_p):
        x = x + jnp.where(rows == j, xs[j], 0.0)
    return x
