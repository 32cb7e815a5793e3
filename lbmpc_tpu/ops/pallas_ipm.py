"""Fused Pallas IPM: the entire Mehrotra predictor-corrector loop in VMEM.

The XLA-composed IPM (ops/ipm.py) runs each tiny step as its own fused op,
bouncing (B, nz)/(B, mI) intermediates through HBM between micro-kernels —
measured HBM-bound on TPU v5e. This kernel keeps all state for a TILE of
problems resident in VMEM across every iteration:

  - batch-in-lanes layout: vectors are (rows, TILE) with the problem index in
    the 128-wide lane dimension, so per-problem scalar recurrences (Cholesky
    columns, triangular solves, step-length minima) are full-width VPU ops;
  - matrices live in a 2-D block layout (nz, nz*TILE): column j of problem t
    sits at [:, j*TILE + t]. Column extraction is a static 2-D slice, row
    extraction is a reshape, and the Cholesky rank-1 update is a broadcasted
    2-D multiply — no 3-D ops, no scatter (Mosaic lowers all of it);
  - the KKT normal matrices for all TILE problems come from nz small MXU
    matmuls: column block j of M is G' (d * G[:, j]) — same FLOPs as the
    single (nz^2, mI) "W" operand formulation but without its 2 MB VMEM
    residency (the 16 MB scoped limit is tight at mI ~ 800, tile 128);
  - padding: nz to sublane multiples (identity diagonal), mI to lane multiples
    (h = +BIG rows never activate).

Shared (H, G) across the batch — exactly the MPC setting, where every scenario
solves the same-structure QP with different (g, h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def build_pallas_qp_solver(
    H: np.ndarray,
    G: np.ndarray,
    iters: int = 20,
    tile: int = 128,
    tau: float = 0.995,
    interpret: bool = False,
):
    """Returns solve(g (B, nz), h (B, mI)) -> (x (B, nz), converged (B,)).

    H (nz, nz) and G (mI, nz) are fixed at build time (shared by the batch);
    per-problem data is (g, h). float32 compute, HIGHEST matmul precision.
    """
    nz = H.shape[0]
    mI = G.shape[0]
    nz_p = _round_up(nz, 8)
    mI_p = _round_up(mI, 128)
    n2 = nz_p * nz_p

    Hp = np.zeros((nz_p, nz_p), np.float32)
    Hp[:nz, :nz] = H
    for i in range(nz, nz_p):
        Hp[i, i] = 1.0
    Gp = np.zeros((mI_p, nz_p), np.float32)
    Gp[:mI, :nz] = G
    GT = Gp.T.copy()

    def mxu(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(g_ref, h_ref, GT_ref, G_ref, H_ref,
               x_out, conv_out, x_s, s_s, z_s):
        T = tile
        g = g_ref[:]
        h = h_ref[:]
        GTm = GT_ref[:]
        Gm = G_ref[:]
        Hm = H_ref[:]

        rows_n = jax.lax.broadcasted_iota(jnp.int32, (nz_p, 1), 0)
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (mI_p, 1), 0)
        act = jnp.where(rows_m < jnp.int32(mI), 1.0, 0.0).astype(jnp.float32)

        x_s[:] = jnp.zeros((nz_p, T), jnp.float32)
        s_s[:] = jnp.maximum(h, 1.0)
        z_s[:] = jnp.ones((mI_p, T), jnp.float32)

        # ---- small dense algebra on a static LIST of (nz_p, T) columns ----
        # Left-looking formulations: every step is a static slice + broadcast
        # (no concats, no reshapes — those force cross-lane relayouts that
        # dominated the first on-chip version's runtime).

        def chol_cols(Mcols):
            """Left-looking Cholesky; Mcols/result are lists of (nz_p, T)."""
            Ls = []
            for j in range(nz_p):
                acc = Mcols[j]
                for k in range(j):
                    coef = Ls[k][j : j + 1, :]                  # L[j, k] per lane
                    acc = acc - coef * Ls[k]
                djj = jnp.sqrt(jnp.maximum(acc[j : j + 1, :], 1e-30))
                Ls.append(jnp.where(rows_n >= j, acc / djj, 0.0))
            return Ls

        def tri_lower(Ls, b):
            """Solve L y = b given column list; y as (nz_p, T) via masked adds."""
            y = jnp.zeros_like(b)
            for j in range(nz_p):
                yj = b[j : j + 1, :] / Ls[j][j : j + 1, :]
                y = y + jnp.where(rows_n == j, yj, 0.0)
                b = b - jnp.where(rows_n > j, Ls[j] * yj, 0.0)
            return y

        def tri_upper_t(Ls, y):
            """Solve L^T x = y: x_j = (y_j - sum_{k>j} L[k,j] x_k) / L[j,j];
            L[k, j] is a row slice of column j — still column-local."""
            xs = [None] * nz_p
            for idx in range(nz_p):
                j = nz_p - 1 - idx
                acc = y[j : j + 1, :]
                for k in range(j + 1, nz_p):
                    acc = acc - Ls[j][k : k + 1, :] * xs[k]
                xs[j] = acc / Ls[j][j : j + 1, :]
            x = jnp.zeros_like(y)
            for j in range(nz_p):
                x = x + jnp.where(rows_n == j, xs[j], 0.0)
            return x

        def body(it, _):
            x = x_s[:]
            s = s_s[:]
            z = z_s[:]
            rd = mxu(Hm, x) + g + mxu(GTm, z)
            Gx = mxu(Gm, x)
            rp = Gx + s - h
            s_safe = jnp.maximum(s, 1e-25)
            d = jnp.minimum(z / s_safe, 1e7)
            # M column j = G' (d * G[:, j]) + H[:, j] + reg e_j —
            # nz_p small matmuls; columns stay a static list (no big operand)
            Mcols = []
            for j in range(nz_p):
                gcol = Gm[:, j : j + 1]                          # (mI_p, 1)
                rhs_j = d * gcol                                 # (mI_p, T)
                Mj = mxu(GTm, rhs_j) + Hm[:, j : j + 1]
                Mj = Mj + jnp.where(rows_n == j, 1e-6, 0.0)
                Mcols.append(Mj)
            Ls = chol_cols(Mcols)

            def kkt(rc):
                t = d * rp - rc / s_safe
                rhs = -(rd + mxu(GTm, t))
                dx = tri_upper_t(Ls, tri_lower(Ls, rhs))
                Gdx = mxu(Gm, dx)
                dz = d * (rp + Gdx) - rc / s_safe
                ds = -rp - Gdx
                return dx, ds, dz

            def steplen(v, dv, t_):
                ratio = jnp.where(dv < 0.0, -v / jnp.where(dv < 0.0, dv, -1.0), BIG)
                return jnp.minimum(1.0, t_ * jnp.min(ratio, axis=0, keepdims=True))

            mu = jnp.sum(s * z * act, axis=0, keepdims=True) / float(mI)
            dxa, dsa, dza = kkt(s * z)
            ap = steplen(s, dsa, 1.0)
            ad = steplen(z, dza, 1.0)
            mu_aff = jnp.sum((s + ap * dsa) * (z + ad * dza) * act,
                             axis=0, keepdims=True) / float(mI)
            sigma = (mu_aff / jnp.maximum(mu, 1e-25)) ** 3
            rc = s * z + dsa * dza - sigma * mu
            dx, ds, dz = kkt(rc)
            ap = steplen(s, ds, tau)
            ad = steplen(z, dz, tau)
            x_s[:] = x + ap * dx
            s_s[:] = s + ap * ds
            z_s[:] = z + ad * dz
            return 0

        jax.lax.fori_loop(0, iters, body, 0)
        x = x_s[:]
        s = s_s[:]
        z = z_s[:]
        x_out[:] = x
        rp = mxu(Gm, x) + s - h
        mu = jnp.sum(s * z * act, axis=0, keepdims=True) / float(mI)
        ok = jnp.logical_and(
            mu < 2e-4 * (1.0 + mu * float(mI)),
            jnp.max(jnp.abs(rp) * act, axis=0, keepdims=True) < 2e-3,
        )
        conv_out[:] = jnp.where(ok, 1.0, 0.0).astype(jnp.float32)

    def solve(g: jax.Array, h: jax.Array):
        # the kernel is pure f32/i32; a global jax_enable_x64 would let weak
        # 64-bit scalars leak into Mosaic (which hard-checks bitwidth <= 32)
        with jax.enable_x64(False):
            return _solve_inner(np.asarray(g, np.float32), np.asarray(h, np.float32))

    @jax.jit
    def _solve_inner(g: jax.Array, h: jax.Array):
        B = g.shape[0]
        assert B % tile == 0, f"batch {B} must be a multiple of tile {tile}"
        g_t = jnp.zeros((nz_p, B), jnp.float32).at[:nz, :].set(g.T.astype(jnp.float32))
        h_t = jnp.full((mI_p, B), BIG, jnp.float32).at[:mI, :].set(h.T.astype(jnp.float32))
        x_t, conv = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((nz_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((mI_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nz_p, mI_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mI_p, nz_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nz_p, nz_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nz_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nz_p, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nz_p, tile), jnp.float32),
                pltpu.VMEM((mI_p, tile), jnp.float32),
                pltpu.VMEM((mI_p, tile), jnp.float32),
            ],
            interpret=interpret,
        )(g_t, h_t, jnp.asarray(GT), jnp.asarray(Gp), jnp.asarray(Hp))
        return x_t[:nz, :].T, conv[0, :] > 0.5

    return solve
