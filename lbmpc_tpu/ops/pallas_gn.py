"""Pallas GN-phase kernel: learned-rollout residual, hand-derived Jacobian,
and the Gauss-Newton normal terms (H = 2J'J + reg, g = 2J'e) in ONE launch.

Round-3 phase budget (scripts/phase_budget.py, v5e, batch 2048, N=20/q=100):
the XLA residual+Jacobian scan costs 2.57 ms/step and the H/g einsums
0.95 ms — together ~2/3 of the fused SQP step after the Pallas-IPM
promotion, almost all of it op-issue overhead on thousands of tiny batched
ops inside the N-step sensitivity scan. This kernel keeps the whole scan
resident in VMEM with the batch in lanes:

  - state x, controls, theta: (1, T) lane rows; sensitivities S_i = d x_i/dz
    and du/dz: (nz_p, T) blocks (decision index in sublanes);
  - the NW oracle (oracle.nw_estimate_and_jac semantics, bit-compatible
    masked form) evaluates as (q, T) elementwise chains + sublane reduces;
  - H accumulates per decision column as 2 * sum_rows outer(J_row), written
    directly in the packed (nz_p, nz_p*T) layout ops/pallas_ipm's QP kernel
    streams — the two kernels hand off without any XLA-side transposes.

fmincon family, m = 1 (the flagship/bench configuration; the casadi family
keeps the XLA path). Semantics mirror controllers/lbmpc.make_residual_and_jac
exactly — equality tested in tests/test_pallas_gn.py.
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


def build_pallas_gn_kernel(
    qp,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w,
    delta: float,
    bandwidth: float,
    ridge: float,
    dx_ref: np.ndarray | None,
    q: int,
    tile: int = 256,
    interpret: bool = False,
    debug_stage: int = 3,
):
    """Returns raw(z (B, nz), dx0 (B, n), windows) -> (e (B, ne), H (tiles,
    nz_p, nz_p*T) packed, g (B, nz), m0cost (B,)) with H/g the exact GN
    normal terms of controllers/sqp_fused (H includes the 1e-6 ridge).

    The packed H is consumed directly by
    ops/pallas_ipm.build_pallas_qp_solver_h's `raw_packed` entry.
    """
    N, n, m = qp.N, qp.n, qp.m
    assert m == 1, "pallas GN kernel covers the m=1 flagship configuration"
    nth = np.atleast_2d(np.asarray(w.LAMBDA)).shape[1]
    nz = N * m + nth
    # residual stack (lbmpc._finish): rx (N-2, n) + ru (N-2, m) + rP (n)
    # + rT (n)  — rT = sqrtT*(LAM theta - xs_ref) has n rows
    ne = (N - 2) * (n + m) + n + n
    nz_p = _round_up(nz, 8)
    ne_p = _round_up(ne, 8)
    T = tile
    d_in = 3
    d_out = n

    An = np.asarray(A, np.float32)
    Bn = np.asarray(B, np.float32).reshape(n)
    Ksn = np.atleast_2d(np.asarray(Ks, np.float32)).reshape(n)
    Lq = np.asarray(w.Lq, np.float32)
    Lr = float(np.asarray(w.Lr, np.float32).reshape(()))
    Lp = np.asarray(w.Lp, np.float32)
    LAM = np.atleast_2d(np.asarray(w.LAMBDA, np.float32))      # (n, nth)
    PSI = np.atleast_2d(np.asarray(w.PSI, np.float32)).reshape(nth)
    sqrtT = float(np.asarray(w.sqrtT))
    xs_ref = (np.zeros(n, np.float32) if dx_ref is None
              else np.asarray(dx_ref, np.float32))
    inv_bw2 = float(1.0 / (bandwidth * bandwidth))

    # constant Jacobian columns: LAM_T/PSI_T = d(xa)/dz, d(ua)/dz (theta cols)
    LAM_T = np.zeros((n, nz), np.float32)
    LAM_T[:, N * m:] = LAM
    PSI_T = np.zeros((nz,), np.float32)
    PSI_T[N * m:] = PSI
    # rT row of J is constant: sqrtT * LAM_T -> fold its H contribution (and
    # the SQP's 1e-6 ridge) into a shared constant added once per lane
    Hconst = (1e-6 * np.eye(nz)
              + 2.0 * (sqrtT * LAM_T).T @ (sqrtT * LAM_T))
    Hconst_p = np.zeros((nz_p, nz_p), np.float32)
    Hconst_p[:nz, :nz] = Hconst
    LAM_T_p = np.zeros((nz_p, n), np.float32)   # column i = LAM_T row i
    LAM_T_p[:nz, :] = LAM_T.T
    PSI_T_p = np.zeros((nz_p, 8), np.float32)
    PSI_T_p[:nz, 0] = PSI_T

    # small constants travel as ONE 128-lane operand (narrow or >2D blocks
    # crashed Mosaic's vector-layout pass; lane slicing of a full-width
    # operand is the pattern pallas_ipm already uses): lanes 0..n-1 = LAM_T
    # rows, lane 4 = PSI_T, lanes 8.. = Hconst columns
    del LAM_T_p, PSI_T_p
    q_p = _round_up(q, 8)     # window rows padded so per-dim slices 8-align
    CONST = np.zeros((nz_p, 128), np.float32)
    for i in range(n):
        CONST[:nz, i] = LAM_T[i]
    CONST[:nz, 4] = PSI_T
    CONST[:, 8:8 + nz_p] = Hconst_p
    CONST_j = jnp.asarray(CONST)

    def kernel(z_ref, dx_ref_, Xw_ref, Yw_ref, val_ref, C_ref, e_out, H_out,
               g_out):
        with jax.enable_x64(False):
            _body(z_ref, dx_ref_, Xw_ref, Yw_ref, val_ref, C_ref, e_out,
                  H_out, g_out)

    def _body(z_ref, dx_ref_, Xw_ref, Yw_ref, val_ref, C_ref, e_out, H_out,
              g_out):
        rows_z = jax.lax.broadcasted_iota(jnp.int32, (nz_p, 1), 0)
        valid = val_ref[:]                                       # (q_p, T)
        Xd = [Xw_ref[d * q_p:(d + 1) * q_p, :] for d in range(d_in)]
        Yd = [Yw_ref[d * q_p:(d + 1) * q_p, :] for d in range(d_out)]

        theta = [z_ref[N * m + t:N * m + t + 1, :] for t in range(nth)]
        xa = [sum(LAM[i, t] * theta[t] for t in range(nth))
              for i in range(n)]                        # n x (1, T)
        ua = sum(PSI[t] * theta[t] for t in range(nth))  # (1, T)

        x = [dx_ref_[i:i + 1, :] for i in range(n)]
        S = [jnp.zeros((nz_p, T), jnp.float32) for _ in range(n)]
        Hcols = [jnp.zeros((nz_p, T), jnp.float32) for _ in range(nz)]
        g_acc = jnp.zeros((nz_p, T), jnp.float32)
        e_rows = [None] * ne_p
        LTcols = [C_ref[:, i:i + 1] for i in range(n)]         # (nz_p, 1)
        PTcol = C_ref[:, 4:5]
        Hccols = [C_ref[:, 8 + j:9 + j] for j in range(nz_p)]

        # a lane-materialized (1, T) zero: rows 4.. of the dx block are
        # zero-padded. Added to values before row-slicing them — Mosaic's
        # layout pass crashes slicing sublanes of a lane-REPLICATED value
        # (ancestors like zeros + (nz_p, 1) broadcasts keep a 1-lane-tile
        # layout; extract_slice then asserts "limits[i] <= dim(i) (2 vs 1)")
        lane0 = dx_ref_[4:5, :] * 0.0

        def add_outer(Drow, erow):
            """Accumulate H += 2 outer(Drow) and g += 2 erow * Drow."""
            nonlocal Hcols, g_acc
            if debug_stage < 3:
                return
            Drow = Drow + lane0
            for j in range(nz):
                Hcols[j] = Hcols[j] + 2.0 * Drow[j:j + 1, :] * Drow
            g_acc = g_acc + 2.0 * erow * Drow

        for k in range(N):
            ck = z_ref[k:k + 1, :]
            u = sum(Ksn[j] * x[j] for j in range(n)) + ck
            dudz = sum(Ksn[j] * S[j] for j in range(n))
            dudz = dudz + jnp.where(rows_z == k, 1.0, 0.0)

            # --- NW oracle: value + closed-form Jacobian (oracle.py) ---
            xi = [x[0], x[1], u]
            dxidz = [S[0], S[1], dudz]
            diffs = [Xd[d] - xi[d] for d in range(d_in)]
            sq = diffs[0] * diffs[0]
            for d in range(1, d_in):
                sq = sq + diffs[d] * diffs[d]
            kv = jnp.exp(-sq * inv_bw2) * valid
            denom = ridge + jnp.sum(kv, axis=0, keepdims=True)
            wts = kv / denom                            # (q, T)
            wY = [wts * Yd[o] for o in range(d_out)]
            yhat = [jnp.sum(wY[o], axis=0, keepdims=True)
                    for o in range(d_out)]
            s1 = [jnp.sum(wts * diffs[d], axis=0, keepdims=True)
                  for d in range(d_in)]
            # Jg[o][d] (1, T)
            Jg = [[2.0 * inv_bw2
                   * (jnp.sum(wY[o] * diffs[d], axis=0, keepdims=True)
                      - yhat[o] * s1[d])
                   for d in range(d_in)] for o in range(d_out)]

            # --- residual + Jacobian rows at stage k (pre-update state) ---
            if k < N - 2 and debug_stage >= 2:
                for i in range(n):
                    e_rows[k * n + i] = sum(Lq[i, j] * (x[j] - xa[j])
                                            for j in range(n))
                    Drow = sum(Lq[i, j] * (S[j] - LTcols[j])
                               for j in range(n))
                    add_outer(Drow, e_rows[k * n + i])
                e_rows[(N - 2) * n + k] = Lr * (u - ua)
                Dru = Lr * (dudz - PTcol)
                add_outer(Dru, e_rows[(N - 2) * n + k])

            # --- state + sensitivity update ---
            x_new = []
            S_new = []
            for i in range(n):
                xi_lin = sum(An[i, j] * x[j] for j in range(n)) + Bn[i] * u
                x_new.append(xi_lin + yhat[i])
                Si = sum(An[i, j] * S[j] for j in range(n)) + Bn[i] * dudz
                for d in range(d_in):
                    Si = Si + Jg[i][d] * dxidz[d]
                S_new.append(Si)
            x = x_new
            S = S_new

        # --- terminal rows: rP = Lp (xN - xa), rT = sqrtT (xa - xs_ref) ---
        base = (N - 2) * (n + m)
        if debug_stage < 2:
            e_rows[0] = x[0] + g_acc[0:1, :]   # keep outputs live
        for i in range(n if debug_stage >= 2 else 0):
            e_rows[base + i] = sum(Lp[i, j] * (x[j] - xa[j])
                                   for j in range(n))
            Drow = sum(Lp[i, j] * (S[j] - LTcols[j]) for j in range(n))
            add_outer(Drow, e_rows[base + i])
        # rT rows (n of them): e = sqrtT*(xa_i - xs_ref_i); the Jacobian row
        # sqrtT*LAM_T[i] is CONSTANT, so its H contribution lives in Hconst
        # and only the g term is lane-dependent
        for i in range(n if debug_stage >= 2 else 0):
            e_rows[base + n + i] = sqrtT * (xa[i] - float(xs_ref[i]))
            g_acc = g_acc + 2.0 * e_rows[base + n + i] * (sqrtT * LTcols[i])
        for r in range(ne, ne_p):
            e_rows[r] = jnp.zeros((1, T), jnp.float32)

        for r in range(ne_p):
            e_out[r:r + 1, :] = (e_rows[r] if e_rows[r] is not None
                                 else jnp.zeros((1, T), jnp.float32))
        g_out[:] = g_acc
        # packed-H output is 2D (nz_p, tiles*nz_p*T): Mosaic crashed
        # preparing 3D outputs with non-unit grid-mapped leading dim
        for j in range(nz):
            H_out[:, j * T:(j + 1) * T] = Hcols[j] + Hccols[j]
        for j in range(nz, nz_p):
            H_out[:, j * T:(j + 1) * T] = jnp.broadcast_to(
                Hccols[j], (nz_p, T))

    def raw(z, dx0, windows):
        with jax.enable_x64(False):
            B0 = z.shape[0]
            pad = (-B0) % T
            f32 = jnp.float32
            z_ = z.astype(f32)
            dx_ = dx0.astype(f32)
            Xw = windows.X.astype(f32)
            Yw = windows.Y.astype(f32)
            vw = windows.valid.astype(f32)
            if pad:
                z_ = jnp.concatenate([z_, jnp.zeros((pad, nz), f32)])
                dx_ = jnp.concatenate([dx_, jnp.zeros((pad, n), f32)])
                Xw = jnp.concatenate([Xw, jnp.zeros((pad, q, d_in), f32)])
                Yw = jnp.concatenate([Yw, jnp.zeros((pad, q, d_out), f32)])
                vw = jnp.concatenate([vw, jnp.zeros((pad, q), f32)])
            Bp = B0 + pad
            z_t = jnp.zeros((nz_p, Bp), f32).at[:nz, :].set(z_.T)
            dx_t = jnp.zeros((8, Bp), f32).at[:n, :].set(dx_.T)
            # window layouts: per-dim (q_p, B) blocks stacked in sublanes
            # (2D only — Mosaic crashed on >2D blocks with non-unit leading
            # extent); q padded to 8-align the per-dim slices, padded rows
            # masked out via valid = 0
            Xw_t = jnp.zeros((d_in * q_p, Bp), f32)
            Yw_t = jnp.zeros((d_out * q_p, Bp), f32)
            for d in range(d_in):
                Xw_t = Xw_t.at[d * q_p:d * q_p + q, :].set(Xw[:, :, d].T)
            for d in range(d_out):
                Yw_t = Yw_t.at[d * q_p:d * q_p + q, :].set(Yw[:, :, d].T)
            vw_t = jnp.zeros((q_p, Bp), f32).at[:q, :].set(vw.T)
            e_t, H_pk, g_t = pl.pallas_call(
                kernel,
                grid=(Bp // T,),
                in_specs=[
                    pl.BlockSpec((nz_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d_in * q_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((d_out * q_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((q_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nz_p, 128), lambda i: (0, 0),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((ne_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nz_p, nz_p * T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((nz_p, T), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_shape=[
                    jax.ShapeDtypeStruct((ne_p, Bp), f32),
                    jax.ShapeDtypeStruct((nz_p, (Bp // T) * nz_p * T), f32),
                    jax.ShapeDtypeStruct((nz_p, Bp), f32),
                ],
                interpret=interpret,
            )(z_t, dx_t, Xw_t, Yw_t, vw_t, CONST_j)
            e = e_t[:ne, :B0].T
            g = g_t[:nz, :B0].T
            return e, H_pk, g

    raw.nz_p = nz_p
    raw.ne = ne
    raw.tile = T
    return raw
