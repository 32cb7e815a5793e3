"""Batch-level IPM with Pallas-fused KKT solves (the hybrid hot path).

`ops.ipm.solve_qp` is written per-problem and vmapped; every micro-op in its
loop becomes a separate dispatched kernel over the whole batch — measured
dispatch/HBM-bound on the remote TPU runtime. This variant restructures the
same Mehrotra iteration at batch level:

  - the KKT normal matrices for the whole batch come from ONE MXU matmul,
    M_flat = d @ W with W[k, (i,j)] = G[k,i] G[k,j] (precomputed host-side);
  - the factorization + triangular solves — the dispatch-bound tail — run in
    the fused Pallas kernels of ops/pallas_chol.py (one factor+solve for the
    predictor, one resolve for the corrector, per iteration);
  - everything else is a handful of large batched XLA ops.

float32 with HIGHEST matmul precision (same accuracy class as the vmapped f32
path — see README bench table; use ops.ipm.solve_qp_mixed for f64-refined
solutions).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from lbmpc_tpu.ops.pallas_chol import chol_factor_solve, chol_resolve


class FusedBatchSolution(NamedTuple):
    x: jax.Array          # (B, nz)
    converged: jax.Array  # (B,)
    mu: jax.Array         # (B,)
    infeasible: jax.Array # (B,) Farkas certificate of primal infeasibility
    farkas_gap: jax.Array # (B,) -h'y for the normalized dual ray y


def build_fused_qp_solver(H: np.ndarray | None, G: np.ndarray, iters: int = 20,
                          tile: int = 512, interpret: bool = False,
                          refine: bool = False, scale: bool = True,
                          d_cap: float = 1e6):
    """Returns solve(g (B, nz), h (B, mI)) -> FusedBatchSolution (H, G shared),
    plus a per-problem-Hessian variant solve.solve_with_H(H_b (B, nz, nz), g, h)
    for SQP subproblems whose Gauss-Newton Hessians differ per scenario.

    refine: safeguarded iterative-refinement pass on the corrector KKT solve
    (f64 residual, per-lane monotone acceptance). Measured net-neutral on
    accuracy: the few-percent of lanes that stall do so because the EXACT
    solution of the d-capped (1e7) Newton system is itself a poor direction
    there — the factor roundoff was acting as accidental regularization — so
    refinement helps some lanes and hurts others symmetrically while costing
    ~15%. Default off; flagged lanes should be re-solved on the vmapped path
    instead.

    scale: symmetric Jacobi equilibration of every KKT normal matrix before
    the Pallas Cholesky (solve (Dm M Dm) u = Dm r, dx = Dm u with
    Dm = diag(rsqrt(diag M))). The f32 breakdown of the IPM normal matrix is
    dominated by diagonal dynamic range — d = z/s spans [~0, d_cap] across
    constraints — and equilibration gives unit diagonal with |M_ij| <= 1
    (Cauchy-Schwarz for SPD), restoring most of the lost digits for the cost
    of two elementwise (B, nz, nz) multiplies per iteration. Default on.

    d_cap: cap on the active-constraint weights d = z/s. On-chip sweep at the
    bench operating point (scripts/sweep_fused_conv.py, batch 2048): 1e6 ->
    99.3% converged with worst-lane c0 disagreement 1.1e-2 vs the vmapped
    backend; 1e7 -> 98.1% with catastrophic 0.20 outliers; 1e8 -> 94.4%.
    The mu-stalls were conditioning-driven: cond(M) ~ d_cap * ||G||^2 must
    stay inside f32's ~2e7 after equilibration, and the EXACT solution of the
    harder-capped system is itself a poor direction (which is why f64
    iterative refinement measured net-neutral at 1e7)."""
    nz = G.shape[1]
    mI = G.shape[0]
    H32 = jnp.asarray(H, jnp.float32) if H is not None else None
    G32 = jnp.asarray(G, jnp.float32)
    W = jnp.asarray(
        (np.asarray(G, np.float32)[:, :, None] * np.asarray(G, np.float32)[:, None, :])
        .reshape(mI, nz * nz)
    )
    # Farkas purification operator: y -> y - y G (G'G)^-1 G' projects onto
    # null(G') (where every infeasibility certificate lives); precomputed in
    # f64 host-side
    G64 = np.asarray(G, np.float64)
    GtG64 = G64.T @ G64 + 1e-12 * (1.0 + np.abs(G64).max() ** 2) * np.eye(nz)
    GtGinv_Gt = jnp.asarray(np.linalg.solve(GtG64, G64.T), jnp.float32)
    G_max = float(1.0 + np.abs(G64).max())

    # NOTE: no enable_x64(False) context here — every array in _solve is an
    # explicit float32, and the iterative-refinement residual NEEDS real f64
    # (an x64-off context would silently downgrade the astype and make IR
    # diverge on the cond~1e13 late-stage KKT systems).
    @jax.jit
    def solve(g: jax.Array, h: jax.Array) -> FusedBatchSolution:
        with jax.default_matmul_precision("highest"):
            return _solve(H32.reshape(-1)[None, :], g.astype(jnp.float32),
                          h.astype(jnp.float32))

    @jax.jit
    def solve_with_H(H_b: jax.Array, g: jax.Array, h: jax.Array) -> FusedBatchSolution:
        with jax.default_matmul_precision("highest"):
            return _solve(H_b.reshape(H_b.shape[0], -1).astype(jnp.float32),
                          g.astype(jnp.float32), h.astype(jnp.float32))

    def _solve(Hflat_b, g, h):
        # the Pallas kernels run a grid of B // tile programs: pad the batch
        # to a tile multiple with benign unconstrained problems (else B < tile
        # silently computes nothing and returns garbage)
        B0 = g.shape[0]
        pad = (-B0) % tile
        if pad:
            g = jnp.concatenate([g, jnp.zeros((pad, nz), jnp.float32)])
            h = jnp.concatenate([h, jnp.ones((pad, mI), jnp.float32)])
            if Hflat_b.shape[0] != 1:
                eye_pad = jnp.broadcast_to(
                    jnp.eye(nz, dtype=jnp.float32).reshape(1, -1), (pad, nz * nz))
                Hflat_b = jnp.concatenate([Hflat_b, eye_pad])
            out = _solve_padded(Hflat_b, g, h)
            return FusedBatchSolution(*(a[:B0] for a in out))
        return _solve_padded(Hflat_b, g, h)

    def _solve_padded(Hflat_b, g, h):
        B = g.shape[0]
        x = jnp.zeros((B, nz), jnp.float32)
        s = jnp.maximum(h, 1.0)
        z = jnp.ones((B, mI), jnp.float32)
        eye_flat = jnp.eye(nz, dtype=jnp.float32).reshape(-1)
        h_scale = 1.0 + jnp.max(jnp.abs(h), axis=1)

        Hb = Hflat_b.reshape(-1, nz, nz)  # (1 or B, nz, nz)
        shared_H = Hb.shape[0] == 1

        def Hx(x):
            if shared_H:
                return x @ Hb[0].T
            return jnp.einsum("bij,bj->bi", Hb, x)

        def farkas_test(z):
            """Purified Farkas ray from the current duals (see ops/ipm.py):
            project z/|z| onto null(G'), clip >= 0, verify G'y ~ 0, h'y < 0.
            Checked in-loop because infeasible-lane f32 duals overflow to NaN
            before the final iteration — latch the certificate while finite."""
            zmax = jnp.max(z, axis=1, keepdims=True)
            y = z / jnp.maximum(zmax, 1e-25)
            y = jnp.maximum(y - (y @ G32) @ GtGinv_Gt, 0.0)
            ynorm = jnp.max(jnp.abs(y), axis=1, keepdims=True)
            y = y / jnp.maximum(ynorm, 1e-25)
            gap = -jnp.sum(h * y, axis=1)
            cert = jnp.logical_and(
                jnp.logical_and(zmax[:, 0] > 1e4, ynorm[:, 0] > 0.1),
                jnp.logical_and(
                    gap > 1e-3 * h_scale,
                    jnp.max(jnp.abs(y @ G32), axis=1) < 1e-3 * G_max,
                ),
            )
            return cert, gap

        def body(it, state):
            x, s, z, infeas, gap_lat = state
            cert, gap = farkas_test(z)
            infeas = jnp.logical_or(infeas, cert)
            gap_lat = jnp.where(cert, jnp.maximum(gap_lat, gap), gap_lat)
            rd = Hx(x) + g + z @ G32
            rp = x @ G32.T + s - h
            s_safe = jnp.maximum(s, 1e-25)
            d = jnp.minimum(z / s_safe, d_cap)
            M_flat = d @ W + Hflat_b + 1e-6 * eye_flat[None, :]
            M = M_flat.reshape(B, nz, nz)
            if scale:
                sc = jax.lax.rsqrt(
                    jnp.maximum(jnp.diagonal(M, axis1=1, axis2=2), 1e-30))
                Mk = M * (sc[:, :, None] * sc[:, None, :])
            else:
                sc = jnp.ones((B, nz), jnp.float32)
                Mk = M

            mu = jnp.sum(s * z, axis=1) / mI

            def rhs_of(rc):
                t = d * rp - rc / s_safe
                return -(rd + t @ G32)

            rc_aff = s * z
            L_flat, u_a = chol_factor_solve(Mk, rhs_of(rc_aff) * sc, tile=tile,
                                            interpret=interpret)
            dx_a = u_a * sc

            def expand(dx, rc):
                Gdx = dx @ G32.T
                dz = d * (rp + Gdx) - rc / s_safe
                ds = -rp - Gdx
                return ds, dz

            ds_a, dz_a = expand(dx_a, rc_aff)

            def steplen(v, dv, t_):
                ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), 1e9)
                return jnp.minimum(1.0, t_ * jnp.min(ratio, axis=1))

            ap = steplen(s, ds_a, 1.0)[:, None]
            ad = steplen(z, dz_a, 1.0)[:, None]
            mu_aff = jnp.sum((s + ap * ds_a) * (z + ad * dz_a), axis=1) / mI
            sigma = (mu_aff / jnp.maximum(mu, 1e-25)) ** 3
            rc = s * z + ds_a * dz_a - (sigma * mu)[:, None]
            rhs_c = rhs_of(rc)
            dx = chol_resolve(L_flat, rhs_c * sc, nz, tile=tile,
                              interpret=interpret) * sc
            if refine and jax.config.jax_enable_x64:
                # Safeguarded iterative refinement on the corrector solve.
                # Residual in f64 (f32 residuals are pure roundoff here), and
                # the correction is applied PER LANE only where it provably
                # shrinks the residual: late-stage KKT matrices reach
                # cond ~ 1e13, where cond * eps_f32 > 1 and unsafeguarded IR
                # turns the hardest lane's correction into amplified noise.
                M64 = M.astype(jnp.float64)
                dx64 = dx.astype(jnp.float64)
                rhs64 = rhs_c.astype(jnp.float64)
                resid = jnp.einsum("bij,bj->bi", M64, dx64) - rhs64
                e = chol_resolve(L_flat, (resid.astype(jnp.float32) * sc), nz,
                                 tile=tile, interpret=interpret) * sc
                resid2 = resid - jnp.einsum("bij,bj->bi", M64,
                                            e.astype(jnp.float64))
                better = (jnp.sum(resid2 * resid2, axis=1)
                          < jnp.sum(resid * resid, axis=1))
                dx = dx - jnp.where(better[:, None], e, 0.0)
            ds, dz = expand(dx, rc)
            ap = steplen(s, ds, 0.995)[:, None]
            ad = steplen(z, dz, 0.995)[:, None]
            return x + ap * dx, s + ap * ds, z + ad * dz, infeas, gap_lat

        infeas0 = jnp.zeros((B,), bool)
        x, s, z, infeasible, farkas_gap = jax.lax.fori_loop(
            0, iters, body, (x, s, z, infeas0, jnp.zeros((B,), jnp.float32)))
        cert_f, gap_f = farkas_test(jnp.nan_to_num(z, nan=0.0, posinf=1e30))
        farkas_gap = jnp.where(cert_f & ~infeasible, gap_f, farkas_gap)
        infeasible = jnp.logical_or(infeasible, cert_f)
        mu = jnp.sum(s * z, axis=1) / mI
        rp = x @ G32.T + s - h
        conv = jnp.logical_and(
            mu < 2e-4 * (1.0 + mu * mI),
            jnp.max(jnp.abs(rp), axis=1) < 2e-3 * h_scale,
        )
        infeasible = jnp.logical_and(infeasible, ~conv)
        return FusedBatchSolution(x=x, converged=conv, mu=mu,
                                  infeasible=infeasible, farkas_gap=farkas_gap)

    solve.solve_with_H = solve_with_H
    # Raw (unjitted, context-free) variant for callers that embed the solver
    # inside their own jitted scan: nested jit + enable_x64 contexts inside a
    # scan body trip XLA's lowering cache. Caller must pass f32 and set
    # default_matmul_precision("highest") at its outer jit.
    solve.raw_with_H = lambda H_b, g, h: _solve(
        H_b.reshape(H_b.shape[0], -1), g, h)
    return solve
