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

from lbmpc_tpu.ops.pallas_chol import (chol_factor_solve, chol_resolve,
                                       chol_solve, factor_store_feasible)


def _build_structured_assembly(G: np.ndarray, n_b: int | None = None):
    """Returns assemble(d (B, mI)) -> M (B, nz, nz) computing G' diag(d) G
    while skipping G's structural zeros (r4 perf: the dense d @ W matmul was
    the DMS flagship's dominant cost — mI x nz^2 MACs/lane/iteration).

    Host-side row classification (exact zeros from the condensed builders,
    controllers/condensed.py):
      - rows whose support is 1 column (casadi-family input boxes): their
        contribution is diagonal — one (B, m1) @ (m1, nz) matmul;
      - rows sharing a 2-column support (the 616-row terminal block + the
        tightened first-step rows touch only {c_0, theta}): three dots per
        support pair;
      - remaining rows bucketed by max nonzero column (state rows are CAUSAL:
        x_k depends on c_0..c_{k-1} only): per-bucket dense d_c @ W_c with
        W_c truncated to the bucket's column bound.
    Measured effect (v5e): DMS N=100 assembly FLOPs x0.33, fmincon N=20
    x0.11 vs the dense W. Same math as d @ W (summation order differs only).
    """
    if n_b is None:
        import os
        n_b = int(os.environ.get("LBMPC_ASM_BUCKETS", "4"))
    mI, nz = G.shape
    supports = [np.nonzero(G[i])[0] for i in range(mI)]
    singles: list[int] = []
    pair_groups: dict[tuple, list[int]] = {}
    rest: list[int] = []
    for i, s in enumerate(supports):
        if len(s) == 1:
            singles.append(i)
        elif len(s) == 2:
            pair_groups.setdefault((int(s[0]), int(s[1])), []).append(i)
        else:
            rest.append(i)
    # bucket remaining rows by max nonzero column (`n_b` buckets, the last
    # always full-width). All contributions combine as one fused elementwise
    # sum of padded/broadcast terms — NO .at[].add slice updates (measured
    # r4: each of those read-modify-writes the whole (B, nz, nz) tensor,
    # which cost more than the matmul FLOPs they saved).
    n_b = max(1, n_b)
    step = -(-nz // n_b)
    bounds = [min((c + 1) * step, nz) for c in range(n_b)]
    buckets: list[list[int]] = [[] for _ in range(n_b)]
    for i in rest:
        hi = int(supports[i][-1]) + 1 if len(supports[i]) else 1
        for c, b in enumerate(bounds):
            if hi <= b:
                buckets[c].append(i)
                break

    sing_rows = np.asarray(singles, np.int32)
    Gsq = jnp.asarray(G[sing_rows] ** 2) if singles else None  # (m1, nz)
    eye_b = jnp.asarray(np.eye(nz, dtype=np.float32))
    pair_data = []
    for (a, b), rows in pair_groups.items():
        r = np.asarray(rows, np.int32)
        coefs = np.stack([G[r, a] * G[r, a], G[r, a] * G[r, b],
                          G[r, b] * G[r, b]], axis=1)       # (mp, 3)
        Eaa = np.zeros((nz, nz), np.float32); Eaa[a, a] = 1.0
        Eab = np.zeros((nz, nz), np.float32); Eab[a, b] = 1.0; Eab[b, a] = 1.0
        Ebb = np.zeros((nz, nz), np.float32); Ebb[b, b] = 1.0
        pair_data.append((jnp.asarray(r), jnp.asarray(coefs),
                          jnp.asarray(np.stack([Eaa, Eab, Ebb]))))
    bucket_data = []
    for c, rows in enumerate(buckets):
        if not rows:
            continue
        r = np.asarray(rows, np.int32)
        bb = bounds[c]
        Wc = (G[r][:, :bb, None] * G[r][:, None, :bb]).reshape(len(rows), bb * bb)
        bucket_data.append((bb, jnp.asarray(r), jnp.asarray(Wc)))

    def assemble(d: jax.Array) -> jax.Array:
        B = d.shape[0]
        parts = []
        for bb, r, Wc in bucket_data:
            Mc = (d[:, r] @ Wc).reshape(B, bb, bb)
            parts.append(Mc if bb == nz else
                         jnp.pad(Mc, ((0, 0), (0, nz - bb), (0, nz - bb))))
        if Gsq is not None:
            diag = d[:, sing_rows] @ Gsq                     # (B, nz)
            parts.append(diag[:, :, None] * eye_b[None])
        for r, coefs, Es in pair_data:
            dots = d[:, r] @ coefs                           # (B, 3)
            parts.append(jnp.einsum("bk,kij->bij", dots, Es))
        M = parts[0]
        for p in parts[1:]:
            M = M + p
        return M

    return assemble


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
    import os

    nz = G.shape[1]
    mI = G.shape[0]
    store_L = factor_store_feasible(nz)
    # Measured negative (r4, v5e, DMS nz=101 batch 1024): LBMPC_CHOL="xla"
    # (jnp.linalg.cholesky + triangular_solve) runs 546 ms/step vs the
    # Pallas no-store path's 54 ms — XLA:TPU's batched Cholesky is
    # loop-lowered and ~10x slower even where the unrolled per-lane kernel
    # is issue-bound. Pallas stays the default at every nz.
    chol_backend = os.environ.get("LBMPC_CHOL", "pallas")
    H32 = jnp.asarray(H, jnp.float32) if H is not None else None
    G32 = jnp.asarray(G, jnp.float32)
    assemble = _build_structured_assembly(np.asarray(G, np.float32))
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
            # structured G' diag(d) G (skips G's structural zeros) replaces
            # the dense d @ W matmul — same math, ~3-9x fewer MACs
            M = (assemble(d) + Hflat_b.reshape(-1, nz, nz)
                 + 1e-6 * jnp.eye(nz, dtype=jnp.float32)[None])
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
            if chol_backend == "xla":
                # XLA batched Cholesky + triangular solves: at large nz
                # (DMS nz=101) the per-lane unrolled Pallas factorization is
                # issue-bound (~11k sequential ops per tile) while XLA's
                # blocked batched kernels ride the MXU; measured crossover
                # recorded in the build_fused_qp_solver docstring
                Lx = jnp.linalg.cholesky(Mk)

                def xsolve(r):
                    y = jax.lax.linalg.triangular_solve(
                        Lx, r, left_side=True, lower=True)
                    return jax.lax.linalg.triangular_solve(
                        Lx, y, left_side=True, lower=True, transpose_a=True)

                L_flat = None
                u_a = xsolve(rhs_of(rc_aff) * sc)
            elif store_L:
                L_flat, u_a = chol_factor_solve(Mk, rhs_of(rc_aff) * sc,
                                                tile=tile, interpret=interpret)
            else:
                # large-nz path (DMS flagship nz_p=104): storing L busts
                # scoped VMEM at every legal tile — refactor per solve
                L_flat = None
                u_a = chol_solve(Mk, rhs_of(rc_aff) * sc, tile=tile,
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
            if chol_backend == "xla":
                dx = xsolve(rhs_c * sc) * sc
            elif store_L:
                dx = chol_resolve(L_flat, rhs_c * sc, nz, tile=tile,
                                  interpret=interpret) * sc
            else:
                dx = chol_solve(Mk, rhs_c * sc, tile=tile,
                                interpret=interpret) * sc
            if refine and store_L and jax.config.jax_enable_x64:
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
