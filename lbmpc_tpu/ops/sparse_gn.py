"""Stage-form (sparse Riccati) LBMPC SQP subproblems for long horizons.

VERDICT r1 item 5. The condensed LBMPC SQP (controllers/lbmpc.py +
ops/ipm.py) builds O(N^2) prediction matrices; for long horizons the
TPU-right structure keeps the stage variables and factors every IPM Newton
system with a Riccati sweep — the reference analog is the lifted DMS NLP
handed to IPOPT/MUMPS (ref: examples/DMS_LBMPC_casadi.m:122-130, decision
y = [xl(0..N); x(0..N); u; theta]).

The LBMPC structure is dual-trajectory (ref: DMS_LBMPC_casadi.m:252-315):
the LEARNED trajectory xl drives the Gauss-Newton cost, the NOMINAL
trajectory x drives the safety constraints. Both depend on the same
controls, so the stage variable is w_k = [dxl_k; dx_k] in R^{2n} with
block-diagonal stage-varying dynamics

  dxl_{k+1} = Al_k dxl_k + Bl_k dc_k   (linearized learned model; the oracle
                                        Jacobian Jg_k varies by stage)
  dx_{k+1}  = An  dx_k  + B   dc_k     (nominal, An = A + B Ks; Ks = 0 for
                                        the casadi family)

and the QP solved here is the EXACT GN subproblem of the condensed SQP —
step d in z = [c_0..c_{N-1}; theta], min 1/2 d'H d + g'd s.t. G(z+d) <= h —
without ever materializing H (O(N^2 m^2)) or G (O(N^2 m rows)): every
Mehrotra Newton system runs nth+1 cross-term Riccati sweeps, with theta
eliminated by a Schur complement (the pattern of ops/sparse_ipm.py, extended
with stage-varying dynamics and x-u cross weights from the prestabilizer).

Constraint groups (masks encode both reference families — see make_stage_gn):
  gx: F_x dx_k <= hx_k,  k = 1..N       (state rows; fmincon masks out k=N)
  gu: F_u (Ks dx_k + dc_k) <= hu_k      (input rows)
  gd: F_x_d rows on dx_1                (tightened first step)
  gw: F_wN [dx_kT; theta] rows          (terminal set at stage kT)
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class StageGNQP(NamedTuple):
    """Static data of the stage-form GN subproblem (device arrays)."""

    A: jax.Array        # (n, n) nominal
    B: jax.Array        # (n, m)
    Ks: jax.Array       # (m, n) prestabilizer (zeros for casadi family)
    Qb: jax.Array       # (n, n) 2*w*Q  (w = 1 fmincon, delta casadi)
    Rb: jax.Array       # (m, m) 2*w*R
    Pb: jax.Array       # (n, n) 2*P
    TLL: jax.Array      # (nth, nth) 2*T*LAM'LAM
    LAM: jax.Array      # (n, nth)
    PSI: jax.Array      # (m, nth)
    cost_mask: jax.Array   # (N,) 1.0 where the running stage cost applies
    srow_mask: jax.Array   # (N,) 1.0 where state rows apply to x_{k+1}
    urow_mask: jax.Array   # (N,) 1.0 where input rows apply to u_k
    F_x: jax.Array
    h_x: jax.Array
    F_u: jax.Array
    h_u: jax.Array
    F_d: jax.Array      # tightened rows at x_1 ((0, n) if unused)
    h_d: jax.Array
    Fw_x: jax.Array
    Fw_th: jax.Array
    h_w: jax.Array
    N: int
    kT: int             # terminal-set stage (on x_kT)


def make_stage_gn(A, B, Ks, Q, R, P, T, LAMBDA, PSI, cs, N, delta,
                  family="fmincon", terminal_at="first",
                  tighten_first_step=True) -> StageGNQP:
    """Stage data matching build_fmincon_lmpc / build_casadi_dms semantics
    (controllers/condensed.py:61-277) — including the reference quirks:
    fmincon runs cost stages 0..N-3, state rows x_1..x_{N-1}, input rows
    u_0..u_{N-2}, terminal at x_{N-1} ('last') or x_1 ('first'); casadi runs
    delta-scaled cost on all stages, state rows x_1..x_N, input rows all,
    terminal at x_1 or x_N."""
    A = np.asarray(A, float)
    B = np.asarray(B, float)
    n, m = B.shape
    Ks_ = (np.atleast_2d(np.asarray(Ks, float)) if family == "fmincon"
           else np.zeros((m, n)))
    LAM = np.atleast_2d(np.asarray(LAMBDA, float))
    PSI_ = np.atleast_2d(np.asarray(PSI, float))
    wgt = 1.0 if family == "fmincon" else float(delta)
    cost_mask = np.zeros(N)
    srow_mask = np.zeros(N)
    urow_mask = np.zeros(N)
    if family == "fmincon":
        cost_mask[: max(N - 2, 0)] = 1.0
        srow_mask[: N - 1] = 1.0       # x_1..x_{N-1}
        urow_mask[: N - 1] = 1.0       # u_0..u_{N-2}
        kT = 1 if terminal_at == "first" else N - 1
    else:
        cost_mask[:] = 1.0
        srow_mask[:] = 1.0             # x_1..x_N
        urow_mask[:] = 1.0
        kT = 1 if terminal_at == "first" else N
    use_d = tighten_first_step and getattr(cs, "F_x_d", None) is not None
    F_d = np.asarray(cs.F_x_d, float) if use_d else np.zeros((0, n))
    h_d = np.asarray(cs.h_x_d, float) if use_d else np.zeros((0,))
    return StageGNQP(
        A=jnp.asarray(A), B=jnp.asarray(B), Ks=jnp.asarray(Ks_),
        Qb=jnp.asarray(2.0 * wgt * np.asarray(Q, float)),
        Rb=jnp.asarray(2.0 * wgt * np.asarray(R, float)),
        Pb=jnp.asarray(2.0 * np.asarray(P, float)),
        TLL=jnp.asarray(2.0 * float(T) * LAM.T @ LAM),
        LAM=jnp.asarray(LAM), PSI=jnp.asarray(PSI_),
        cost_mask=jnp.asarray(cost_mask), srow_mask=jnp.asarray(srow_mask),
        urow_mask=jnp.asarray(urow_mask),
        F_x=jnp.asarray(np.asarray(cs.F_x, float)),
        h_x=jnp.asarray(np.asarray(cs.h_x, float)),
        F_u=jnp.asarray(np.asarray(cs.F_u, float)),
        h_u=jnp.asarray(np.asarray(cs.h_u, float)),
        F_d=jnp.asarray(F_d), h_d=jnp.asarray(h_d),
        Fw_x=jnp.asarray(np.asarray(cs.F_w_N[:, :n], float)),
        Fw_th=jnp.asarray(np.asarray(cs.F_w_N[:, n:], float)),
        h_w=jnp.asarray(np.asarray(cs.h_w_N, float)),
        N=N, kT=kT,
    )


_UNROLL = 8  # scan unrolling: fewer, larger loop bodies (issue-bound sweeps)


def _riccati_factor(As, Bs, Qs, Ss, Rs, PN):
    """Backward quadratic sweep ONCE per IPM iteration (round-3 perf
    restructure): the value Hessian recursion depends only on
    (A, B, Q, S, R, PN) — shared by the predictor, the corrector, and every
    theta coupling column — so it is factored out and its per-stage
    artifacts stored. Returns stacks consumed by _riccati_solve:
      Kg  (N, m, nw)   feedback gains
      Acl (N, nw, nw)  closed-loop dynamics
      W12 (N, nw, m)   S + K'R + Acl'V B   (linear-pass coupling)
      Swi (N, m, m)    (R + B'V B)^-1
    """
    def backward(V, inp):
        Ak, Bk, Qk, Sk, Rk = inp
        BtV = Bk.T @ V
        Sw = Rk + BtV @ Bk
        M = Sk.T + BtV @ Ak
        if Sw.shape[-1] == 1:
            Swi = 1.0 / Sw
            K = -M * Swi[0, 0]
        else:
            Swi = jnp.linalg.inv(Sw)
            K = -Swi @ M
        Acl = Ak + Bk @ K
        V1 = Qk + K.T @ Rk @ K + K.T @ Sk.T + Sk @ K + Acl.T @ V @ Acl
        W12 = Sk + K.T @ Rk + Acl.T @ (V @ Bk)
        return V1, (K, Acl, W12, Swi)

    rev = jax.tree.map(lambda a: a[::-1], (As, Bs, Qs, Ss, Rs))
    _, (Kg, Acl, W12, Swi) = jax.lax.scan(backward, PN, rev, unroll=_UNROLL)
    return jax.tree.map(lambda a: a[::-1], (Kg, Acl, W12, Swi))


def _riccati_solve(factor, As, Bs, qs, rs, pN):
    """Linear backward + forward rollout against a stored factor.

    Exactly the affine part of the classic sweep: with v_{k+1} the carry,
      kf_k = -Swi_k (B_k' v_{k+1} + r_k)
      v_k  = q_k + K_k' r_k + W12_k kf_k + Acl_k' v_{k+1}
    then the forward rollout c_k = K_k w_k + kf_k. Returns (W (N+1, nw),
    C (N, m)) — identical (exact arithmetic) to the old fused quadratic
    sweep, at ~1/3 of its per-stage matmul work."""
    Kg, Acl, W12, Swi = factor
    nw = As.shape[-1]

    def backward(v, inp):
        K, Ac, W12k, Swik, Bk, qk, rk = inp
        if Swik.shape[-1] == 1:
            kf = -(Bk.T @ v + rk) * Swik[0, 0]
        else:
            kf = -(Swik @ (Bk.T @ v + rk))
        v1 = qk + K.T @ rk + W12k @ kf + Ac.T @ v
        return v1, kf

    rev = jax.tree.map(lambda a: a[::-1],
                       (Kg, Acl, W12, Swi, Bs, qs, rs))
    _, kfs = jax.lax.scan(backward, pN, rev, unroll=_UNROLL)
    kfs = kfs[::-1]

    def forward(w, inp):
        Ak, Bk, K, kf = inp
        c = K @ w + kf
        return Ak @ w + Bk @ c, (w, c)

    wN, (W, C) = jax.lax.scan(
        forward, jnp.zeros((nw,), As.dtype), (As, Bs, Kg, kfs),
        unroll=_UNROLL)
    return jnp.concatenate([W, wN[None]]), C


def _riccati_cross(As, Bs, Qs, Ss, Rs, qs, rs, PN, pN):
    """LQ with stage-varying dynamics, x-u cross terms, and w_0 = 0:

      min sum_k 1/2 w_k'Q_k w_k + w_k'S_k c_k + 1/2 c_k'R_k c_k
              + q_k'w_k + r_k'c_k  +  1/2 w_N'PN w_N + pN'w_N
      s.t. w_{k+1} = A_k w_k + B_k c_k,  w_0 = 0.

    Returns (W (N+1, nw), C (N, m)). Single-shot convenience wrapper over
    the factor/solve split (the IPM loop below calls them separately to
    amortize the quadratic sweep across its 2 + nth right-hand sides).
    The associative-scan variant covers the cross-free case only; this path
    is guarded against the batch regime that crashed the worker — see
    runtime/scenario.py notes."""
    factor = _riccati_factor(As, Bs, Qs, Ss, Rs, PN)
    return _riccati_solve(factor, As, Bs, qs, rs, pN)


class SparseGNSolution(NamedTuple):
    dC: jax.Array       # (N, m) control step
    dth: jax.Array      # (nth,) theta step
    mu: jax.Array
    max_violation: jax.Array
    converged: jax.Array


def solve_sparse_gn(qp: StageGNQP, Als, Bls, q_xl, r_c, g_th,
                    hx_t, hu_t, hd_t, hw_t,
                    iters: int = 25, tau: float = 0.995, mesh=None):
    """Solve one GN subproblem in step variables d = (dC stages, dtheta).

    Inputs from the SQP wrapper (all in delta/step space around z_bar):
      Als, Bls   (N, n, n), (N, n, m): linearized learned stage dynamics
      q_xl       (N+1, n): GN linear term on dxl_k (= 2 J' e stage rows)
      r_c        (N, m):   GN linear term on dc_k
      g_th       (nth,):   GN linear term on dtheta
      hx_t (N, mx), hu_t (N, mu), hd_t (md,), hw_t (mw,): per-group rhs
        h - F(rollout at z_bar) — the slack the current iterate leaves.

    mesh: a jax.sharding Mesh with a 'stage' axis — the Riccati sweeps then
    run STAGE-SHARDED over the mesh (ops/riccati_sharded, "SP"): theta
    columns + predictor share one distributed multi-RHS sweep, the corrector
    a second. Equality vs mesh=None is pinned at N=300 in
    tests/test_sparse_gn.py (VERDICT r3 item 4).

    HIGHEST matmul precision for the same reason as ops/ipm.py:72-77."""
    with jax.default_matmul_precision("highest"):
        return _solve_sparse_gn(qp, Als, Bls, q_xl, r_c, g_th,
                                hx_t, hu_t, hd_t, hw_t, qp.N, qp.kT,
                                iters, tau, mesh)


@functools.partial(jax.jit, static_argnames=("N", "kT", "iters", "mesh"))
def _solve_sparse_gn(qp, Als, Bls, q_xl, r_c, g_th, hx_t, hu_t, hd_t, hw_t,
                     N, kT, iters, tau, mesh=None):
    n = qp.A.shape[0]
    m = qp.B.shape[1]
    nth = qp.LAM.shape[1]
    nw = 2 * n
    dtype = Als.dtype
    mx = qp.h_x.shape[0]
    mu_r = qp.h_u.shape[0]
    md = qp.h_d.shape[0]
    mw = qp.h_w.shape[0]
    msk_x = qp.srow_mask            # (N,) over x_1..x_N
    msk_u = qp.urow_mask
    m_total = (float(mx) * jnp.sum(msk_x) + float(mu_r) * jnp.sum(msk_u)
               + float(md + mw))
    tiny = float(jnp.finfo(dtype).tiny) * 1e8
    d_cap = 1e30 if dtype == jnp.float64 else 1e7
    tol_eff = (30.0 * float(jnp.finfo(dtype).eps)
               if dtype == jnp.float64 else 1e-5)

    An = qp.A + qp.B @ qp.Ks
    As = jnp.zeros((N, nw, nw), dtype)
    As = As.at[:, :n, :n].set(Als)
    As = As.at[:, n:, n:].set(jnp.broadcast_to(An, (N, n, n)))
    Bs = jnp.zeros((N, nw, m), dtype)
    Bs = Bs.at[:, :n, :].set(Bls)
    Bs = Bs.at[:, n:, :].set(jnp.broadcast_to(qp.B, (N, n, m)))

    KsR = qp.Ks.T @ qp.Rb                      # (n, m)
    Qeff = qp.Qb + KsR @ qp.Ks                 # learned-block stage Hessian
    cost_m = qp.cost_mask
    # cost theta-couplings
    CwL = -(qp.Qb @ qp.LAM + KsR @ qp.PSI)     # (n, nth) learned block
    CcL = -qp.Rb @ qp.PSI                      # (m, nth)
    CwN = -qp.Pb @ qp.LAM
    n_cost = jnp.sum(cost_m)
    Hth_cost = (qp.TLL
                + n_cost * (qp.LAM.T @ qp.Qb @ qp.LAM
                            + qp.PSI.T @ qp.Rb @ qp.PSI)
                + qp.LAM.T @ qp.Pb @ qp.LAM)

    W = jnp.zeros((N + 1, nw), dtype)
    C = jnp.zeros((N, m), dtype)
    th = jnp.zeros((nth,), dtype)

    def ineq(W, C, th):
        dx = W[1:, n:]                                   # x_1..x_N
        gx = dx @ qp.F_x.T - hx_t
        du = C + W[:N, n:] @ qp.Ks.T
        gu = du @ qp.F_u.T - hu_t
        gd = qp.F_d @ W[1, n:] - hd_t
        gw = qp.Fw_x @ W[kT, n:] + qp.Fw_th @ th - hw_t
        return gx, gu, gd, gw

    gx0, gu0, gd0, gw0 = ineq(W, C, th)
    sx, su, sd, sw = (jnp.maximum(-g, 1.0) for g in (gx0, gu0, gd0, gw0))
    zx, zu, zd, zw = (jnp.ones_like(s) for s in (sx, su, sd, sw))

    def body(it, state):
        W, C, th, sx, su, sd, sw, zx, zu, zd, zw, frozen = state
        gx, gu, gd, gw = ineq(W, C, th)
        sx_s = jnp.maximum(sx, tiny)
        su_s = jnp.maximum(su, tiny)
        sd_s = jnp.maximum(sd, tiny)
        sw_s = jnp.maximum(sw, tiny)
        Dx = jnp.minimum(zx / sx_s, d_cap) * msk_x[:, None]
        Du = jnp.minimum(zu / su_s, d_cap) * msk_u[:, None]
        Dd = jnp.minimum(zd / sd_s, d_cap)
        Dw = jnp.minimum(zw / sw_s, d_cap)
        mu = (jnp.sum(sx * zx * msk_x[:, None])
              + jnp.sum(su * zu * msk_u[:, None])
              + jnp.sum(sd * zd) + jnp.sum(sw * zw)) / m_total

        # ---- stage Hessian blocks: cost + barrier D-terms ----
        Qs = jnp.zeros((N, nw, nw), dtype)
        Qs = Qs.at[:, :n, :n].add(cost_m[:, None, None] * Qeff)
        # state rows for x_k live on stage k (k = 1..N-1); x_N rows -> PN
        FxD = jnp.einsum("ki,nk,kj->nij", qp.F_x, Dx[: N - 1], qp.F_x)
        Qs = Qs.at[1:, n:, n:].add(FxD)
        FuD = jnp.einsum("ki,nk,kj->nij", qp.F_u, Du, qp.F_u)   # (N, m, m)
        Qs = Qs.at[:, n:, n:].add(
            jnp.einsum("ji,njk,kl->nil", qp.Ks, FuD, qp.Ks))
        Qs = Qs.at[1, n:, n:].add(qp.F_d.T @ (Dd[:, None] * qp.F_d))
        TwD = qp.Fw_x.T @ (Dw[:, None] * qp.Fw_x)
        if kT < N:
            Qs = Qs.at[kT, n:, n:].add(TwD)
        Ss = jnp.zeros((N, nw, m), dtype)
        Ss = Ss.at[:, :n, :].add(cost_m[:, None, None] * KsR)
        Ss = Ss.at[:, n:, :].add(jnp.einsum("ji,njk->nik", qp.Ks, FuD))
        Rs = (cost_m[:, None, None] * qp.Rb + FuD
              + 1e-9 * jnp.eye(m, dtype=dtype))
        PN = jnp.zeros((nw, nw), dtype).at[:n, :n].set(qp.Pb)
        if kT == N:
            PN = PN.at[n:, n:].add(TwD)
        # x_N state rows (casadi family; msk makes this a no-op for fmincon)
        PN = PN.at[n:, n:].add(qp.F_x.T @ (Dx[N - 1][:, None] * qp.F_x))

        Hth_eff = Hth_cost + qp.Fw_th.T @ (Dw[:, None] * qp.Fw_th)
        CwT_eff = qp.Fw_x.T @ (Dw[:, None] * qp.Fw_th)   # (n, nth) on dx_kT

        # ONE quadratic backward sweep per iteration; the nth + 2 right-hand
        # sides (theta columns, predictor, corrector) reuse its factor
        # through the cheap linear sweeps (round-3 restructure — the
        # quadratic sweep was ~3x the sequential matmul depth).
        # mesh != None ("SP"): the sweeps instead run stage-sharded over the
        # mesh as distributed multi-RHS element scans (ops/riccati_sharded).
        factor = (None if mesh is not None
                  else _riccati_factor(As, Bs, Qs, Ss, Rs, PN))

        def rsolve_multi(rhs_list):
            """[(qw, rc, pN), ...] -> [(W, C), ...]."""
            if mesh is None:
                return [_riccati_solve(factor, As, Bs, qw, rc, pN)
                        for (qw, rc, pN) in rhs_list]
            from lbmpc_tpu.ops.riccati_sharded import lqr_cross_sharded

            qs = jnp.stack([r[0][:N] for r in rhs_list], axis=-1)
            rcs = jnp.stack([r[1] for r in rhs_list], axis=-1)
            pNs = jnp.stack([r[2] for r in rhs_list], axis=-1)
            W, C = lqr_cross_sharded(mesh, As, Bs, Qs, Ss, Rs, qs, rcs,
                                     PN, pNs)
            return [(W[..., k], C[..., k]) for k in range(len(rhs_list))]

        # ---- theta coupling columns (shared by predictor + corrector) ----
        def theta_rhs(i):
            e = jnp.zeros((nth,), dtype).at[i].set(1.0)
            qw = jnp.zeros((N, nw), dtype)
            qw = qw.at[:, :n].add(cost_m[:, None] * (CwL @ e)[None, :])
            pN = jnp.zeros((nw,), dtype).at[:n].set(CwN @ e)
            if kT < N:
                qw = qw.at[kT, n:].add(CwT_eff @ e)
            else:
                pN = pN.at[n:].add(CwT_eff @ e)
            # CcL applies at cost stages only (the tail stages of the
            # fmincon family carry no running cost)
            rc = cost_m[:, None] * (CcL @ e)[None, :]
            return qw, rc, pN

        cols = rsolve_multi([theta_rhs(i) for i in range(nth)])

        def coupling_step(Ws, Cs):
            """theta-row of the AUGMENTED system (cost + barrier couplings)
            applied to a primal step direction — builds Smat / its rhs."""
            acc = jnp.einsum("ni,ij->j", Ws[:N, :n] * cost_m[:, None], CwL)
            acc = acc + CwN.T @ Ws[N, :n]
            acc = acc + jnp.einsum("ni,ij->j", Cs * cost_m[:, None], CcL)
            acc = acc + CwT_eff.T @ Ws[kT, n:]
            return acc

        def coupling_cost(Ws, Cs):
            """Cost-only theta coupling at the current ITERATE (the barrier
            forces on the iterate are carried by the duals zw, not by D)."""
            acc = jnp.einsum("ni,ij->j", Ws[:N, :n] * cost_m[:, None], CwL)
            acc = acc + CwN.T @ Ws[N, :n]
            acc = acc + jnp.einsum("ni,ij->j", Cs * cost_m[:, None], CcL)
            return acc

        Smat = Hth_eff + jnp.stack(
            [coupling_step(*cols[i]) for i in range(nth)], axis=1)

        # ---- dual-feasibility residuals at the current iterate ----
        # COST-only Hessian products (the D-terms act on the STEP, their
        # iterate forces are the F'z dual terms — same split as
        # ops/sparse_ipm.py grads()/newton())
        zx_m = zx * msk_x[:, None]
        zu_m = zu * msk_u[:, None]
        wl = W[:N, :n]
        gW = jnp.zeros((N, nw), dtype)
        gW = gW.at[:, :n].add(
            cost_m[:, None] * (wl @ Qeff.T + C @ KsR.T + (CwL @ th)[None, :])
            + q_xl[:N])
        gW = gW.at[1:, n:].add(zx_m[: N - 1] @ qp.F_x)
        gW = gW.at[:, n:].add((zu_m @ qp.F_u) @ qp.Ks)
        gW = gW.at[1, n:].add(zd @ qp.F_d)
        gC = cost_m[:, None] * (wl @ KsR + C @ qp.Rb.T + (CcL @ th)[None, :]) \
            + r_c + zu_m @ qp.F_u
        gWN = jnp.zeros((nw,), dtype)
        gWN = gWN.at[:n].add(qp.Pb @ W[N, :n] + CwN @ th + q_xl[N])
        gWN = gWN.at[n:].add(zx_m[N - 1] @ qp.F_x)
        tw = qp.Fw_x.T @ zw
        if kT < N:
            gW = gW.at[kT, n:].add(tw)
        else:
            gWN = gWN.at[n:].add(tw)
        rth = Hth_cost @ th + g_th + coupling_cost(W, C) + qp.Fw_th.T @ zw

        def newton_rhs(rcx, rcu, rcd, rcw):
            elim_x = (Dx * (gx + sx) - rcx / sx_s) * msk_x[:, None]
            elim_u = (Du * (gu + su) - rcu / su_s) * msk_u[:, None]
            elim_d = Dd * (gd + sd) - rcd / sd_s
            elim_w = Dw * (gw + sw) - rcw / sw_s
            ax = elim_x @ qp.F_x                # (N, n) rows for x_1..x_N
            au_c = elim_u @ qp.F_u              # (N, m)
            au_x = au_c @ qp.Ks                 # (N, n)
            ad = qp.F_d.T @ elim_d              # (n,)
            awx = qp.Fw_x.T @ elim_w            # (n,)
            awth = qp.Fw_th.T @ elim_w          # (nth,)

            qw = gW
            qw = qw.at[1:, n:].add(ax[: N - 1])
            qw = qw.at[:, n:].add(au_x)
            qw = qw.at[1, n:].add(ad)
            pN_r = gWN
            pN_r = pN_r.at[n:].add(ax[N - 1])
            if kT < N:
                qw = qw.at[kT, n:].add(awx)
            else:
                pN_r = pN_r.at[n:].add(awx)
            rc_r = gC + au_c
            return (qw, rc_r, pN_r), awth

        def newton_finish(W0, C0, awth, rcx, rcu, rcd, rcw):
            rhs_th = -(rth + awth) - coupling_step(W0, C0)
            dth = jnp.linalg.solve(Smat, rhs_th)
            dW = W0 + sum(dth[i] * cols[i][0] for i in range(nth))
            dC = C0 + sum(dth[i] * cols[i][1] for i in range(nth))

            dgx = dW[1:, n:] @ qp.F_x.T
            dgu = (dC + dW[:N, n:] @ qp.Ks.T) @ qp.F_u.T
            dgd = qp.F_d @ dW[1, n:]
            dgw = qp.Fw_x @ dW[kT, n:] + qp.Fw_th @ dth
            dzx = (Dx * ((gx + sx) + dgx) - rcx / sx_s) * msk_x[:, None]
            dzu = (Du * ((gu + su) + dgu) - rcu / su_s) * msk_u[:, None]
            dzd = Dd * ((gd + sd) + dgd) - rcd / sd_s
            dzw = Dw * ((gw + sw) + dgw) - rcw / sw_s
            dsx = (-(gx + sx) - dgx) * msk_x[:, None]
            dsu = (-(gu + su) - dgu) * msk_u[:, None]
            dsd = -(gd + sd) - dgd
            dsw = -(gw + sw) - dgw
            return dW, dC, dth, dsx, dsu, dsd, dsw, dzx, dzu, dzd, dzw

        def steplen(pairs, t_):
            a = jnp.asarray(1.0, dtype)
            for v, dv in pairs:
                if v.shape[0] == 0:
                    # empty constraint group (e.g. no tightened first-step
                    # rows when tighten_first_step=False): no step limit
                    continue
                r = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
                a = jnp.minimum(a, t_ * jnp.min(r))
            return a

        def newton(rcx, rcu, rcd, rcw):
            rhs, awth = newton_rhs(rcx, rcu, rcd, rcw)
            (W0, C0), = rsolve_multi([rhs])
            return newton_finish(W0, C0, awth, rcx, rcu, rcd, rcw)

        # predictor
        pred = newton(sx * zx, su * zu, sd * zd, sw * zw)
        dsxa, dsua, dsda, dswa = pred[3:7]
        dzxa, dzua, dzda, dzwa = pred[7:11]
        ap = steplen([(sx.ravel(), dsxa.ravel()), (su.ravel(), dsua.ravel()),
                      (sd, dsda), (sw, dswa)], 1.0)
        ad_ = steplen([(zx.ravel(), dzxa.ravel()), (zu.ravel(), dzua.ravel()),
                       (zd, dzda), (zw, dzwa)], 1.0)
        mu_aff = (jnp.sum((sx + ap * dsxa) * (zx + ad_ * dzxa) * msk_x[:, None])
                  + jnp.sum((su + ap * dsua) * (zu + ad_ * dzua) * msk_u[:, None])
                  + jnp.sum((sd + ap * dsda) * (zd + ad_ * dzda))
                  + jnp.sum((sw + ap * dswa) * (zw + ad_ * dzwa))) / m_total
        sigma = (mu_aff / jnp.maximum(mu, tiny)) ** 3
        # corrector
        corr = newton(sx * zx + dsxa * dzxa - sigma * mu,
                      su * zu + dsua * dzua - sigma * mu,
                      sd * zd + dsda * dzda - sigma * mu,
                      sw * zw + dswa * dzwa - sigma * mu)
        dW, dC, dth = corr[0], corr[1], corr[2]
        dsx, dsu, dsd, dsw = corr[3:7]
        dzx, dzu, dzd, dzw = corr[7:11]
        ap = steplen([(sx.ravel(), dsx.ravel()), (su.ravel(), dsu.ravel()),
                      (sd, dsd), (sw, dsw)], tau)
        ad_ = steplen([(zx.ravel(), dzx.ravel()), (zu.ravel(), dzu.ravel()),
                       (zd, dzd), (zw, dzw)], tau)
        viol = jnp.maximum(
            jnp.max(gx * msk_x[:, None], initial=-jnp.inf),
            jnp.maximum(jnp.max(gu * msk_u[:, None], initial=-jnp.inf),
                        jnp.maximum(jnp.max(gd, initial=-jnp.inf),
                                    jnp.max(gw, initial=-jnp.inf))))
        done = jnp.logical_and(mu < tol_eff, viol < tol_eff)
        frozen_new = jnp.logical_or(frozen, done)
        keep = lambda new, old: jnp.where(frozen, old, new)
        return (
            keep(W + ap * dW, W), keep(C + ap * dC, C), keep(th + ap * dth, th),
            keep(sx + ap * dsx, sx), keep(su + ap * dsu, su),
            keep(sd + ap * dsd, sd), keep(sw + ap * dsw, sw),
            keep(zx + ad_ * dzx, zx), keep(zu + ad_ * dzu, zu),
            keep(zd + ad_ * dzd, zd), keep(zw + ad_ * dzw, zw),
            frozen_new,
        )

    state = (W, C, th, sx, su, sd, sw, zx, zu, zd, zw, jnp.asarray(False))
    state = jax.lax.fori_loop(0, iters, body, state)
    W, C, th = state[0], state[1], state[2]
    sx, su, sd, sw = state[3:7]
    zx, zu, zd, zw = state[7:11]
    mu = (jnp.sum(sx * zx * msk_x[:, None]) + jnp.sum(su * zu * msk_u[:, None])
          + jnp.sum(sd * zd) + jnp.sum(sw * zw)) / m_total
    gx, gu, gd, gw = ineq(W, C, th)
    viol = jnp.maximum(
        jnp.max(gx * msk_x[:, None], initial=-jnp.inf),
        jnp.maximum(jnp.max(gu * msk_u[:, None], initial=-jnp.inf),
                    jnp.maximum(jnp.max(gd, initial=-jnp.inf),
                                jnp.max(gw, initial=-jnp.inf))))
    conv_tol = 1e-7 if dtype == jnp.float64 else 2e-4
    return SparseGNSolution(
        dC=C, dth=th, mu=mu, max_violation=viol,
        converged=jnp.logical_and(mu < conv_tol, viol < conv_tol),
    )
