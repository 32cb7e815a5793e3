"""Sparse-path IPM: interior point on the stage-wise (DMS) OCP form with
Riccati factorization of the block-banded KKT systems.

The condensed QP (controllers/condensed.py) eliminates states up front — ideal
for short horizons. For long horizons the TPU-right structure keeps the stage
variables and factors each IPM Newton system by a Riccati recursion instead of
a generic sparse LU (what IPOPT/MUMPS did for the reference's lifted NLPs,
ref: examples/DMS_LBMPC_casadi.m:130) — BASELINE.json's "block-banded KKT /
horizon-stage Riccati-style factorization". Swap `_riccati_solve`'s scan for
`ops.riccati.lqr_parallel`'s associative scan for O(log N) depth.

Problem (delta coordinates, CasADi-family tracking semantics):

  min  sum_{k=0}^{N-1} delta*[(x_k-L th)'Q(x_k-L th) + (u_k-S th)'R(u_k-S th)]
       + (x_N-L th)'P(x_N-L th) + th'L'T L th
  s.t. x_{k+1} = A x_k + B u_k,  x_0 fixed,
       F_x x_k <= h_x (k=1..N),  F_u u_k <= h_u (k=0..N-1),
       F_wN [x_N; th] <= h_wN.

theta couples all stages; each Newton system is solved by a Schur complement
on theta: nth+1 Riccati sweeps whose coupling columns are shared between the
Mehrotra predictor and corrector.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

_EPS = 1e-300


class StageQP(NamedTuple):
    """Static OCP data (device arrays); weights pre-doubled so they are the
    exact Hessian blocks."""

    A: jax.Array
    B: jax.Array
    Qb: jax.Array     # 2*delta*Q
    Rb: jax.Array     # 2*delta*R
    Pb: jax.Array     # 2*P
    Tb: jax.Array     # 2*LAM' T LAM
    LAM: jax.Array
    PSI: jax.Array
    F_x: jax.Array
    h_x: jax.Array
    F_u: jax.Array
    h_u: jax.Array
    Fw_x: jax.Array
    Fw_th: jax.Array
    h_w: jax.Array
    N: int


def make_stage_qp(A, B, Q, R, P, T, LAMBDA, PSI, cs, N, delta) -> StageQP:
    LAM = np.atleast_2d(np.asarray(LAMBDA, float))
    PSI_ = np.atleast_2d(np.asarray(PSI, float))
    n = A.shape[0]
    return StageQP(
        A=jnp.asarray(A), B=jnp.asarray(B),
        Qb=jnp.asarray(2.0 * delta * np.asarray(Q, float)),
        Rb=jnp.asarray(2.0 * delta * np.asarray(R, float)),
        Pb=jnp.asarray(2.0 * np.asarray(P, float)),
        Tb=jnp.asarray(2.0 * float(T) * LAM.T @ LAM),
        LAM=jnp.asarray(LAM), PSI=jnp.asarray(PSI_),
        F_x=jnp.asarray(cs.F_x), h_x=jnp.asarray(cs.h_x),
        F_u=jnp.asarray(cs.F_u), h_u=jnp.asarray(cs.h_u),
        Fw_x=jnp.asarray(cs.F_w_N[:, :n]), Fw_th=jnp.asarray(cs.F_w_N[:, n:]),
        h_w=jnp.asarray(cs.h_w_N),
        N=N,
    )


# NO scan unrolling here (sparse_gn uses 8): with this module's broadcast
# stage weights, unroll>1 makes XLA:TPU's fusion emitter crash compiling the
# vmapped program ("Check failed: window.pad_low[i] == 0 (-96 vs. 0)",
# measured 2026-08-21 at N=100 batch 256); the factor/solve split alone
# carries the speedup.
_UNROLL = 1


def _riccati_factor(A, B, Qx, Ru, PN):
    """Backward quadratic sweep ONCE per IPM iteration (round-3 perf
    restructure — see ops/sparse_gn.py:_riccati_factor): the value Hessian
    recursion depends only on (Qx, Ru, PN), shared by the theta columns,
    predictor, and corrector. Returns stacks (K, Acl, W12, Si) for
    _riccati_apply, with W12 = K'Ru + Acl'V B and Si = (Ru + B'V B)^-1."""
    def backward(V, inp):
        Qk, Rk = inp
        BtV = B.T @ V
        S = Rk + BtV @ B
        if S.shape[-1] == 1:
            Si = 1.0 / S
            K = -(BtV @ A) * Si[0, 0]
        else:
            Si = jnp.linalg.inv(S)
            K = -(Si @ (BtV @ A))
        Acl = A + B @ K
        V1 = Qk + K.T @ Rk @ K + Acl.T @ V @ Acl
        W12 = K.T @ Rk + Acl.T @ (V @ B)
        return V1, (K, Acl, W12, Si)

    rev = jax.tree.map(lambda a: a[::-1], (Qx, Ru))
    _, out = jax.lax.scan(backward, PN, rev, unroll=_UNROLL)
    return jax.tree.map(lambda a: a[::-1], out)


def _riccati_apply(factor, A, B, qx, ru, pN):
    """Linear backward + forward rollout against a stored factor: exactly
    the affine part of the classic sweep (kf = -Si (B'v + r),
    v1 = q + K'r + W12 kf + Acl'v), identical in exact arithmetic to the
    fused quadratic sweep at ~1/3 of its per-stage matmul work."""
    K, Acl, W12, Si = factor
    n = A.shape[0]

    def backward(v, inp):
        Kk, Ak, Wk, Sik, qk, rk = inp
        if Sik.shape[-1] == 1:
            kf = -(B.T @ v + rk) * Sik[0, 0]
        else:
            kf = -(Sik @ (B.T @ v + rk))
        v1 = qk + Kk.T @ rk + Wk @ kf + Ak.T @ v
        return v1, kf

    rev = jax.tree.map(lambda a: a[::-1], (K, Acl, W12, Si, qx, ru))
    _, kfs = jax.lax.scan(backward, pN, rev, unroll=_UNROLL)
    kfs = kfs[::-1]

    def forward(x, inp):
        Kk, kf = inp
        u = Kk @ x + kf
        return A @ x + B @ u, (x, u)

    xN, (X, U) = jax.lax.scan(forward, jnp.zeros((n,), A.dtype), (K, kfs),
                              unroll=_UNROLL)
    return jnp.concatenate([X, xN[None]]), U


def _riccati_solve(A, B, Qx, qx, Ru, ru, PN, pN, parallel: bool = False):
    """Equality-constrained LQ with stage-varying weights and dx_0 = 0:
    min sum_k 1/2 x'Qx_k x + qx_k'x + 1/2 u'Ru_k u + ru_k'u
        + 1/2 x_N'PN x_N + pN'x_N,   x_{k+1} = A x_k + B u_k.
    Returns (X (N+1, n), U (N, m)). parallel=True routes through the
    associative-scan factorization (ops/riccati.lqr_parallel, O(log N) depth)."""
    if parallel:
        from lbmpc_tpu.ops.riccati import lqr_parallel

        n = A.shape[0]
        sol = lqr_parallel(A, B, Qx, Ru, PN, jnp.zeros((n,), A.dtype),
                           q=qx, r=ru, p=pN)
        return sol.X, sol.U

    factor = _riccati_factor(A, B, Qx, Ru, PN)
    return _riccati_apply(factor, A, B, qx, ru, pN)


class SparseIPMSolution(NamedTuple):
    X: jax.Array
    U: jax.Array
    theta: jax.Array
    mu: jax.Array
    max_violation: jax.Array
    converged: jax.Array


def solve_sparse(qp: StageQP, x0: jax.Array, iters: int = 25, tau: float = 0.995,
                 parallel: bool = False):
    """Mehrotra predictor-corrector on the stage form (see module docstring).

    parallel=True uses the associative-scan Riccati (O(log N) depth per KKT
    solve) — identical math, horizon-parallel execution.

    HIGHEST matmul precision for the same reason as ops/ipm.py:72-77: the
    TPU's default bf16-pass f32 matmuls stall the IPM around 1e-3."""
    with jax.default_matmul_precision("highest"):
        return _solve_sparse(qp, x0, qp.N, iters, tau, parallel)


@functools.partial(jax.jit, static_argnames=("N", "iters", "parallel"))
def _solve_sparse(qp: StageQP, x0: jax.Array, N: int, iters: int, tau: float,
                  parallel: bool = False):
    n = qp.A.shape[0]
    m = qp.B.shape[1]
    nth = qp.LAM.shape[1]
    dtype = x0.dtype
    m_total = float(N * qp.h_x.shape[0] + N * qp.h_u.shape[0] + qp.h_w.shape[0])
    # dtype-aware guards, mirroring ops/ipm.py:130-133 — the f64 constants
    # underflow to 0 in f32 and poison D = z/s with inf/nan
    tiny = float(jnp.finfo(dtype).tiny) * 1e8
    d_cap = 1e30 if dtype == jnp.float64 else 1e7
    # converged-freeze threshold. f64: 30*eps ~ 6.7e-15, reachable. f32 mu
    # bottoms out around 1e-5 (Riccati-sweep roundoff), so 30*eps ~ 3.6e-6
    # would never fire — freeze at that measured floor instead, so the guard
    # actually engages once refinement is exhausted but not before the
    # solution reaches the 2e-4 active-set-exact grade (ADVICE r1; freezing
    # at 2e-4 itself was measured to cost 2.4e-4 solution error).
    tol_eff = 30.0 * float(jnp.finfo(dtype).eps) if dtype == jnp.float64 else 1e-5

    # Initial iterate MUST satisfy the dynamics: Newton directions are
    # homogeneous in the linearized dynamics (dx_0 = 0), so any dynamics
    # residual in the initial point would never be corrected. Start from the
    # U = 0 rollout (the same x0-simulation warm start the reference builds,
    # ref: DMS_tracking_LMPC_casadi.m:97-104).
    def roll0(x, _):
        x1 = qp.A @ x
        return x1, x1
    _, Xtail = jax.lax.scan(roll0, x0, None, length=N)
    X = jnp.concatenate([x0[None], Xtail])
    U = jnp.zeros((N, m), dtype)
    th = jnp.zeros((nth,), dtype)

    def ineq(X, U, th):
        gx = X[1:] @ qp.F_x.T - qp.h_x
        gu = U @ qp.F_u.T - qp.h_u
        gw = qp.Fw_x @ X[N] + qp.Fw_th @ th - qp.h_w
        return gx, gu, gw

    gx0, gu0, gw0 = ineq(X, U, th)
    sx, su, sw = (jnp.maximum(-g, 1.0) for g in (gx0, gu0, gw0))
    zx, zu, zw = (jnp.ones_like(s) for s in (sx, su, sw))

    # constant theta-block Hessian of the smooth cost
    Hth_cost = (
        qp.Tb
        + float(N) * (qp.LAM.T @ qp.Qb @ qp.LAM + qp.PSI.T @ qp.Rb @ qp.PSI)
        + qp.LAM.T @ qp.Pb @ qp.LAM
    )
    CxL = -qp.Qb @ qp.LAM          # stage x-theta cross Hessian (k=0..N-1)
    CxN = -qp.Pb @ qp.LAM          # terminal x-theta
    CuL = -qp.Rb @ qp.PSI          # stage u-theta

    def grads(X, U, th):
        ex = X - (qp.LAM @ th)[None, :]
        eu = U - (qp.PSI @ th)[None, :]
        gX = jnp.concatenate([ex[:N] @ qp.Qb.T, (ex[N:] @ qp.Pb.T)])
        gU = eu @ qp.Rb.T
        gth = (
            qp.Tb @ th
            - qp.LAM.T @ (qp.Qb @ ex[:N].sum(0))
            - qp.LAM.T @ (qp.Pb @ ex[N])
            - qp.PSI.T @ (qp.Rb @ eu.sum(0))
        )
        return gX, gU, gth

    def body(it, state):
        X, U, th, sx, su, sw, zx, zu, zw, frozen = state
        gx, gu, gw = ineq(X, U, th)
        sx_s = jnp.maximum(sx, tiny)
        su_s = jnp.maximum(su, tiny)
        sw_s = jnp.maximum(sw, tiny)
        Dx = jnp.minimum(zx / sx_s, d_cap)
        Du = jnp.minimum(zu / su_s, d_cap)
        Dw = jnp.minimum(zw / sw_s, d_cap)
        mu = (jnp.sum(sx * zx) + jnp.sum(su * zu) + jnp.sum(sw * zw)) / m_total

        gX, gU, gth = grads(X, U, th)
        # dual-feasibility residuals r = grad + F'z
        rX = gX.at[1:].add(zx @ qp.F_x)
        rX = rX.at[N].add(qp.Fw_x.T @ zw)
        rU = gU + zu @ qp.F_u
        rth = gth + qp.Fw_th.T @ zw

        rpx = gx + sx
        rpu = gu + su
        rpw = gw + sw

        # modified stage Hessians (same for predictor and corrector)
        Qt = qp.Qb + jnp.einsum("ki,nk,kj->nij", qp.F_x, Dx, qp.F_x)  # x_1..x_N
        Rt = qp.Rb + jnp.einsum("ki,nk,kj->nij", qp.F_u, Du, qp.F_u)
        PT = qp.Pb + qp.F_x.T @ (Dx[N - 1][:, None] * qp.F_x) \
            + qp.Fw_x.T @ (Dw[:, None] * qp.Fw_x)
        # Riccati stage weights: Qx_k applies to x_k (k=0..N-1), PN to x_N.
        # x_0 is fixed (dx_0 = 0) -> zero row; x_k rows use Qt[k-1] for
        # k = 1..N-1; x_N folds into PN above (note Qt[N-1] belongs to x_N).
        Qr = jnp.concatenate([jnp.zeros((1, n, n), dtype), Qt[: N - 1]])
        Hth_eff = Hth_cost + qp.Fw_th.T @ (Dw[:, None] * qp.Fw_th)
        CxN_eff = CxN + qp.Fw_x.T @ (Dw[:, None] * qp.Fw_th)

        # theta coupling columns (independent of the rc targets)
        def theta_col(i):
            e = jnp.zeros((nth,), dtype).at[i].set(1.0)
            q_st = jnp.broadcast_to(CxL @ e, (N - 1, n))
            qx_cols = jnp.concatenate([jnp.zeros((1, n), dtype), q_st])
            ru_cols = jnp.broadcast_to(CuL @ e, (N, m))
            return _riccati_solve(qp.A, qp.B, Qr, qx_cols, Rt, ru_cols,
                                  PT, CxN_eff @ e, parallel=parallel)

        cols = [theta_col(i) for i in range(nth)]

        def coupling_dot(Xs, Us):
            """M_thw applied to a primal direction."""
            return (Xs[1:N] @ CxL).sum(0) + CxN_eff.T @ Xs[N] + (Us @ CuL).sum(0)

        Smat = Hth_eff + jnp.stack([coupling_dot(*cols[i]) for i in range(nth)], axis=1)

        def newton(rcx, rcu, rcw):
            ax = (Dx * rpx - rcx / sx_s) @ qp.F_x             # (N, n), rows x_1..x_N
            au = (Du * rpu - rcu / su_s) @ qp.F_u
            aw = qp.Fw_x.T @ (Dw * rpw - rcw / sw_s)
            awth = qp.Fw_th.T @ (Dw * rpw - rcw / sw_s)
            # Riccati-as-minimizer returns dw = -Mtilde^{-1} q, so pass q = +r
            q_full = rX[1:] + ax                               # x_1..x_N (F_x part)
            qx_r = jnp.concatenate([jnp.zeros((1, n), dtype), q_full[: N - 1]])
            pN_r = q_full[N - 1] + aw                          # add terminal-set part
            ru_r = rU + au
            X0_, U0_ = _riccati_solve(qp.A, qp.B, Qr, qx_r, Rt, ru_r, PT, pN_r,
                                      parallel=parallel)
            rhs_th = -(rth + awth) - coupling_dot(X0_, U0_)
            dth = jnp.linalg.solve(Smat, rhs_th)
            dX = X0_ + sum(dth[i] * cols[i][0] for i in range(nth))
            dU = U0_ + sum(dth[i] * cols[i][1] for i in range(nth))
            dgx = dX[1:] @ qp.F_x.T
            dgu = dU @ qp.F_u.T
            dgw = qp.Fw_x @ dX[N] + qp.Fw_th @ dth
            dzx = Dx * (rpx + dgx) - rcx / sx_s
            dzu = Du * (rpu + dgu) - rcu / su_s
            dzw = Dw * (rpw + dgw) - rcw / sw_s
            dsx = -rpx - dgx
            dsu = -rpu - dgu
            dsw = -rpw - dgw
            return dX, dU, dth, dsx, dsu, dsw, dzx, dzu, dzw

        def steplen(pairs, t_):
            a = jnp.asarray(1.0, dtype)
            for v, dv in pairs:
                r = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
                a = jnp.minimum(a, t_ * jnp.min(r))
            return a

        # predictor
        dXa, dUa, dtha, dsxa, dsua, dswa, dzxa, dzua, dzwa = newton(
            sx * zx, su * zu, sw * zw
        )
        ap = steplen([(sx.ravel(), dsxa.ravel()), (su.ravel(), dsua.ravel()), (sw, dswa)], 1.0)
        ad = steplen([(zx.ravel(), dzxa.ravel()), (zu.ravel(), dzua.ravel()), (zw, dzwa)], 1.0)
        mu_aff = (
            jnp.sum((sx + ap * dsxa) * (zx + ad * dzxa))
            + jnp.sum((su + ap * dsua) * (zu + ad * dzua))
            + jnp.sum((sw + ap * dswa) * (zw + ad * dzwa))
        ) / m_total
        sigma = (mu_aff / jnp.maximum(mu, tiny)) ** 3
        # corrector
        dX, dU, dth, dsx, dsu, dsw, dzx, dzu, dzw = newton(
            sx * zx + dsxa * dzxa - sigma * mu,
            su * zu + dsua * dzua - sigma * mu,
            sw * zw + dswa * dzwa - sigma * mu,
        )
        ap = steplen([(sx.ravel(), dsx.ravel()), (su.ravel(), dsu.ravel()), (sw, dsw)], tau)
        ad = steplen([(zx.ravel(), dzx.ravel()), (zu.ravel(), dzu.ravel()), (zw, dzw)], tau)
        # freeze once converged (ops/ipm.py:196-199): keeps mu from driving
        # s,z into denormals — in f32 that turns the next D = z/s into nan
        viol = jnp.maximum(jnp.max(gx), jnp.maximum(jnp.max(gu), jnp.max(gw)))
        done = jnp.logical_and(mu < tol_eff, viol < tol_eff)
        frozen_new = jnp.logical_or(frozen, done)
        keep = lambda new, old: jnp.where(frozen, old, new)
        return (
            keep(X + ap * dX, X), keep(U + ap * dU, U), keep(th + ap * dth, th),
            keep(sx + ap * dsx, sx), keep(su + ap * dsu, su), keep(sw + ap * dsw, sw),
            keep(zx + ad * dzx, zx), keep(zu + ad * dzu, zu), keep(zw + ad * dzw, zw),
            frozen_new,
        )

    state = (X, U, th, sx, su, sw, zx, zu, zw, jnp.asarray(False))
    state = jax.lax.fori_loop(0, iters, body, state)
    X, U, th, sx, su, sw, zx, zu, zw, _frozen = state
    mu = (jnp.sum(sx * zx) + jnp.sum(su * zu) + jnp.sum(sw * zw)) / m_total
    gx, gu, gw = ineq(X, U, th)
    viol = jnp.maximum(jnp.max(gx), jnp.maximum(jnp.max(gu), jnp.max(gw)))
    # dtype-aware convergence grade, matching ops/ipm.py:207 — f32 Riccati
    # sweeps bottom out around mu~1e-5; 2e-4 is the active-set-exact grade
    # validated for the dense backend.
    conv_tol = 1e-7 if X.dtype == jnp.float64 else 2e-4
    return SparseIPMSolution(
        X=X, U=U, theta=th, mu=mu, max_violation=viol,
        converged=jnp.logical_and(mu < conv_tol, viol < conv_tol),
    )
