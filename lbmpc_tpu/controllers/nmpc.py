"""Nonlinear MPC: true-ODE rollout in cost AND constraints, via SQP.

Ref: functions/costNMPC.m + constraintsNMPC.m (fmincon family) and
examples/DMS_tracking_NMPC_casadi.m (CasADi family). The predictive model is
the true MGCM ODE integrated with substepped RK4 (differentiable; the plant
itself may use adaptive RK23 — ref mismatch note in SURVEY.md §7.4.4), or
degree-d Legendre collocation (ref: collocation_regular_NMPC_test.m:129-159 —
there the collocation states are lifted into the NLP; here the implicit
collocation equations are solved inside the prediction step and the SQP
differentiates through the fixed Newton iterations, which keeps the decision
vector identical across transcriptions), or the nominal DLTI (the regulation
LMPC of regular_LMPC_casadi.m).

Regulation variants (ref: regular_NMPC_casadi.m / regular_LMPC_casadi.m):
regulation to the equilibrium with theta pinned at 0, hard-coded terminal
cost P (regular_NMPC_casadi.m:48-53), and the ellipsoidal terminal region
(x-x_eq)' P (x-x_eq) <= alpha (alpha=0.7, terminalconstraints at
regular_NMPC_casadi.m:231-233) as one nonlinear-constraint row.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
from lbmpc_tpu.controllers.sqp import sqp_solve_nonlinear_constraints
from lbmpc_tpu.models.mgcm import rk4_step
from lbmpc_tpu.sets.terminal import ConstraintSet


def make_nmpc_solver(
    cs: ConstraintSet,
    Ks: np.ndarray,
    w: LBMPCWeights,
    N: int,
    ts: float,
    x_wp: np.ndarray,
    u_wp: float,
    family: str = "fmincon",
    pred_substeps: int = 4,
    dx_ref: np.ndarray | None = None,
    sqp_iters: int = 4,
    ipm_iters: int = 30,
    dtype=jnp.float64,
    prediction: str = "rk4",
    colloc_degree: int = 3,
    colloc_newton_iters: int = 3,
    AB: tuple | None = None,
    regulation: bool = False,
    P_term: np.ndarray | None = None,
    ellipsoid_alpha: float | None = None,
):
    """Returns solve(dx0, window, z_ws) -> (z, converged).

    fmincon family: z = [c_0..c_{N-1}; theta], u_k = Ks(x_k - x_wp) + c_k + u_wp
    (ref: transitionTrue.m:11); cost stage quirk of costNMPC.m (running stages
    0..N-3 in delta coordinates, terminal on dx_N); constraints of
    constraintsNMPC.m (states dx_1..dx_{N-1}, inputs du_0..du_{N-2}, terminal
    set on [dx_{N-1}; theta]).
    casadi family: z = [u_0..u_{N-1}; theta] direct, delta-scaled stages
    0..N-1, terminal on dx_N and terminal set on [dx_N; theta]
    (ref: DMS_tracking_NMPC_casadi.m:271-286).

    prediction: "rk4" (substepped RK4 of the true ODE), "collocation"
    (implicit degree-d Legendre collocation — models/collocation.py), or
    "dlti" (nominal A,B via `AB`; the regulation-LMPC prediction model).

    regulation=True pins theta at 0 (the z slots stay for layout
    compatibility but influence nothing and keep their warm-start value 0),
    drops the artificial-reference offset T-row and the polytopic terminal
    set, uses P_term for the terminal cost (the reference's hard-coded P),
    and — when ellipsoid_alpha is given — adds the quadratic terminal region
    dx_N' P_term dx_N <= alpha as a nonlinear constraint row.
    """
    n = cs.F_x.shape[1]
    m = cs.F_u.shape[1]
    nth = w.LAMBDA.shape[1]
    Ksd = jnp.asarray(np.atleast_2d(Ks), dtype)
    x_wpd = jnp.asarray(x_wp, dtype)
    u_wpd = jnp.asarray(np.atleast_1d(u_wp), dtype)
    Lq = jnp.asarray(w.Lq, dtype)
    Lr = jnp.asarray(w.Lr, dtype)
    Lp = jnp.asarray(w.Lp, dtype)
    LAM = jnp.asarray(w.LAMBDA, dtype)
    PSI = jnp.asarray(w.PSI, dtype)
    F_x = jnp.asarray(cs.F_x, dtype)
    h_x = jnp.asarray(cs.h_x, dtype)
    F_u = jnp.asarray(cs.F_u, dtype)
    h_u = jnp.asarray(cs.h_u, dtype)
    Fw_x = jnp.asarray(cs.F_w_N[:, :n], dtype)
    Fw_th = jnp.asarray(cs.F_w_N[:, n:], dtype)
    h_wN = jnp.asarray(cs.h_w_N, dtype)
    xs_ref = jnp.zeros((n,), dtype) if dx_ref is None else jnp.asarray(dx_ref, dtype)
    sq_delta = float(np.sqrt(ts))
    if regulation:
        Lp = jnp.asarray(
            np.linalg.cholesky(np.asarray(
                P_term if P_term is not None else w.Lp.T @ w.Lp, float)).T,
            dtype)
        P_ell = jnp.asarray(P_term, dtype) if P_term is not None else Lp.T @ Lp

    if prediction == "collocation":
        from lbmpc_tpu.models.collocation import collocation_step

        def integrate(x, u):
            return collocation_step(x, u[0], ts, degree=colloc_degree,
                                    newton_iters=colloc_newton_iters)
    elif prediction == "dlti":
        # regulation-LMPC prediction model (ref: regular_LMPC_casadi.m —
        # linear discrete dynamics in the NLP). AB are DELTA-coordinate
        # matrices; convert around the working point.
        A_d = jnp.asarray(AB[0], dtype)
        B_d = jnp.asarray(AB[1], dtype)

        def integrate(x, u):
            return x_wpd + A_d @ (x - x_wpd) + B_d @ (u - u_wpd)
    else:

        def integrate(x, u):
            return rk4_step(x, u[0], ts, substeps=pred_substeps)

    def rollout(z, dx0):
        cvals = z[: N * m].reshape(N, m)
        x0_abs = x_wpd + dx0

        def step(x, c):
            if family == "fmincon":
                u = Ksd @ (x - x_wpd) + c + u_wpd
            else:
                u = c + u_wpd  # z holds du for the casadi family
            x1 = integrate(x, u)
            return x1, (x - x_wpd, u - u_wpd)

        xN_abs, (dxs, dus) = jax.lax.scan(step, x0_abs, cvals)
        return dxs, dus, xN_abs - x_wpd

    def residuals(z, dx0):
        theta = z[N * m :]
        dxs, dus, dxN = rollout(z, dx0)
        if regulation:
            # theta pinned at 0 (ref: regular_NMPC_casadi.m regulates to x_eq
            # with no artificial reference); no T-offset row
            xa = jnp.zeros((n,), dtype)
            ua = jnp.zeros((m,), dtype)
        else:
            xa = LAM @ theta
            ua = PSI @ theta
        if family == "fmincon":
            rx = (dxs[: N - 2] - xa) @ Lq.T
            ru = (dus[: N - 2] - ua) @ Lr.T
        else:
            rx = sq_delta * ((dxs - xa) @ Lq.T)
            ru = sq_delta * ((dus - ua) @ Lr.T)
        rP = Lp @ (dxN - xa)
        if regulation:
            return jnp.concatenate([rx.ravel(), ru.ravel(), rP])
        rT = w.sqrtT * (xa - xs_ref)
        return jnp.concatenate([rx.ravel(), ru.ravel(), rP, rT])

    def constraints(z, dx0):
        theta = z[N * m :]
        dxs, dus, dxN = rollout(z, dx0)
        if family == "fmincon":
            # states dx_1..dx_{N-1} = rollout states at indices 1..N-1
            st = jnp.concatenate([dxs[1:], dxN[None, :]])[: N - 1]
            c_state = (st @ F_x.T - h_x).ravel()
            c_input = (dus[: N - 1] @ F_u.T - h_u).ravel()
            dx_term = st[-1]
        else:
            st = jnp.concatenate([dxs[1:], dxN[None, :]])
            c_state = (st @ F_x.T - h_x).ravel()
            c_input = (dus @ F_u.T - h_u).ravel()
            dx_term = dxN
        if regulation:
            # quadratic/ellipsoidal terminal region instead of the polytope
            # (ref: regular_NMPC_casadi.m:231-233, alpha=0.7)
            if ellipsoid_alpha is None:
                return jnp.concatenate([c_state, c_input])
            # dimensionless form (x'Px/alpha - 1 <= 0): keeps the row at the
            # same O(1) scale as the box rows so the QP stays well-conditioned
            # (P entries are O(2e3), ref regular_NMPC_casadi.m:48-53)
            c_ell = (dx_term @ P_ell @ dx_term / ellipsoid_alpha - 1.0)[None]
            return jnp.concatenate([c_state, c_input, c_ell])
        c_term = Fw_x @ dx_term + Fw_th @ theta - h_wN
        return jnp.concatenate([c_state, c_input, c_term])

    # the terminal-ellipsoid row runs in elastic mode: its linearization is
    # infeasible while the rollout is still far from the region (see
    # sqp_solve_nonlinear_constraints docstring)
    elastic = 1 if (regulation and ellipsoid_alpha is not None) else 0

    def solve(dx0, window, z_ws):
        res_fn = lambda z: residuals(z, dx0)
        cost_fn = lambda z: jnp.sum(res_fn(z) ** 2)
        cons_fn = lambda z: constraints(z, dx0)
        out = sqp_solve_nonlinear_constraints(
            cost_fn, res_fn, cons_fn, z_ws, iters=sqp_iters,
            ipm_iters=ipm_iters, elastic_rows=elastic
        )
        return out.z, out.qp_converged

    return solve
