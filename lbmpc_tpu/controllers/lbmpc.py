"""Learning-based MPC: learned-model cost + nominal-model constraints, via SQP.

The core LBMPC split (ref: functions/costLBMPC.m:27 vs constraintsLBMPC.m:23,
dual-trajectory form DMS_LBMPC_casadi.m:252-315): performance is optimized
against the oracle-corrected model while safety constraints are enforced on
the nominal model with a tightened first step and the terminal set at k=1.

Condensed TPU form: the nominal constraints are the *constant* (G, h0, Hp)
stack of the condensed QP; only the cost rolls out the learned dynamics. Each
MPC step = a few Gauss-Newton SQP iterations, each one dense QP on device.
"""

from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from lbmpc_tpu.controllers.condensed import CondensedQP
from lbmpc_tpu.controllers.sqp import sqp_solve
from lbmpc_tpu.oracle import DataWindow, make_xi, nw_estimate, nw_estimate_and_jac


@dataclasses.dataclass(frozen=True)
class LBMPCWeights:
    """Square-root weights for the Gauss-Newton residual stack."""

    Lq: np.ndarray
    Lr: np.ndarray
    Lp: np.ndarray
    sqrtT: float
    LAMBDA: np.ndarray
    PSI: np.ndarray

    @classmethod
    def make(cls, Q, R, P, T, LAMBDA, PSI):
        return cls(
            Lq=np.linalg.cholesky(np.asarray(Q, float)).T,
            Lr=np.linalg.cholesky(np.asarray(R, float)).T,
            Lp=np.linalg.cholesky(np.asarray(P, float)).T,
            sqrtT=float(np.sqrt(T)),
            LAMBDA=np.atleast_2d(np.asarray(LAMBDA, float)),
            PSI=np.atleast_2d(np.asarray(PSI, float)),
        )


def make_residual_and_jac(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    family: str = "fmincon",
    delta: float = 0.01,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
    dx_ref: np.ndarray | None = None,
    dtype=jnp.float64,
):
    """Gauss-Newton residual stack and its HAND-DERIVED Jacobian (one scan).

    The residual is linear in the learned-rollout trajectory, so its Jacobian
    follows from sensitivity propagation S_{k+1} = (A + Jg dxi/dx) S_k +
    (B + Jg dxi/du) du/dz with the oracle Jacobian Jg in closed form
    (oracle.nw_estimate_and_jac) — ~3 tangent dims through the q-point NW
    kernel instead of nz under jacfwd. Returns (residual(z, dx0, window),
    res_jac(z, dx0, window) -> (e, J)); both pure/jittable/vmappable.
    """
    N, n, m = qp.N, qp.n, qp.m
    nth = np.atleast_2d(np.asarray(w.LAMBDA)).shape[1]
    nz = N * m + nth
    Ad = jnp.asarray(A, dtype)
    Bd = jnp.asarray(B, dtype)
    Ksd = jnp.asarray(np.atleast_2d(Ks), dtype)
    Lq = jnp.asarray(w.Lq, dtype)
    Lr = jnp.asarray(w.Lr, dtype)
    Lp = jnp.asarray(w.Lp, dtype)
    LAM = jnp.asarray(w.LAMBDA, dtype)
    PSI = jnp.asarray(w.PSI, dtype)
    xs_ref = (jnp.zeros((n,), dtype) if dx_ref is None
              else jnp.asarray(dx_ref, dtype))
    sq_delta = float(np.sqrt(delta))
    Eks_np = np.zeros((N, m, nz))
    for k in range(N):
        Eks_np[k, :, k * m : (k + 1) * m] = np.eye(m)
    Eks_d = jnp.asarray(Eks_np, dtype)
    Tsel = np.zeros((nth, nz))
    Tsel[:, N * m :] = np.eye(nth)
    LAM_T = jnp.asarray(np.atleast_2d(np.asarray(w.LAMBDA, float)) @ Tsel, dtype)
    PSI_T = jnp.asarray(np.atleast_2d(np.asarray(w.PSI, float)) @ Tsel, dtype)

    def _finish(theta, xs, us, xN):
        xa = LAM @ theta
        ua = PSI @ theta
        if family == "fmincon":
            rx = (xs[: N - 2] - xa) @ Lq.T
            ru = (us[: N - 2] - ua) @ Lr.T
        else:
            rx = sq_delta * ((xs - xa) @ Lq.T)
            ru = sq_delta * ((us - ua) @ Lr.T)
        rP = Lp @ (xN - xa)
        rT = w.sqrtT * (xa - xs_ref)
        return jnp.concatenate([rx.ravel(), ru.ravel(), rP, rT])

    def residual(z, dx0, window):
        cs = z[: N * m].reshape(N, m)

        def step(x, c):
            u = Ksd @ x + c if family == "fmincon" else c
            x1 = (Ad @ x + Bd @ u
                  + nw_estimate(make_xi(x, u), window, bandwidth, ridge))
            return x1, (x, u)

        xN, (xs, us) = jax.lax.scan(step, dx0, cs)
        return _finish(z[N * m :], xs, us, xN)

    def res_jac(z, dx0, window):
        cs = z[: N * m].reshape(N, m)
        S0 = jnp.zeros((n, nz), z.dtype)

        def step(carry, inp):
            x, S = carry
            c, Ek = inp
            if family == "fmincon":
                u = Ksd @ x + c
                dudz = Ksd @ S + Ek
            else:
                u = c
                dudz = Ek
            gv, Jg = nw_estimate_and_jac(make_xi(x, u), window,
                                         bandwidth, ridge)
            dxidz = jnp.concatenate([S[:2], dudz], axis=0)  # xi = [x0, x1, u]
            x1 = Ad @ x + Bd @ u + gv
            S1 = Ad @ S + Bd @ dudz + Jg @ dxidz
            return (x1, S1), (x, u, S, dudz)

        (xN, SN), (xs, us, Ss, dudzs) = jax.lax.scan(step, (dx0, S0),
                                                     (cs, Eks_d))
        if family == "fmincon":
            Jrx = jnp.einsum("ij,kjz->kiz", Lq, Ss[: N - 2] - LAM_T[None])
            Jru = jnp.einsum("ij,kjz->kiz", Lr, dudzs[: N - 2] - PSI_T[None])
        else:
            Jrx = sq_delta * jnp.einsum("ij,kjz->kiz", Lq, Ss - LAM_T[None])
            Jru = sq_delta * jnp.einsum("ij,kjz->kiz", Lr, dudzs - PSI_T[None])
        JrP = Lp @ (SN - LAM_T)
        JrT = w.sqrtT * LAM_T
        e = _finish(z[N * m :], xs, us, xN)
        J = jnp.concatenate([Jrx.reshape(-1, nz), Jru.reshape(-1, nz),
                             JrP, JrT], axis=0)
        return e, J

    return residual, res_jac


def make_lbmpc_solver(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    family: str = "fmincon",
    delta: float = 0.01,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
    dx_ref: np.ndarray | None = None,
    sqp_iters: int = 3,
    ipm_iters: int = 30,
    dtype=jnp.float64,
    mixed: bool = False,
):
    """Returns solve(dx0, window, z_ws) -> (z, converged), pure and jittable.

    family='fmincon': prestabilized decision u_k = Ks x_k + c_k, cost stage
    quirk of costLBMPC.m (running stages 0..N-3, terminal on x_N).
    family='casadi': direct du decision, delta-scaled running stages 0..N-1
    (ref: DMS_LBMPC_casadi.m costfunction), terminal on learned x_N.

    The QP subproblems use the hand-derived Gauss-Newton Jacobian
    (make_residual_and_jac) — identical values to the jacfwd path, ~nz/3
    fewer tangent passes through the NW kernel.
    """
    Gd = jnp.asarray(qp.G, dtype)
    h0d = jnp.asarray(qp.h0, dtype)
    Hpd = jnp.asarray(qp.Hp, dtype)
    residuals, res_jac = make_residual_and_jac(
        qp, A, B, Ks, w, family=family, delta=delta, bandwidth=bandwidth,
        ridge=ridge, dx_ref=dx_ref, dtype=dtype)

    def solve(dx0, window: DataWindow, z_ws):
        res_fn = lambda z: residuals(z, dx0, window)
        cost_fn = lambda z: jnp.sum(res_fn(z) ** 2)
        h = h0d + Hpd @ dx0
        out = sqp_solve(cost_fn, res_fn, Gd, h, z_ws, iters=sqp_iters,
                        ipm_iters=ipm_iters, mixed=mixed,
                        res_jac_fn=lambda z: res_jac(z, dx0, window))
        return out.z, out.qp_converged

    return solve


def make_lbmpc_solver_sparse(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    cs,
    family: str = "fmincon",
    delta: float = 0.01,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
    dx_ref: np.ndarray | None = None,
    sqp_iters: int = 3,
    ipm_iters: int = 30,
    terminal_at: str = "first",
    tighten_first_step: bool = True,
    dtype=jnp.float64,
    rho: float = 1e4,
):
    """LBMPC SQP whose subproblems run in STAGE FORM (ops/sparse_gn.py):
    each Gauss-Newton step is a Riccati-factored Mehrotra IPM over the
    dual-trajectory stage variables instead of a dense condensed QP —
    O(N) per Newton system instead of O((Nm)^3). Long-horizon path
    (VERDICT r1 item 5); `qp` is used only for layout (N, n, m, nz) and the
    shared residual stack. Ref: the lifted DMS NLPs the reference hands to
    IPOPT (examples/DMS_LBMPC_casadi.m:122-130) are exactly this structure.

    Returns solve(dx0, window, z_ws) -> (z, converged) — same contract and
    same cost/constraint semantics as make_lbmpc_solver (episode-equivalence
    is tested in tests/test_sparse_gn.py)."""
    from lbmpc_tpu.ops.sparse_gn import make_stage_gn, solve_sparse_gn

    N, n, m = qp.N, qp.n, qp.m
    nth = np.atleast_2d(np.asarray(w.LAMBDA)).shape[1]
    sg = make_stage_gn(A, B, Ks, np.asarray(w.Lq).T @ np.asarray(w.Lq),
                       np.asarray(w.Lr).T @ np.asarray(w.Lr),
                       np.asarray(w.Lp).T @ np.asarray(w.Lp),
                       float(w.sqrtT) ** 2, w.LAMBDA, w.PSI, cs, N, delta,
                       family=family, terminal_at=terminal_at,
                       tighten_first_step=tighten_first_step)
    sg = jax.tree.map(
        lambda x: x.astype(dtype)
        if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
        else x, sg)
    Ad = jnp.asarray(A, dtype)
    Bd = jnp.asarray(B, dtype)
    Ksd = jnp.asarray(np.atleast_2d(Ks), dtype) if family == "fmincon" \
        else jnp.zeros((m, n), dtype)
    An = Ad + Bd @ Ksd
    LAM = jnp.asarray(w.LAMBDA, dtype)
    PSI = jnp.asarray(w.PSI, dtype)
    xs_ref = (jnp.zeros((n,), dtype) if dx_ref is None
              else jnp.asarray(dx_ref, dtype))
    residual, _ = make_residual_and_jac(
        qp, A, B, Ks, w, family=family, delta=delta, bandwidth=bandwidth,
        ridge=ridge, dx_ref=dx_ref, dtype=dtype)
    # selector rows: dxi/dxl = [e1; e2; Ks or 0], dxi/dc = [0; 0; I]
    Exl = jnp.concatenate([jnp.eye(2, n, dtype=dtype), Ksd], axis=0)  # (3, n)

    def linearize(z, dx0, window):
        cvals = z[: N * m].reshape(N, m)
        theta = z[N * m :]

        def lstep(xl, c):
            u = Ksd @ xl + c
            xi = make_xi(xl, u)
            gv, Jg = nw_estimate_and_jac(xi, window, bandwidth, ridge)
            Al = An + Jg @ Exl
            Bl = Bd + Jg[:, 2:3]
            x1 = Ad @ xl + Bd @ u + gv
            return x1, (Al, Bl, xl, u)

        xlN, (Als, Bls, xls, us) = jax.lax.scan(lstep, dx0, cvals)

        def nstep(x, c):
            return An @ x + Bd @ c, x

        xnN, xns = jax.lax.scan(nstep, dx0, cvals)
        xn_all = jnp.concatenate([xns, xnN[None]])       # x_0..x_N nominal

        # GN linear terms (pre-doubled convention of StageGNQP blocks)
        ex = xls - (LAM @ theta)[None, :]                # (N, n)
        eu = us - (PSI @ theta)[None, :]                 # (N, m)
        eN = xlN - LAM @ theta
        cm = sg.cost_mask[:, None]
        q_stage = cm * (ex @ sg.Qb.T + eu @ (sg.Ks.T @ sg.Rb).T)
        q_xl = jnp.concatenate([q_stage, (sg.Pb @ eN)[None, :]])
        r_c = cm * (eu @ sg.Rb.T)
        g_th = (- LAM.T @ (sg.Qb @ (ex * cm).sum(0))
                - PSI.T @ (sg.Rb @ (eu * cm).sum(0))
                - LAM.T @ (sg.Pb @ eN)
                + sg.TLL @ theta
                - 2.0 * float(w.sqrtT) ** 2 * (LAM.T @ xs_ref))
        hx_t = sg.h_x[None, :] - xn_all[1:] @ sg.F_x.T
        hu_t = sg.h_u[None, :] - (cvals + xn_all[:N] @ Ksd.T) @ sg.F_u.T
        hd_t = sg.h_d - sg.F_d @ xn_all[1]
        hw_t = sg.h_w - sg.Fw_x @ xn_all[sg.kT] - sg.Fw_th @ theta
        return Als, Bls, q_xl, r_c, g_th, hx_t, hu_t, hd_t, hw_t, xn_all

    def viol_of(z, dx0):
        cvals = z[: N * m].reshape(N, m)
        theta = z[N * m :]

        def nstep(x, c):
            return An @ x + Bd @ c, x

        xnN, xns = jax.lax.scan(nstep, dx0, cvals)
        xn_all = jnp.concatenate([xns, xnN[None]])
        vx = jnp.maximum(xn_all[1:] @ sg.F_x.T - sg.h_x[None, :], 0.0)
        vu = jnp.maximum(
            (cvals + xn_all[:N] @ Ksd.T) @ sg.F_u.T - sg.h_u[None, :], 0.0)
        vd = jnp.maximum(sg.F_d @ xn_all[1] - sg.h_d, 0.0)
        vw = jnp.maximum(
            sg.Fw_x @ xn_all[sg.kT] + sg.Fw_th @ theta - sg.h_w, 0.0)
        return (jnp.sum(vx * sg.srow_mask[:, None])
                + jnp.sum(vu * sg.urow_mask[:, None])
                + jnp.sum(vd) + jnp.sum(vw))

    alphas = (1.0, 0.5, 0.25, 0.125, 0.0625)

    def solve(dx0, window: DataWindow, z_ws):
        def cost(z):
            e = residual(z, dx0, window)
            return jnp.sum(e * e)

        def merit(z):
            return cost(z) + rho * viol_of(z, dx0)

        z = z_ws
        conv = jnp.asarray(True)
        for _ in range(sqp_iters):
            (Als, Bls, q_xl, r_c, g_th, hx_t, hu_t, hd_t, hw_t,
             _) = linearize(z, dx0, window)
            sol = solve_sparse_gn(sg, Als, Bls, q_xl, r_c, g_th,
                                  hx_t, hu_t, hd_t, hw_t, iters=ipm_iters)
            d = jnp.concatenate([sol.dC.ravel(), sol.dth])
            conv = sol.converged
            g_z = jax.grad(cost)(z)
            m0 = merit(z)
            dirderiv = jnp.dot(g_z, d) - rho * viol_of(z, dx0)
            accepted = jnp.asarray(False)
            alpha_sel = jnp.zeros((), dtype)
            for a in alphas:
                m_a = merit(z + a * d)
                ok = jnp.logical_and(~accepted, m_a <= m0 + 1e-4 * a * dirderiv)
                alpha_sel = jnp.where(ok, a, alpha_sel)
                accepted = jnp.logical_or(accepted, ok)
            d = jnp.where(jnp.isfinite(d), d, 0.0)
            z = z + alpha_sel * d
        return z, conv

    return solve


def make_casadi_warm_start(qp: CondensedQP, A, B, Ks, dtype=jnp.float64):
    """Shift-and-append warm start (ref: DMS_LBMPC_casadi.m:209-213).

    z' = [du_1..du_{N-1}, Ks dx_N^nom, theta] where dx_N^nom is the nominal
    condensed rollout's final state under the current solution.
    """
    N, n, m = qp.N, qp.n, qp.m
    SxN = jnp.asarray(qp.Sx[N], dtype)
    ScN = jnp.asarray(qp.Sc[N], dtype)
    Ksd = jnp.asarray(np.atleast_2d(Ks), dtype)

    def warm(z, dx_used, dx_next, window):
        cs = z[: N * m]
        theta = z[N * m :]
        # the reference shifts using the previous solve's open-loop nominal
        # trajectory; its final state is the condensed rollout at dx_used
        dxN = SxN @ dx_used + ScN @ cs
        tail = Ksd @ dxN
        return jnp.concatenate([cs[m:], tail, theta])

    return warm
