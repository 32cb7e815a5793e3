"""Jittable SQP engine: Gauss-Newton cost model + dense QP subproblems.

Replaces fmincon's SQP (ref: functions/ocpLBMPC.m:31 `'Algorithm','sqp'`) and
IPOPT's interior point (ref: DMS_LBMPC_casadi.m:130) for the nonconvex OCPs.
The decisive structural fact (see SURVEY.md §7.1): in LBMPC only the *cost* is
nonconvex (learned rollout); the constraints stay affine in z. NMPC linearizes
its constraints each iteration. Either way each SQP iteration is one dense QP
solved by the batched Mehrotra IPM — so a whole SQP step vmaps over scenarios.

Fixed iteration counts and a fixed ladder of line-search step sizes keep the
whole loop inside one jit trace with no data-dependent shapes.
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from lbmpc_tpu.ops.ipm import solve_qp, solve_qp_mixed


class SQPResult(NamedTuple):
    z: jax.Array
    cost: jax.Array
    qp_converged: jax.Array   # convergence flag of the last QP subproblem
    step_norms: jax.Array     # (sqp_iters,) |d| per iteration — diagnostics


_ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625)


def _merit(cost_fn, G, h, z, rho):
    viol = jnp.sum(jnp.maximum(G @ z - h, 0.0))
    return cost_fn(z) + rho * viol, viol


def sqp_solve(
    cost_fn: Callable[[jax.Array], jax.Array],
    residual_fn: Callable[[jax.Array], jax.Array],
    G: jax.Array,
    h: jax.Array,
    z0: jax.Array,
    iters: int = 4,
    ipm_iters: int = 30,
    rho: float = 1e4,
    reg: float = 1e-9,
    mixed: bool = False,
    res_jac_fn: Callable | None = None,
) -> SQPResult:
    """Minimize cost_fn(z) = ||residual_fn(z)||^2 subject to G z <= h.

    mixed=True solves each QP subproblem with solve_qp_mixed (f32 IPM + f64
    warm-started refinement) — f32-class device cost, f64-class step accuracy.

    residual_fn returns the stacked weighted residual vector e(z) with
    cost = e'e; the Gauss-Newton Hessian 2 J'J is PSD, so every QP subproblem
    is convex. J = de/dz comes from jacfwd, or from res_jac_fn(z) -> (e, J)
    when the caller has a hand-derived Jacobian (cheaper tangent count — see
    controllers/lbmpc.make_residual_and_jac). A fixed Armijo ladder on an l1
    merit keeps the line search jittable.
    """
    nz = z0.shape[-1]
    Ireg = jnp.eye(nz, dtype=z0.dtype)

    grad_fn = jax.grad(cost_fn)

    def body(carry, _):
        z = carry
        if res_jac_fn is None:
            e = residual_fn(z)
            J = jax.jacfwd(residual_fn)(z)
            g = grad_fn(z)
        else:
            e, J = res_jac_fn(z)
            g = 2.0 * (J.T @ e)
        H = 2.0 * J.T @ J + reg * Ireg
        # QP in step d: min 1/2 d'Hd + g'd  s.t. G d <= h - G z
        if mixed:
            sol = solve_qp_mixed(H, g, G, h - G @ z, f32_iters=ipm_iters)
        else:
            sol = solve_qp(H, g, G, h - G @ z, iters=ipm_iters)
        d = sol.x
        m0, v0 = _merit(cost_fn, G, h, z, rho)
        dir_deriv = jnp.dot(g, d) - rho * v0  # descent estimate for merit

        def try_alpha(alpha):
            m_a, _ = _merit(cost_fn, G, h, z + alpha * d, rho)
            return m_a <= m0 + 1e-4 * alpha * dir_deriv

        oks = jnp.stack([try_alpha(a) for a in _ALPHAS])
        alphas = jnp.asarray(_ALPHAS, z0.dtype)
        # first accepted alpha; fall back to the smallest if none accepted
        idx = jnp.argmax(oks)
        alpha = jnp.where(jnp.any(oks), alphas[idx], alphas[-1])
        z_new = z + alpha * d
        return z_new, (jnp.linalg.norm(d), sol.converged)

    z, (dnorms, qpconv) = jax.lax.scan(body, z0, None, length=iters)
    return SQPResult(z=z, cost=cost_fn(z), qp_converged=qpconv[-1], step_norms=dnorms)


def sqp_solve_nonlinear_constraints(
    cost_fn: Callable[[jax.Array], jax.Array],
    residual_fn: Callable[[jax.Array], jax.Array],
    cons_fn: Callable[[jax.Array], jax.Array],   # c(z) <= 0
    z0: jax.Array,
    iters: int = 5,
    ipm_iters: int = 30,
    rho: float = 1e4,
    reg: float = 1e-9,
    elastic_rows: int = 0,
) -> SQPResult:
    """SQP with nonlinear inequality constraints (NMPC: true-ODE rollout).

    Constraints are linearized each iteration: c(z) + Jc d <= 0; the merit is
    cost + rho * sum max(c, 0). Ref behaviour: constraintsNMPC.m evaluated by
    fmincon-SQP with finite differences — here Jc comes from jacfwd.

    elastic_rows=k puts the LAST k constraint rows in elastic mode (SNOPT
    style): each gets a slack s >= 0 with c + Jc d <= s and linear penalty
    rho * s in the QP objective — the exact-penalty QP counterpart of the
    merit's hinge term. Use for rows whose linearization can be infeasible at
    intermediate iterates (e.g. a terminal ellipsoid the rollout cannot yet
    reach — ref: regular_NMPC_casadi.m's terminal constraint, which the
    reference left commented out for exactly this reason); hard rows stay
    hard, and at a feasible optimum the slacks sit at 0.
    """
    nz = z0.shape[-1]
    Ireg = jnp.eye(nz, dtype=z0.dtype)
    grad_fn = jax.grad(cost_fn)

    def merit(z):
        return cost_fn(z) + rho * jnp.sum(jnp.maximum(cons_fn(z), 0.0))

    def body(carry, _):
        z = carry
        e = residual_fn(z)
        J = jax.jacfwd(residual_fn)(z)
        H = 2.0 * J.T @ J + reg * Ireg
        g = grad_fn(z)
        c = cons_fn(z)
        Jc = jax.jacfwd(cons_fn)(z)
        if elastic_rows:
            k = elastic_rows
            mc = c.shape[0]
            dt = z0.dtype
            # d_ext = [d; s]: min .. + rho 1's  s.t. [Jc -E] d_ext <= -c,
            # -s <= 0, where E selects the elastic rows
            E = jnp.zeros((mc, k), dt).at[mc - k :, :].set(jnp.eye(k, dtype=dt))
            H_e = jnp.block([
                [H, jnp.zeros((nz, k), dt)],
                [jnp.zeros((k, nz), dt), 1e-6 * jnp.eye(k, dtype=dt)]])
            g_e = jnp.concatenate([g, jnp.full((k,), rho, dt)])
            G_e = jnp.block([
                [Jc, -E],
                [jnp.zeros((k, nz), dt), -jnp.eye(k, dtype=dt)]])
            rhs = jnp.concatenate([-c, jnp.zeros((k,), dt)])
            sol = solve_qp(H_e, g_e, G_e, rhs, iters=ipm_iters)
            d = sol.x[:nz]
        else:
            sol = solve_qp(H, g, Jc, -c, iters=ipm_iters)
            d = sol.x
        m0 = merit(z)
        viol0 = jnp.sum(jnp.maximum(c, 0.0))
        dir_deriv = jnp.dot(g, d) - rho * viol0

        def try_alpha(alpha):
            return merit(z + alpha * d) <= m0 + 1e-4 * alpha * dir_deriv

        oks = jnp.stack([try_alpha(a) for a in _ALPHAS])
        alphas = jnp.asarray(_ALPHAS, z0.dtype)
        idx = jnp.argmax(oks)
        # if every alpha is rejected (e.g. a diverged QP direction — the
        # elastic/ellipsoid subproblems can fail far from feasibility), take
        # NO step instead of stepping blindly by the smallest alpha; same
        # guard as the fused batch SQP (sqp_fused.py)
        alpha = jnp.where(jnp.any(oks), alphas[idx], jnp.zeros((), z0.dtype))
        d = jnp.where(jnp.isfinite(d), d, 0.0)
        return z + alpha * d, (jnp.linalg.norm(d), sol.converged)

    z, (dnorms, qpconv) = jax.lax.scan(body, z0, None, length=iters)
    return SQPResult(z=z, cost=cost_fn(z), qp_converged=qpconv[-1], step_norms=dnorms)
