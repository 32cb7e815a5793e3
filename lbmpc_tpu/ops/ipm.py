"""Batched dense Mehrotra predictor-corrector interior-point method (QP/LP).

This is the TPU-native replacement for every compiled solver the reference
leans on: MATLAB `linprog` (support-function LPs in utilities/pdiff.m:10-17 and
functions/calc_mRPIS.m:21-52), `fmincon`-SQP's QP subproblems
(functions/ocpLBMPC.m:31), and CasADi/IPOPT's barrier solves
(examples/DMS_LBMPC_casadi.m:174-179).

Problem form (inequality-constrained dense QP; LP when H = 0):

    min_x  1/2 x'Hx + g'x   s.t.   G x <= h

Design for TPU:
  - fixed iteration count, no data-dependent control flow — jits to a single
    XLA while-free loop; converged problems are frozen by masking, so one
    batch member can't stall another;
  - the per-iteration work is (m x n)'(m x n) normal-matrix products and an
    n x n Cholesky — MXU-shaped matmuls batched over thousands of scenarios
    with `vmap`;
  - float64 by default (TPU f64 is emulated but these are tiny systems; the
    1e-4 closed-loop parity target of BASELINE.json needs it). A bf16/f32
    path with iterative refinement is provided by `solve_qp` dtype argument.

All functions are single-problem; batch with `jax.vmap` (see
`solve_qp_batched`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class IPMSolution(NamedTuple):
    x: jax.Array          # primal solution (n,)
    z: jax.Array          # dual multipliers for G x <= h (m,)
    s: jax.Array          # slacks (m,)
    mu: jax.Array         # final complementarity measure (scalar)
    primal_res: jax.Array # final ||Gx + s - h||_inf
    dual_res: jax.Array   # final ||Hx + g + G'z||_inf
    converged: jax.Array  # bool
    iters: jax.Array      # iteration at which the freeze mask first hit
    infeasible: jax.Array # bool: Farkas certificate of primal infeasibility
    farkas_gap: jax.Array # -h'y for the normalized candidate ray y (>0 => cert)


def _step_length(v: jax.Array, dv: jax.Array, tau: float) -> jax.Array:
    """Largest alpha in (0, 1] with v + alpha*dv >= (1-tau)*v-ish boundary rule."""
    ratio = jnp.where(dv < 0, -v / jnp.where(dv < 0, dv, -1.0), jnp.inf)
    return jnp.minimum(1.0, tau * jnp.min(ratio))


@functools.partial(jax.jit, static_argnames=("iters", "tol"))
def solve_qp(
    H: jax.Array,
    g: jax.Array,
    G: jax.Array,
    h: jax.Array,
    iters: int = 30,
    tol: float = 1e-10,
    tau: float = 0.995,
) -> IPMSolution:
    """Solve min 1/2 x'Hx + g'x s.t. Gx <= h by Mehrotra predictor-corrector.

    H may be exactly zero (LP). Requires the feasible set to be bounded in the
    directions that matter (true for all reference uses: support functions
    over bounded polytopes, strictly convex MPC QPs).

    All matmuls run at HIGHEST precision: on TPU the default f32 matmul path
    goes through bf16 passes whose error stalls the IPM around 1e-3 — full
    fp32 accumulation costs ~2x on the MXU but keeps f32 solves active-set
    exact.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(H, g, G, h, iters, tol, tau, None)


@functools.partial(jax.jit, static_argnames=("iters", "tol"))
def solve_qp_warm(
    H: jax.Array,
    g: jax.Array,
    G: jax.Array,
    h: jax.Array,
    init: tuple,
    iters: int = 5,
    tol: float = 1e-10,
    tau: float = 0.995,
) -> IPMSolution:
    """Continue the IPM from a given (x, s, z) interior point.

    Used by the mixed-precision path: a cheap f32 solve identifies the active
    set, then a few f64 iterations polish to full accuracy.
    """
    with jax.default_matmul_precision("highest"):
        return _solve_qp_impl(H, g, G, h, iters, tol, tau, init)


def solve_qp_mixed(
    H: jax.Array,
    g: jax.Array,
    G: jax.Array,
    h: jax.Array,
    f32_iters: int = 18,
    f64_iters: int = 5,
) -> IPMSolution:
    """f32 IPM (fast on TPU) + f64 warm-started refinement to ~2e-6.

    The f32 stage costs ~1/29 of an f64 iteration on v5e (f64 is emulated);
    total cost ~ f64_iters/full_f64_iters of a pure f64 solve with the same
    final accuracy.
    """
    f32 = jnp.float32
    sol32 = solve_qp(H.astype(f32), g.astype(f32), G.astype(f32), h.astype(f32),
                     iters=f32_iters)
    f64 = jnp.float64
    # re-center slightly off the boundary so the f64 stage has an interior point
    s0 = jnp.maximum(sol32.s.astype(f64), 1e-8)
    z0 = jnp.maximum(sol32.z.astype(f64), 1e-8)
    return solve_qp_warm(H, g, G, h, (sol32.x.astype(f64), s0, z0), iters=f64_iters)


def _solve_qp_impl(H, g, G, h, iters, tol, tau, init):
    dtype = g.dtype
    n = g.shape[-1]
    m = h.shape[-1]
    In = jnp.eye(n, dtype=dtype)
    # dtype-aware guards: the f64 constants underflow to 0 in f32 and poison
    # d = z/s with inf
    tiny = float(jnp.finfo(dtype).tiny) * 1e8
    d_cap = 1e30 if dtype == jnp.float64 else 1e7  # f64 effectively uncapped

    if init is None:
        x0 = jnp.zeros((n,), dtype)
        s0 = jnp.maximum(h - G @ x0, 1.0)
        z0 = jnp.ones((m,), dtype)
    else:
        x0, s0, z0 = (a.astype(dtype) for a in init)

    # scale-aware convergence thresholds
    h_scale = 1.0 + jnp.max(jnp.abs(h))
    g_scale = 1.0 + jnp.max(jnp.abs(g))

    def body(i, state):
        x, s, z, frozen, first_it = state
        rd = H @ x + g + G.T @ z
        rp = G @ x + s - h
        s_safe = jnp.maximum(s, tiny)
        d = jnp.minimum(z / s_safe, d_cap)
        M = H + (G.T * d) @ G
        # tiny diagonal regularization keeps Cholesky alive for rank-deficient
        # LP normal matrices late in the solve
        reg = 1e-12 * (1.0 + jnp.trace(M) / n)
        # compact batched Cholesky (ops/chol.py) — XLA's blocked cholesky/
        # triangular-solve lowering is compile- and latency-hostile for these
        # tiny KKT systems
        from lbmpc_tpu.ops.chol import chol_batched, solve_tri_lower, solve_tri_upper_t

        L = chol_batched(M + reg * In)

        def kkt_solve(rc):
            rhs = -(rd + G.T @ (d * rp) - G.T @ (rc / s_safe))
            dx = solve_tri_upper_t(L, solve_tri_lower(L, rhs))
            dz = d * (rp + G @ dx) - rc / s_safe
            ds = -rp - G @ dx
            return dx, ds, dz

        mu = jnp.dot(s, z) / m
        # predictor
        rc_aff = s * z
        dx_a, ds_a, dz_a = kkt_solve(rc_aff)
        a_p = _step_length(s, ds_a, 1.0)
        a_d = _step_length(z, dz_a, 1.0)
        mu_aff = jnp.dot(s + a_p * ds_a, z + a_d * dz_a) / m
        sigma = (mu_aff / jnp.maximum(mu, tiny)) ** 3
        # corrector
        rc = s * z + ds_a * dz_a - sigma * mu
        dx, ds, dz = kkt_solve(rc)
        a_p = _step_length(s, ds, tau)
        a_d = _step_length(z, dz, tau)

        x_new = x + a_p * dx
        s_new = s + a_p * ds
        z_new = z + a_d * dz

        tol_eff = max(tol, 30.0 * float(jnp.finfo(dtype).eps))
        done = jnp.logical_and(
            mu < tol_eff * (1.0 + jnp.abs(jnp.dot(s, z))),
            jnp.logical_and(
                jnp.max(jnp.abs(rp)) < tol_eff * h_scale * 1e2,
                jnp.max(jnp.abs(rd)) < tol_eff * g_scale * 1e2,
            ),
        )
        frozen_new = jnp.logical_or(frozen, done)
        first_it = jnp.where(jnp.logical_and(done, ~frozen), i, first_it)
        keep = lambda new, old: jnp.where(frozen, old, new)
        return keep(x_new, x), keep(s_new, s), keep(z_new, z), frozen_new, first_it

    x, s, z, frozen, first_it = jax.lax.fori_loop(
        0, iters, body, (x0, s0, z0, jnp.asarray(False), jnp.asarray(iters))
    )
    rd = H @ x + g + G.T @ z
    rp = G @ x + s - h
    mu = jnp.dot(s, z) / m
    conv_tol = 1e-7 if dtype == jnp.float64 else 2e-4
    converged = jnp.logical_and(
        mu < conv_tol * (1.0 + jnp.abs(jnp.dot(s, z))),
        jnp.max(jnp.abs(rp)) < conv_tol * h_scale,
    )
    # Farkas certificate of primal infeasibility: y >= 0, G'y = 0, h'y < 0
    # proves {x : Gx <= h} empty. On infeasible problems the IPM's duals blow
    # up along such a ray but with wildly uneven magnitudes, so purify first:
    # project the normalized duals onto null(G') — where every certificate
    # lives — clip to >= 0, and verify the Farkas conditions on the result.
    # (The reference has no analog — IPOPT statuses are ignored outright,
    # DMS_LBMPC_casadi.m:174-180; here failed lanes carry a typed reason.)
    cert_tol = 1e-6 if dtype == jnp.float64 else 1e-3
    y = z / jnp.maximum(jnp.max(jnp.abs(z)), tiny)
    GtG = G.T @ G + (1e-12 * (1.0 + jnp.max(jnp.abs(G)) ** 2)) * In
    y = jnp.maximum(y - G @ jnp.linalg.solve(GtG, G.T @ y), 0.0)
    ynorm = jnp.max(jnp.abs(y))
    y = y / jnp.maximum(ynorm, tiny)
    farkas_gap = -jnp.dot(h, y)
    infeasible = jnp.logical_and(
        jnp.logical_and(~converged, ynorm > 0.1),
        jnp.logical_and(
            farkas_gap > cert_tol * h_scale,
            jnp.max(jnp.abs(G.T @ y)) < cert_tol * (1.0 + jnp.max(jnp.abs(G))),
        ),
    )
    return IPMSolution(
        x=x, z=z, s=s, mu=mu,
        primal_res=jnp.max(jnp.abs(rp)),
        dual_res=jnp.max(jnp.abs(rd)),
        converged=converged,
        iters=first_it,
        infeasible=infeasible,
        farkas_gap=farkas_gap,
    )


def solve_qp_batched(H, g, G, h, **kw):
    """vmap over leading batch axis of (H, g, G, h)."""
    return jax.vmap(lambda H_, g_, G_, h_: solve_qp(H_, g_, G_, h_, **kw))(H, g, G, h)


@functools.partial(jax.jit, static_argnames=("iters",))
def support_function(c: jax.Array, F: jax.Array, h: jax.Array, iters: int = 40) -> jax.Array:
    """h_P(c) = max_x c'x s.t. Fx <= h — the polytope support function.

    The workhorse of the set layer (ref: utilities/pdiff.m:10-17 calls one
    linprog per constraint row; here rows batch on device via vmap over c).
    """
    n = c.shape[-1]
    H = jnp.zeros((n, n), c.dtype)
    sol = solve_qp(H, -c, F, h, iters=iters)
    return jnp.dot(c, sol.x)


def support_function_batched(C: jax.Array, F: jax.Array, h: jax.Array, iters: int = 40):
    """Support function for a batch of directions C (k, n) over one polytope."""
    return jax.vmap(lambda c: support_function(c, F, h, iters=iters))(C)
