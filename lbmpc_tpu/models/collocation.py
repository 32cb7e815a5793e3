"""Orthogonal collocation: degree-d Legendre collocation over one step.

The reference's fourth transcription scheme (ref:
examples/collocation_regular_NMPC_test.m:11-46 builds the C/D/B coefficient
matrices for degree-3 Legendre collocation and lifts the collocation states
into the NLP). TPU-first version: the same coefficients drive an implicit
collocation *integrator* — the per-step collocation equations are solved by a
fixed number of Newton iterations inside jit, so the step is usable both as a
plant-accurate integrator and as the prediction model of an NMPC whose
residuals/jacobians come from autodiff.

Coefficient construction follows the classic Lagrange-polynomial recipe: for
collocation points 0 = tau_0 < tau_1 < ... < tau_d,
  C[j, r] = dL_j/dt (tau_r)   (derivative of basis j at point r)
  D[j]    = L_j(1)            (end-of-interval extrapolation)
  B[j]    = int_0^1 L_j       (quadrature weights)
"""

from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.models.mgcm import mgcm_ode


@functools.lru_cache(maxsize=None)
def legendre_coeffs(d: int = 3):
    """Collocation coefficient matrices (C, D, B) for Gauss-Legendre points.

    Returns C (d+1, d+1), D (d+1,), B (d+1,) as float64 numpy arrays.
    Ref: collocation_regular_NMPC_test.m:11-46 (same construction via CasADi's
    collocation_points; here the shifted-Legendre roots come from numpy).
    """
    # shifted Gauss-Legendre points on (0, 1]
    pts, _ = np.polynomial.legendre.leggauss(d)
    tau = np.concatenate([[0.0], (pts + 1.0) / 2.0])
    C = np.zeros((d + 1, d + 1))
    D = np.zeros(d + 1)
    B = np.zeros(d + 1)
    for j in range(d + 1):
        # Lagrange basis polynomial j
        p = np.poly1d([1.0])
        for r in range(d + 1):
            if r != j:
                p *= np.poly1d([1.0, -tau[r]]) / (tau[j] - tau[r])
        D[j] = p(1.0)
        dp = np.polyder(p)
        for r in range(d + 1):
            C[j, r] = dp(tau[r])
        B[j] = np.polyint(p)(1.0)
    return C, D, B


def collocation_step(
    x: jax.Array,
    u: jax.Array,
    dt: float,
    degree: int = 3,
    newton_iters: int = 3,
    ode=mgcm_ode,
) -> jax.Array:
    """One implicit collocation step of x' = f(x, u) over dt.

    Solves the collocation equations
        sum_j C[j, r] X_j = dt * f(X_r, u),   r = 1..d,   X_0 = x
    for the collocation states X_1..X_d by damped Newton (fixed iterations,
    jacfwd Jacobian — jit/vmap friendly), then extrapolates x+ = sum_j D_j X_j.
    A-stable: handles the stiff throttle mode at large dt where RK4 diverges.
    """
    C, D, _ = legendre_coeffs(degree)
    Cj = jnp.asarray(C, x.dtype)
    Dj = jnp.asarray(D, x.dtype)
    n = x.shape[-1]
    d = degree

    def residual(Xc):
        # Xc: (d, n) collocation states X_1..X_d
        Xall = jnp.concatenate([x[None, :], Xc], axis=0)        # (d+1, n)
        res = []
        for r in range(1, d + 1):
            xp = jnp.einsum("j,jn->n", Cj[:, r], Xall)
            res.append(xp - dt * ode(Xc[r - 1], u))
        return jnp.stack(res)                                    # (d, n)

    X0 = jnp.broadcast_to(x, (d, n))

    def newton(Xc, _):
        r = residual(Xc).reshape(-1)
        J = jax.jacfwd(lambda Z: residual(Z.reshape(d, n)).reshape(-1))(Xc.reshape(-1))
        step = jnp.linalg.solve(J, r)
        return (Xc.reshape(-1) - step).reshape(d, n), None

    Xc, _ = jax.lax.scan(newton, X0, None, length=newton_iters)
    Xall = jnp.concatenate([x[None, :], Xc], axis=0)
    return jnp.einsum("j,jn->n", Dj, Xall)
