"""Riccati layer: DARE doubling, sequential vs parallel LQ factorization."""

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.models.mgcm import mgcm_dlti
from lbmpc_tpu.ops.riccati import dare_doubling, lqr_backward, lqr_parallel
from lbmpc_tpu.synthesis import dare


def test_dare_doubling_matches_scipy():
    Ad, Bd, _, _ = mgcm_dlti()
    X = np.asarray(dare_doubling(jnp.asarray(Ad), jnp.asarray(Bd), jnp.eye(4), jnp.eye(1)))
    X_ref = dare(Ad, Bd, np.eye(4), np.eye(1))
    np.testing.assert_allclose(X, X_ref, rtol=1e-9)


def _dense_lq_solution(A, B, Q, R, P, x0, q, r, c, N):
    """Reference: solve the LQ problem as one dense KKT system in numpy."""
    n, m = B.shape
    nv = N * m
    # condensed: x_k = Sx_k x0 + Su_k U + Sc_k (affine from c)
    Sx = [np.eye(n)]
    for _ in range(N):
        Sx.append(A @ Sx[-1])
    Su = np.zeros((N + 1, n, nv))
    Sc = np.zeros((N + 1, n))
    for k in range(1, N + 1):
        Su[k] = A @ Su[k - 1]
        Su[k][:, (k - 1) * m : k * m] = B
        Sc[k] = A @ Sc[k - 1] + c[k - 1]
    H = np.zeros((nv, nv))
    g = np.zeros(nv)
    for k in range(N):
        xk_c = Sx[k] @ x0 + Sc[k]
        H += Su[k].T @ Q @ Su[k]
        g += Su[k].T @ (Q @ xk_c + q[k])
        E = np.zeros((m, nv))
        E[:, k * m : (k + 1) * m] = np.eye(m)
        H += E.T @ R @ E
        g += E.T @ r[k]
    xN_c = Sx[N] @ x0 + Sc[N]
    H += Su[N].T @ P @ Su[N]
    g += Su[N].T @ (P @ xN_c)
    U = np.linalg.solve(H, -g).reshape(N, m)
    return U


def test_sequential_riccati_matches_dense():
    rng = np.random.default_rng(0)
    n, m, N = 4, 2, 12
    A = 0.9 * np.eye(n) + 0.1 * rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    Q = np.eye(n)
    R = np.eye(m)
    P = 5 * np.eye(n)
    x0 = rng.standard_normal(n)
    q = 0.1 * rng.standard_normal((N, n))
    r = 0.1 * rng.standard_normal((N, m))
    c = 0.05 * rng.standard_normal((N, n))
    sol = lqr_backward(*map(jnp.asarray, (A, B, Q, R, P, x0)),
                       q=jnp.asarray(q), r=jnp.asarray(r), c=jnp.asarray(c))
    U_ref = _dense_lq_solution(A, B, Q, R, P, x0, q, r, c, N)
    np.testing.assert_allclose(np.asarray(sol.U), U_ref, atol=1e-8)
    # dynamics consistency
    X = np.asarray(sol.X)
    for k in range(N):
        np.testing.assert_allclose(
            X[k + 1], A @ X[k] + B @ np.asarray(sol.U)[k] + c[k], atol=1e-10
        )


def test_parallel_riccati_matches_sequential():
    rng = np.random.default_rng(1)
    n, m, N = 4, 1, 64
    A = 0.95 * np.eye(n) + 0.05 * rng.standard_normal((n, n))
    B = rng.standard_normal((n, m))
    Q = np.eye(n)
    R = np.eye(m)
    P = 3 * np.eye(n)
    x0 = rng.standard_normal(n)
    q = 0.1 * rng.standard_normal((N, n))
    r = 0.1 * rng.standard_normal((N, m))
    c = 0.02 * rng.standard_normal((N, n))
    args = list(map(jnp.asarray, (A, B, Q, R, P, x0)))
    kw = dict(q=jnp.asarray(q), r=jnp.asarray(r), c=jnp.asarray(c))
    seq = lqr_backward(*args, **kw)
    par = lqr_parallel(*args, **kw)
    np.testing.assert_allclose(np.asarray(par.U), np.asarray(seq.U), atol=1e-7)
    np.testing.assert_allclose(np.asarray(par.X), np.asarray(seq.X), atol=1e-7)
    np.testing.assert_allclose(np.asarray(par.V[0]), np.asarray(seq.V[0]), atol=1e-6)


def test_riccati_converges_to_dare():
    """Finite-horizon V_0 -> DARE solution as N grows (stabilizable system)."""
    Ad, Bd, _, _ = mgcm_dlti()
    N = 2000
    sol = lqr_backward(
        jnp.asarray(Ad), jnp.asarray(Bd), jnp.eye(4), jnp.eye(1), jnp.eye(4),
        jnp.zeros(4), q=jnp.zeros((N, 4)), r=jnp.zeros((N, 1)), c=jnp.zeros((N, 4)),
    )
    X_inf = dare(Ad, Bd, np.eye(4), np.eye(1))
    # convergence rate is |lambda_cl|^{2N}; the slow closed-loop pole of the
    # MGCM LQR is ~0.996, so expect ~1e-4 relative at N=2000
    np.testing.assert_allclose(np.asarray(sol.V[0]), X_inf, rtol=5e-3)
