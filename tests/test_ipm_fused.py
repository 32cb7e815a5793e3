"""Hybrid fused batch IPM (XLA matmuls + Pallas KKT solves) — interpret CI."""

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.ops.ipm import solve_qp
from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver
from lbmpc_tpu.ops.pallas_chol import chol_factor_solve, chol_resolve


def test_pallas_chol_kernels_match_numpy():
    rng = np.random.default_rng(0)
    B, n = 512, 21
    A = rng.standard_normal((B, n, n))
    M = (A @ np.swapaxes(A, 1, 2) + n * np.eye(n)).astype(np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    L_flat, x = chol_factor_solve(jnp.asarray(M), jnp.asarray(b), tile=512,
                                  interpret=True)
    x_ref = np.linalg.solve(M.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), x_ref, atol=2e-3)
    # resolve path with a second RHS
    b2 = rng.standard_normal((B, n)).astype(np.float32)
    x2 = chol_resolve(L_flat, jnp.asarray(b2), n, tile=512, interpret=True)
    x2_ref = np.linalg.solve(M.astype(np.float64), b2.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x2), x2_ref, atol=2e-3)


def test_fused_batch_ipm_matches_reference():
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.sets.terminal import get_cons
    from lbmpc_tpu.synthesis import mat_ocp

    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, K=ocp.Ks, LAMBDA=ocp.LAMBDA, PSI=ocp.PSI,
        LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0, cache=True,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20)
    rng = np.random.default_rng(0)
    batch = 512
    dxs = np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4))
    g = (qp.Gg @ dxs.T).T + qp.g0
    h = qp.h0 + (qp.Hp @ dxs.T).T
    solver = build_fused_qp_solver(qp.H, qp.G, iters=20, tile=512, interpret=True)
    out = solver(jnp.asarray(g), jnp.asarray(h))
    assert float(np.asarray(out.converged).mean()) > 0.9
    for i in range(6):
        ref = np.asarray(solve_qp(jnp.asarray(qp.H), jnp.asarray(g[i]),
                                  jnp.asarray(qp.G), jnp.asarray(h[i]), iters=30).x)
        # f32-class accuracy on the control-relevant head
        assert abs(float(np.asarray(out.x)[i, 0]) - ref[0]) < 5e-3


def test_fused_infeasibility_certificate():
    """Fused batch IPM flags the infeasible lane via the Farkas test."""
    import jax.numpy as jnp

    from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver

    G = np.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]])
    H = np.eye(2)
    solver = build_fused_qp_solver(H, G, iters=30, tile=128, interpret=True)
    g = jnp.zeros((3, 2))
    h = jnp.asarray(np.array([
        [1.0, 1.0, 1.0, 1.0],
        [-1.0, -1.0, 1.0, 1.0],   # infeasible lane
        [2.0, 0.5, 1.0, 1.0],
    ]))
    sol = solver(g, h)
    assert np.asarray(sol.infeasible).tolist() == [False, True, False]
    assert np.asarray(sol.converged).tolist() == [True, False, True]
