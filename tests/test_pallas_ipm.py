"""Fused Pallas IPM kernel — interpret-mode correctness (CPU CI).

Real-chip throughput is measured by bench scripts; here the kernel's math is
validated against the XLA IPM on the actual MPC QP and on random problems.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.ops.ipm import solve_qp
from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver


def test_pallas_kernel_matches_ipm_random():
    rng = np.random.default_rng(0)
    n, m = 6, 10
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    G = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((m, n))])
    hb = np.concatenate([np.full(2 * n, 5.0), rng.uniform(1, 3, m)])
    B = 128
    gs = rng.standard_normal((B, n))
    hs = np.tile(hb, (B, 1)) + 0.05 * rng.uniform(0, 1, (B, 2 * n + m))
    solver = build_pallas_qp_solver(H, G, iters=18, tile=128, interpret=True)
    x_pl, conv = solver(jnp.asarray(gs), jnp.asarray(hs))
    assert bool(np.asarray(conv).all())
    for i in range(6):
        ref = np.asarray(
            solve_qp(jnp.asarray(H), jnp.asarray(gs[i]), jnp.asarray(G),
                     jnp.asarray(hs[i]), iters=30).x
        )
        np.testing.assert_allclose(np.asarray(x_pl)[i], ref, atol=1e-5)


def test_pallas_kernel_on_mpc_qp():
    """The real N=20 LMPC QP (806 rows, 616-row terminal set)."""
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.sets.terminal import get_cons
    from lbmpc_tpu.synthesis import mat_ocp

    Ad, Bd, C, _ = mgcm_dlti()
    ocp = mat_ocp(Ad, Bd, C)
    cs = get_cons(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=Ad, B=Bd, K=ocp.Ks, LAMBDA=ocp.LAMBDA, PSI=ocp.PSI,
        LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0, cache=True,
    )
    qp = build_fmincon_lmpc(Ad, Bd, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20)
    rng = np.random.default_rng(1)
    B = 128
    dxs = np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((B, 4))
    g = (qp.Gg @ dxs.T).T + qp.g0
    h = qp.h0 + (qp.Hp @ dxs.T).T
    solver = build_pallas_qp_solver(qp.H, qp.G, iters=20, tile=128, interpret=True)
    x_pl, conv = solver(jnp.asarray(g), jnp.asarray(h))
    assert float(np.asarray(conv).mean()) > 0.95
    for i in range(4):
        ref = np.asarray(
            solve_qp(jnp.asarray(qp.H), jnp.asarray(g[i]), jnp.asarray(qp.G),
                     jnp.asarray(h[i]), iters=30).x
        )
        # f32 kernel vs f64 reference: control-relevant head of z
        np.testing.assert_allclose(np.asarray(x_pl)[i][:1], ref[:1], atol=5e-4)
