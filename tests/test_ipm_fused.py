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


def test_chol_vmem_grant_and_tile_caps():
    """r4 raised-scoped-VMEM mechanism (ops/pallas_chol.py): at the DMS
    flagship shape (nz=101 -> n_p=104) the factor-store path must be
    feasible AT TILE 128 — the on-chip A/B (scripts/bench_dms_flagship.py
    cholstore) measured tile 128 fastest (51.9 ms/step; tile 256 was the
    recorded negative: 58-64 ms) — and the grants must stay well under the
    128M physical VMEM. Small shapes (fmincon nz=24) must be untouched:
    default 16M limit, no grant."""
    from lbmpc_tpu.ops.pallas_chol import (_tile_cap, _vlim_raise,
                                           factor_store_feasible)
    assert factor_store_feasible(101)
    n_p = 104
    assert _tile_cap(n_p, 256, 2) == 128          # factor: M in + L out
    assert _tile_cap(n_p, 256, 1) == 128          # solve/resolve: one block
    for blocks in (1, 2):
        v = _vlim_raise(n_p * n_p, n_p, 128, blocks)
        assert 16 * 2**20 < v < 64 * 2**20, v
    # fmincon shape: within the default limit, no grant, full tile
    assert _tile_cap(24, 512, 2) == 512
    assert _vlim_raise(24 * 24, 24, 512, 2) == 0
    # env escape for A/Bs
    import os
    os.environ["LBMPC_CHOL_STORE"] = "0"
    try:
        assert not factor_store_feasible(101)
    finally:
        del os.environ["LBMPC_CHOL_STORE"]


def test_chol_store_matches_refactor_large_nz():
    """Factor-store (chol_factor_solve + chol_resolve) == refactor
    (chol_solve) at a shape ABOVE the old 14M feasibility cut, interpret
    mode. Guards the r4 default flip at the DMS shape class (n here is
    kept moderate so the unrolled-kernel trace stays CI-cheap)."""
    from lbmpc_tpu.ops.pallas_chol import chol_solve
    rng = np.random.default_rng(1)
    B, n = 256, 77  # n_p=80: blocks=2 need 15.9M > 14M -> raised-grant path
    A = rng.standard_normal((B, n, n))
    M = (A @ np.swapaxes(A, 1, 2) + n * np.eye(n)).astype(np.float32)
    b = rng.standard_normal((B, n)).astype(np.float32)
    b2 = rng.standard_normal((B, n)).astype(np.float32)
    L_flat, x = chol_factor_solve(jnp.asarray(M), jnp.asarray(b), tile=128,
                                  interpret=True)
    x2 = chol_resolve(L_flat, jnp.asarray(b2), n, tile=128, interpret=True)
    xr = chol_solve(jnp.asarray(M), jnp.asarray(b), tile=128, interpret=True)
    x2r = chol_solve(jnp.asarray(M), jnp.asarray(b2), tile=128, interpret=True)
    # same math either route; interpret-mode XLA:CPU may contract the two
    # kernels' identical sequences with different FMA fusion -> ~1e-9 noise
    np.testing.assert_allclose(np.asarray(x), np.asarray(xr), atol=1e-7)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x2r), atol=1e-7)
    ref = np.linalg.solve(M.astype(np.float64), b.astype(np.float64)[..., None])[..., 0]
    np.testing.assert_allclose(np.asarray(x), ref, atol=2e-3)


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
