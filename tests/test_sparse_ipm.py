"""Sparse (Riccati) IPM vs the condensed dense IPM — same optimum, stage form."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.controllers.condensed import build_casadi_dms
from lbmpc_tpu.models.mgcm import TS, mgcm_dlti
from lbmpc_tpu.ops.ipm import solve_qp
from lbmpc_tpu.ops.sparse_ipm import make_stage_qp, solve_sparse
from lbmpc_tpu.sets.terminal import get_cons
from lbmpc_tpu.synthesis import mat_ocp


@pytest.fixture(scope="module")
def problem():
    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, K=ocp.Ks, LAMBDA=ocp.LAMBDA, PSI=ocp.PSI,
        LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0, cache=True,
    )
    return A, B, ocp, cs


@pytest.mark.parametrize("N,tol", [(30, 1e-9), (100, 1e-5)])
def test_sparse_matches_condensed(problem, N, tol):
    A, B, ocp, cs = problem
    qpc = build_casadi_dms(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
                           cs, N, delta=TS, terminal_at="last", tighten_first_step=False)
    sqp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
                        cs, N, delta=TS)
    dx0 = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    g = jnp.asarray(qpc.Gg) @ dx0 + jnp.asarray(qpc.g0)
    h = jnp.asarray(qpc.h0) + jnp.asarray(qpc.Hp) @ dx0
    dense = solve_qp(jnp.asarray(qpc.H), g, jnp.asarray(qpc.G), h, iters=40)
    sp = solve_sparse(sqp, dx0, iters=30)
    assert bool(sp.converged)
    assert float(sp.max_violation) < 1e-8
    np.testing.assert_allclose(
        np.asarray(sp.U).ravel(), np.asarray(dense.x)[:N], atol=tol
    )
    np.testing.assert_allclose(
        np.asarray(sp.theta), np.asarray(dense.x)[N:], atol=tol
    )


def test_sparse_parallel_matches_sequential(problem):
    A, B, ocp, cs = problem
    N = 100
    sqp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
                        cs, N, delta=TS)
    dx0 = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    seq = solve_sparse(sqp, dx0, iters=25, parallel=False)
    par = solve_sparse(sqp, dx0, iters=25, parallel=True)
    assert bool(par.converged)
    np.testing.assert_allclose(np.asarray(par.U), np.asarray(seq.U), atol=1e-9)


def test_sparse_long_horizon(problem):
    """N=300: the regime where condensing loses to the Riccati factorization."""
    A, B, ocp, cs = problem
    sqp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
                        cs, 300, delta=TS)
    sp = solve_sparse(sqp, jnp.asarray([-0.35, -0.4, 0.0, 0.0]), iters=30)
    assert bool(sp.converged)
    assert float(sp.max_violation) < 1e-8


def test_sparse_dynamics_consistency(problem):
    A, B, ocp, cs = problem
    N = 40
    sqp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
                        cs, N, delta=TS)
    dx0 = jnp.asarray([-0.2, -0.3, 0.0, 0.0])
    sp = solve_sparse(sqp, dx0, iters=25)
    X = np.asarray(sp.X)
    U = np.asarray(sp.U)
    for k in range(N):
        np.testing.assert_allclose(X[k + 1], A @ X[k] + B @ U[k], atol=1e-10)
    np.testing.assert_allclose(X[0], np.asarray(dx0))


def test_sparse_float32_converges(problem):
    """f32 throughput grade (TPU path): the dtype-aware guards (tiny floor,
    d-cap, converged-freeze — ops/sparse_ipm.py body) must keep the f32 solve
    nan-free and active-set-exact vs f64 to ~1e-4."""
    A, B, ocp, cs = problem
    for N in (20, 100):
        sqp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA,
                            ocp.PSI, cs, N, delta=TS)
        s32 = jax.tree.map(
            lambda x: x.astype(jnp.float32)
            if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
            else x, sqp)
        dx0 = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
        ref = solve_sparse(sqp, dx0, iters=25)
        with jax.default_matmul_precision("highest"):
            sol = solve_sparse(s32, dx0.astype(jnp.float32), iters=25)
        assert bool(sol.converged), (float(sol.mu), float(sol.max_violation))
        assert np.isfinite(np.asarray(sol.U)).all()
        np.testing.assert_allclose(np.asarray(sol.U[0]), np.asarray(ref.U[0]),
                                   atol=2e-4)


def test_scenario_sparse_backend_matches_condensed():
    """qp_backend="sparse"/"sparse_parallel" (config.SolverConfig) runs the
    casadi-family tracking LMPC closed loop on the stage-form Riccati IPM and
    must reproduce the condensed-backend episode."""
    import dataclasses

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario

    cfg = make_preset("DMS_LMPC")
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=30),
                              iterations=40)
    ref = build_scenario(cfg).run()
    for backend in ("sparse", "sparse_parallel"):
        cfg_s = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, qp_backend=backend))
        sp = build_scenario(cfg_s).run()
        assert float(np.mean(np.asarray(sp.solver_converged))) == 1.0
        np.testing.assert_allclose(
            np.asarray(sp.sys_history), np.asarray(ref.sys_history), atol=1e-6)
