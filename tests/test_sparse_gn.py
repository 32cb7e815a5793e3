"""Stage-form (Riccati) LBMPC SQP subproblems vs the condensed path.

VERDICT r1 item 5: qp_backend='sparse' for LBMPC presets. The stage solver
(ops/sparse_gn.py) must reproduce the condensed GN subproblem exactly (same
QP, different factorization) and the closed loop must match the condensed
episode. Ref: the lifted DMS NLPs (examples/DMS_LBMPC_casadi.m:122-130) are
the reference analog of the stage form.
"""

import dataclasses

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
from lbmpc_tpu.controllers.lbmpc import (LBMPCWeights, make_residual_and_jac)
from lbmpc_tpu.oracle import init_window, make_xi, nw_estimate_and_jac
from lbmpc_tpu.ops.ipm import solve_qp
from lbmpc_tpu.ops.sparse_gn import make_stage_gn, solve_sparse_gn
from lbmpc_tpu.runtime.scenario import build_scenario


def _setup(N=12):
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=N))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.zeros(4), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    return cfg, sc, qp, w


def _rand_window(rng, q=100):
    win = init_window(q)
    return type(win)(
        X=jnp.asarray(0.1 * rng.standard_normal((q, 3))),
        Y=jnp.asarray(0.001 * rng.standard_normal((q, 4))),
        valid=jnp.ones(q), count=jnp.asarray(q, jnp.int32))


@pytest.mark.parametrize("zscale", [0.0, 0.01])
def test_stage_gn_step_matches_condensed_qp(zscale):
    """The stage Riccati IPM and the dense condensed IPM solve the SAME GN
    subproblem: steps must agree to solver tolerance, at the zero iterate
    (tightened + terminal rows active from dx0 = (-0.35,-0.4,0,0)) and at a
    perturbed iterate."""
    N = 12
    cfg, sc, qp, w = _setup(N)
    rng = np.random.default_rng(0)
    win = _rand_window(rng)
    dx0 = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    z_bar = jnp.asarray(zscale * rng.standard_normal(qp.nz))

    residual, res_jac = make_residual_and_jac(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=0.5, ridge=0.001, dx_ref=np.zeros(4))
    e, J = res_jac(z_bar, dx0, win)
    H = 2.0 * J.T @ J + 1e-9 * jnp.eye(qp.nz)
    g = 2.0 * (J.T @ e)
    G = jnp.asarray(qp.G)
    h = jnp.asarray(qp.h0) + jnp.asarray(qp.Hp) @ dx0
    sol_dense = solve_qp(H, g, G, h - G @ z_bar, iters=40)
    assert bool(sol_dense.converged)

    sg = make_stage_gn(sc.A, sc.B, sc.ocp.Ks,
                       np.asarray(w.Lq).T @ np.asarray(w.Lq),
                       np.asarray(w.Lr).T @ np.asarray(w.Lr),
                       np.asarray(w.Lp).T @ np.asarray(w.Lp),
                       float(w.sqrtT) ** 2, w.LAMBDA, w.PSI, sc.cs, N,
                       cfg.plant.ts, family="fmincon",
                       terminal_at=cfg.ocp.terminal_at,
                       tighten_first_step=cfg.ocp.tighten_first_step)
    Ad, Bd = jnp.asarray(sc.A), jnp.asarray(sc.B)
    Ksd = jnp.asarray(np.atleast_2d(sc.ocp.Ks))
    An = Ad + Bd @ Ksd
    LAM, PSI = jnp.asarray(w.LAMBDA), jnp.asarray(w.PSI)
    Exl = jnp.concatenate([jnp.eye(2, 4), Ksd], axis=0)
    cvals = z_bar[:N].reshape(N, 1)
    theta = z_bar[N:]

    def lstep(xl, c):
        u = Ksd @ xl + c
        gv, Jg = nw_estimate_and_jac(make_xi(xl, u), win, 0.5, 0.001)
        return Ad @ xl + Bd @ u + gv, (An + Jg @ Exl, Bd + Jg[:, 2:3], xl, u)

    xlN, (Als, Bls, xls, us) = jax.lax.scan(lstep, dx0, cvals)
    _, xns = jax.lax.scan(lambda x, c: (An @ x + Bd @ c,) * 2, dx0, cvals)
    xn_all = jnp.concatenate([dx0[None], xns])
    ex = xls - (LAM @ theta)[None, :]
    eu = us - (PSI @ theta)[None, :]
    eN = xlN - LAM @ theta
    cm = sg.cost_mask[:, None]
    q_xl = jnp.concatenate(
        [cm * (ex @ sg.Qb.T + eu @ (sg.Ks.T @ sg.Rb).T),
         (sg.Pb @ eN)[None, :]])
    r_c = cm * (eu @ sg.Rb.T)
    g_th = (-LAM.T @ (sg.Qb @ (ex * cm).sum(0))
            - PSI.T @ (sg.Rb @ (eu * cm).sum(0))
            - LAM.T @ (sg.Pb @ eN) + sg.TLL @ theta)
    hx_t = sg.h_x[None, :] - xn_all[1:] @ sg.F_x.T
    hu_t = sg.h_u[None, :] - (cvals + xn_all[:N] @ Ksd.T) @ sg.F_u.T
    hd_t = sg.h_d - sg.F_d @ xn_all[1]
    hw_t = sg.h_w - sg.Fw_x @ xn_all[sg.kT] - sg.Fw_th @ theta
    sol_sp = solve_sparse_gn(sg, Als, Bls, q_xl, r_c, g_th,
                             hx_t, hu_t, hd_t, hw_t, iters=40)
    assert bool(sol_sp.converged)
    d_sp = np.concatenate([np.asarray(sol_sp.dC).ravel(),
                           np.asarray(sol_sp.dth)])
    np.testing.assert_allclose(d_sp, np.asarray(sol_dense.x), atol=2e-6)


def test_sparse_lbmpc_episode_matches_condensed():
    """qp_backend='sparse' closed loop == condensed closed loop (fmincon
    family; constraints active through the transient)."""
    cfg = make_preset("LBMPC_N20", iterations=60)
    r_c = build_scenario(cfg).run()
    cfg_s = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, qp_backend="sparse",
                                        ipm_iters=30))
    r_s = build_scenario(cfg_s).run()
    assert bool(r_s.solver_converged.all())
    d = np.abs(np.asarray(r_s.sys_history) - np.asarray(r_c.sys_history))
    assert d.max() < 1e-6


def test_sparse_lbmpc_casadi_family_episode_matches_condensed():
    """Casadi family (the N=100 flagship structure: dual trajectory,
    tightened first step, terminal at x_1) at reduced N."""
    cfg = make_preset("DMS_LBMPC_q100", iterations=40)
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=30))
    r_c = build_scenario(cfg).run()
    cfg_s = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, qp_backend="sparse",
                                        ipm_iters=30))
    r_s = build_scenario(cfg_s).run()
    assert bool(r_s.solver_converged.all())
    d = np.abs(np.asarray(r_s.sys_history) - np.asarray(r_c.sys_history))
    assert d.max() < 1e-4


def test_sparse_lbmpc_no_tightened_rows_episode_matches_condensed():
    """md=0 regression (ADVICE r2): with tighten_first_step=False the
    tightened first-step group is empty ((0,n) F_d) and the IPM steplength
    must skip the zero-size slack/dual pair instead of crashing at trace
    time (jnp.min over an empty ratio array)."""
    cfg = make_preset("LBMPC_N20", iterations=30)
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, tighten_first_step=False))
    r_c = build_scenario(cfg).run()
    cfg_s = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, qp_backend="sparse",
                                        ipm_iters=30))
    r_s = build_scenario(cfg_s).run()
    assert bool(r_s.solver_converged.all())
    d = np.abs(np.asarray(r_s.sys_history) - np.asarray(r_c.sys_history))
    assert d.max() < 1e-6


def test_sparse_parallel_rejected_for_lbmpc():
    """The associative-scan variant has no cross-term support and crashed
    the TPU worker at batch 1024 x N=100 (ROADMAP item 4): no selectable
    config may reach it from the LBMPC path."""
    cfg = make_preset("LBMPC_N20")
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver,
                                        qp_backend="sparse_parallel"))
    with pytest.raises(ValueError):
        build_scenario(cfg)


def test_sparse_rejected_for_nmpc():
    cfg = make_preset("NMPC_N20")
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, qp_backend="sparse"))
    with pytest.raises(ValueError):
        build_scenario(cfg)


def test_stage_sharded_gn_matches_unsharded_N300():
    """Stage-sharded ("SP") GN subproblem == unsharded at N=300 (VERDICT r3
    item 4): the full stage-form Mehrotra IPM with its Riccati sweeps run as
    distributed multi-RHS element scans over an 8-device 'stage' mesh
    (ops/riccati_sharded) must reproduce the single-device factor/solve
    path. Casadi-family flagship structure (dual trajectory, tightened first
    step, terminal at x_1); N=300 is NOT divisible by 8 — exercises the
    identity-stage padding."""
    from lbmpc_tpu.ops.riccati_sharded import stage_mesh

    N = 300
    cfg = make_preset("DMS_LBMPC_q100")
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=N))
    sc = build_scenario(cfg)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    rng = np.random.default_rng(3)
    win = _rand_window(rng, q=32)
    x_wp = np.asarray(cfg.plant.x_wp)
    dx0 = jnp.asarray(np.asarray(cfg.x_init_abs) - x_wp)

    sg = make_stage_gn(sc.A, sc.B, np.zeros((1, 4)),
                       np.asarray(w.Lq).T @ np.asarray(w.Lq),
                       np.asarray(w.Lr).T @ np.asarray(w.Lr),
                       np.asarray(w.Lp).T @ np.asarray(w.Lp),
                       float(w.sqrtT) ** 2, w.LAMBDA, w.PSI, sc.cs, N,
                       cfg.plant.ts, family="casadi",
                       terminal_at=cfg.ocp.terminal_at,
                       tighten_first_step=cfg.ocp.tighten_first_step)
    Ad, Bd = jnp.asarray(sc.A), jnp.asarray(sc.B)
    Ksd = jnp.zeros((1, 4))
    LAM, PSI = jnp.asarray(w.LAMBDA), jnp.asarray(w.PSI)
    Exl = jnp.concatenate([jnp.eye(2, 4), Ksd], axis=0)
    cvals = jnp.asarray(0.005 * rng.standard_normal((N, 1)))
    theta = jnp.asarray(0.01 * rng.standard_normal(1))

    def lstep(xl, c):
        u = c
        gv, Jg = nw_estimate_and_jac(make_xi(xl, u), win, 0.5, 0.001)
        return Ad @ xl + Bd @ u + gv, (Ad + Jg @ Exl, Bd + Jg[:, 2:3], xl, u)

    xlN, (Als, Bls, xls, us) = jax.lax.scan(lstep, dx0, cvals)
    _, xns = jax.lax.scan(lambda x, c: (Ad @ x + Bd @ c,) * 2, dx0, cvals)
    xn_all = jnp.concatenate([dx0[None], xns])
    ex = xls - (LAM @ theta)[None, :]
    eu = us - (PSI @ theta)[None, :]
    eN = xlN - LAM @ theta
    cm = sg.cost_mask[:, None]
    q_xl = jnp.concatenate(
        [cm * (ex @ sg.Qb.T + eu @ (sg.Ks.T @ sg.Rb).T),
         (sg.Pb @ eN)[None, :]])
    r_c = cm * (eu @ sg.Rb.T)
    g_th = (-LAM.T @ (sg.Qb @ (ex * cm).sum(0))
            - PSI.T @ (sg.Rb @ (eu * cm).sum(0))
            - LAM.T @ (sg.Pb @ eN) + sg.TLL @ theta)
    hx_t = sg.h_x[None, :] - xn_all[1:] @ sg.F_x.T
    hu_t = sg.h_u[None, :] - (cvals + xn_all[:N] @ Ksd.T) @ sg.F_u.T
    hd_t = sg.h_d - sg.F_d @ xn_all[1]
    hw_t = sg.h_w - sg.Fw_x @ xn_all[sg.kT] - sg.Fw_th @ theta
    args = (Als, Bls, q_xl, r_c, g_th, hx_t, hu_t, hd_t, hw_t)
    sol_un = solve_sparse_gn(sg, *args, iters=25)
    sol_sh = solve_sparse_gn(sg, *args, iters=25, mesh=stage_mesh(8))
    assert bool(sol_un.converged) and bool(sol_sh.converged)
    scale = float(np.abs(np.asarray(sol_un.dC)).max()) + 1.0
    d = np.abs(np.asarray(sol_sh.dC) - np.asarray(sol_un.dC)).max()
    dth = np.abs(np.asarray(sol_sh.dth) - np.asarray(sol_un.dth)).max()
    assert d < 1e-7 * scale, d
    assert dth < 1e-7 * scale, dth
