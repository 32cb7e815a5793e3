"""Closed-loop and pointwise parity vs the reference golden trajectories.

Parity philosophy (documented by experiment):
  - Pointwise (same state in -> control out), our solvers match an independent
    high-accuracy solver to ~1e-8 and the goldens to the reference solvers'
    own tolerance (fmincon ~1e-6, IPOPT acceptable-level ~1e-4 at hard
    active-set instances — verified: scipy agrees with us, not with IPOPT).
  - Closed loop, tiny per-step differences get transiently amplified at
    active-set switching steps (the control law is discontinuous-derivative
    there), dominantly in the fast throttle-rate state x4. Slow states track
    tightly throughout; trajectories re-converge after transients.
"""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.scenario import build_scenario

RUN_SLOW = bool(os.environ.get("RUN_SLOW"))


def test_lmpc_pointwise_control_parity(golden):
    """Feed every golden state into our LMPC QP; du must match the golden
    input sequence within fmincon's tolerance envelope."""
    sc = build_scenario(make_preset("LMPC_N50"))
    g = golden("LMPC_N50")["sysH"]  # (5, 1001), col k = [dx_k; du_{k-1}]
    dxs = jnp.asarray(g[:4, :-1].T)            # states dx_0..dx_999
    du_gold = g[4, 1:]                          # du_0..du_999
    Ks = jnp.asarray(sc.ocp.Ks)

    nth = np.asarray(sc.ocp.LAMBDA).shape[1]

    def du_of(dx):
        z, conv = sc.solve(dx, None, None)
        return (Ks @ dx + z[:1])[0], z[-nth:], conv

    du, th, conv = jax.vmap(du_of)(dxs)
    err = np.abs(np.asarray(du) - du_gold)
    assert bool(jnp.all(conv))
    assert np.median(err) < 2e-6
    assert err.max() < 5e-4  # few active-set-boundary steps carry fmincon noise
    assert (err > 1e-4).sum() < 10
    # theta channel pointwise (VERDICT r2 item 4a): artificial reference
    # Lambda(1:m,:)*theta at every golden state vs art_refH (ref:
    # functions/ocpLMPC.m art_ref logging; art_refH[0] = pre-loop 0 seed).
    # Measured: median 7.7e-9, max 6.6e-5, zero steps above 1e-4.
    art = np.asarray(th) @ np.asarray(sc.ocp.LAMBDA)[:1].T
    aerr = np.abs(art[:, 0] - golden("LMPC_N50")["art_refH"][1:])
    assert np.median(aerr) < 1e-7
    assert aerr.max() < 5e-4


def test_lmpc_n20_pointwise_parity(golden):
    """BASELINE config 1 (N=20): pointwise control parity at golden states."""
    sc = build_scenario(make_preset("LMPC_N20"))
    g = golden("LMPC_N20")["sysH"]
    dxs = jnp.asarray(g[:4, :-1].T)
    du_gold = g[4, 1:]
    Ks = jnp.asarray(sc.ocp.Ks)

    def du_of(dx):
        z, conv = sc.solve(dx, None, None)
        return (Ks @ dx + z[:1])[0], conv

    du, conv = jax.vmap(du_of)(dxs)
    err = np.abs(np.asarray(du) - du_gold)
    assert bool(jnp.all(conv))
    assert np.median(err) < 1e-6
    assert (err > 1e-4).sum() <= 2  # lone fmincon-noise outlier at an active-set step
    assert err.max() < 2e-3


def test_lbmpc_closed_loop_parity(golden):
    """LBMPC fmincon family: 300-step closed loop (learning on) vs golden."""
    steps = 1000 if RUN_SLOW else 300
    sc = build_scenario(make_preset("LBMPC_N50", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    sysH = np.asarray(res.sys_history).T
    g = golden("LBMPC_N50")["sysH"]
    err = np.abs(sysH[:, : steps + 1] - g[:, : steps + 1])
    assert err.max() < 5e-4
    # theta channel (VERDICT r2 item 4a; ref: functions/ocpLBMPC.m:34-44,
    # art_refH[0] is the pre-loop 0 seed). Measured: 2.2e-5 max at N=50.
    aerr = np.abs(np.asarray(res.art_history)[:, 0]
                  - golden("LBMPC_N50")["art_refH"][1: steps + 1])
    assert aerr.max() < 2e-4


def test_nmpc_closed_loop_parity(golden):
    steps = 200 if RUN_SLOW else 60
    sc = build_scenario(make_preset("NMPC_N50", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    sysH = np.asarray(res.sys_history).T
    g = golden("NMPC_N50")["sysH"]
    err = np.abs(sysH[:, : steps + 1] - g[:, : steps + 1])
    assert err[:3].max() < 1e-4   # slow states
    assert err[3].max() < 5e-3    # throttle rate
    assert err[4].max() < 1e-3    # input
    # theta channel (VERDICT r2 item 4a): measured max 5.0e-5 at 60 steps
    aerr = np.abs(np.asarray(res.art_history)[:, 0]
                  - golden("NMPC_N50")["art_refH"][1: steps + 1])
    assert aerr.max() < 5e-4


def test_dms_lmpc_casadi_closed_loop_parity(golden):
    """CasADi family LMPC (DMS N=50): absolute-state trajectory vs golden."""
    sc = build_scenario(make_preset("DMS_LMPC", iterations=500))
    res = sc.run()
    assert bool(res.solver_converged.all())
    # sys_history rows are delta; golden is absolute xmeasure BEFORE each step
    x_wp = np.asarray(sc.cfg.plant.x_wp)
    sysH = np.asarray(res.sys_history)
    ours_abs = sysH[:-1, :4] + x_wp  # pre-step states x_0..x_499
    g = golden("DMS_N50_tLMPC")      # (4, 500)
    err = np.abs(ours_abs.T - g)
    # slow states track at IPOPT-noise level; x4 transiently amplifies it
    assert err[0].max() < 1e-5
    assert err[1].max() < 1e-4
    assert err[2].max() < 5e-3
    assert err[3, 200:].max() < 1e-3  # after the active-set transient
    # steady state: everything re-converges
    assert err[:, 400:].max() < 1e-3


def test_dms_lbmpc_casadi_closed_loop_parity(golden):
    """Flagship CasADi LBMPC (dual-trajectory DMS, oracle in solver graph),
    N=50, q=100, 500 steps vs golden xlo."""
    import dataclasses

    cfg = make_preset("DMS_LBMPC_q100", iterations=500)
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=50))
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    sysH = np.asarray(res.sys_history)
    ours_abs = sysH[1:501, :4] + x_wp  # pre-step states x_0..x_499
    g = golden("DMS_N50_tLBMPC_q100")
    err = np.abs(ours_abs.T - g)
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-3
    assert err[3].max() < 5e-2  # throttle-rate transient at solver-noise level


def test_dms_lbmpc_q10_window_sweep_parity(golden):
    """Oracle-window sweep point q=10 (ref: valid_qplots_LBMPC.m protocol)."""
    import dataclasses

    cfg = make_preset("DMS_LBMPC_q10", iterations=400)
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=50))
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1:401, :4] + x_wp
    g = golden("DMS_N50_tLBMPC_q10")  # (4, 501): extra leading column
    err = np.abs(ours.T - g[:, 1:401])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[3].max() < 5e-2


def test_nmpc_casadi_closed_loop_parity(golden):
    """CasADi-family NMPC (true-ODE rollout, N=100) vs DSS_tNMPC golden."""
    import dataclasses

    cfg = make_preset("NMPC_N50", iterations=120)
    cfg = dataclasses.replace(
        cfg, family="casadi", ocp=dataclasses.replace(cfg.ocp, N=100)
    )
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    sysH = np.asarray(res.sys_history)
    g = golden("DSS_tNMPC")
    err = np.abs((sysH[1:121, :4] + x_wp).T - g[:, 1:121])
    assert err[0].max() < 1e-5
    assert err[1].max() < 1e-5
    assert err[2].max() < 1e-4
    assert err[3].max() < 1e-2


def test_dss_lmpc_n100_closed_loop_parity(golden):
    """CasADi DSS tracking LMPC, N=100 (the condensed form IS single
    shooting): 200 steps vs DSS_tLMPC golden."""
    import dataclasses

    cfg = make_preset("DMS_LMPC", iterations=200)
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=100))
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[:200, :4] + x_wp
    g = golden("DSS_tLMPC")
    err = np.abs(ours.T - g[:, :200])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-2


def test_lmpc_closed_loop_envelope(golden):
    """fmincon-family LMPC closed loop: tight until the active-set transient,
    bounded envelope through it, re-convergence after."""
    steps = 1000 if RUN_SLOW else 150
    sc = build_scenario(make_preset("LMPC_N50", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    sysH = np.asarray(res.sys_history).T
    g = golden("LMPC_N50")["sysH"]
    err = np.abs(sysH[:, : steps + 1] - g[:, : steps + 1])
    assert err[:, :80].max() < 3e-3           # pre-transient: tight
    assert err[0].max() < 2e-2                # mass flow stays close throughout
    assert err[1].max() < 2e-2


@pytest.mark.skipif(not RUN_SLOW, reason="interpret-mode pallas_full compile"
                    " of the N=50/q=100 kernels takes minutes")
def test_pallas_full_backend_closed_loop_golden_parity(golden):
    """VERDICT r3 item 7: the SHIPPING backend (f32 pallas_full hybrid — the
    bench.py headline configuration) through a full closed-loop episode
    DIRECTLY against a reference golden, not transitively via the f64 paths.

    LBMPC_N50 (trajectory does not excite the active-set switch — noise
    floor docs/NOISE_FLOOR.md: golden-vs-us class there is ~1e-4-5e-4 in
    f64). The f32 fused backend adds its own ~1e-2-class per-solve noise
    (scripts/accuracy_audit.py: c0 p50 8.1e-3 vs the vmapped path), which
    the closed loop low-passes; envelope set to the measured class with
    margin."""
    import dataclasses

    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_hybrid
    from lbmpc_tpu.models.mgcm import rk23_step
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.closed_loop import run_closed_loop_batched

    steps = 300
    cfg = make_preset("LBMPC_N50", iterations=steps)
    sc = build_scenario(cfg)
    N, q = cfg.ocp.N, cfg.oracle.q
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    B = 8  # tile width; all lanes identical -> also checks lane determinism
    hybrid = make_lbmpc_solver_hybrid(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=(16, 8),
        tile=B, interpret=True, qp_kernel="pallas_full",
        alphas=((1.0,), (1.0, 0.5, 0.25)), repair_frac=1.0 / B,
        repair_sqp_iters=1, repair_ipm_iters=8, repair_warm="fused",
        repair_backend="fused")
    f32 = jnp.float32
    dx0 = jnp.broadcast_to(jnp.asarray(cfg.dx_init, f32), (B, 4))
    win0 = init_window(q, dtype=f32)
    wins0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), win0)
    plant = lambda x, u: rk23_step(x, u[0], cfg.plant.ts)
    with jax.default_matmul_precision("highest"):
        res = run_closed_loop_batched(
            hybrid.raw, plant, lambda z, a, b, w_: z,
            jnp.asarray(np.atleast_2d(sc.ocp.Ks), f32),
            jnp.asarray(sc.A, f32), jnp.asarray(sc.B, f32),
            jnp.asarray(sc.ocp.LAMBDA, f32),
            jnp.asarray(cfg.plant.x_wp, f32),
            jnp.asarray([cfg.plant.u_wp], f32),
            dx0, jnp.zeros((B, qp.nz), f32), wins0, steps,
            learn=True, log_post_state=False)
    assert bool(np.asarray(res.solver_converged).all())
    sysH = np.asarray(res.sys_history)[0].T          # (5, steps+1)
    g = golden("LBMPC_N50")["sysH"][:, : steps + 1]
    err = np.abs(sysH - g)
    # class-level: f32 backend noise through a switch-free trajectory
    assert err.max() < 2e-2, err.max()
    # slow states track tightly; x4/u carry the solver-noise class
    assert err[:2].max() < 2e-3, err[:2].max()
