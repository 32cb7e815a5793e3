"""Horizon-sweep + N=100-flagship parity: consume every extracted golden.

The reference's central empirical study is the horizon sweep
(saved_data+plots/horizonsLBMPC.m:4-7, data/LBMPC_N{40,60,80}_sys_full.mat)
and its flagship runs at N=100 (examples/DMS_LBMPC_casadi.m:81-87, goldens
tLMPC.mat / tNMPC.mat / DMS_tLBMPC_q100.mat compared in
saved_data+plots/compare.m:3-24). Round 1 parity generalized from N in
{20,50}; this file runs every remaining golden fixture.

Tolerance philosophy is the one documented in tests/test_parity.py: pointwise
our solvers sit at the reference solvers' own noise floor (fmincon ~1e-6,
IPOPT acceptable ~1e-4); closed loop, active-set switching transiently
amplifies the per-step noise dominantly into the fast throttle-rate state x4,
and trajectories re-converge after the transient. See also
docs/NOISE_FLOOR.md for the measured closed-loop reproducibility floor.
"""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.scenario import build_scenario

RUN_SLOW = bool(os.environ.get("RUN_SLOW"))


@pytest.mark.parametrize("N", [40, 60, 80])
def test_lbmpc_horizon_sweep_closed_loop_parity(golden, N):
    """LBMPC fmincon family across the reference's horizon sweep
    (ref: saved_data+plots/horizonsLBMPC.m:4-7, data/LBMPC_N{40,60,80}).

    Envelope tolerances: agreement is 1.6e-6 (N=40) before the step-~67
    active-set transient, where the control law's derivative is
    discontinuous and ANY solver perturbation is transiently amplified into
    the fast throttle-rate state x4 (measured floor: our own +-1 SQP
    iteration produces x4 spread 0.47-0.82 there — docs/NOISE_FLOOR.md).
    Slow states track at <5e-4 throughout; the loop re-locks to <1e-3 after
    step 150.
    """
    steps = 1000 if RUN_SLOW else 300
    sc = build_scenario(make_preset(f"LBMPC_N{N}", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    sysH = np.asarray(res.sys_history).T
    g = golden(f"LBMPC_N{N}")["sysH"]
    err = np.abs(sysH[:, : steps + 1] - g[:, : steps + 1])
    assert err[:2].max() < 5e-4   # slow states: tight throughout
    assert err[2].max() < 1e-2
    assert err[3].max() < 2.5     # x4 at the transient: noise-floor envelope
    assert err[4].max() < 0.5
    assert err[:, :55].max() < 2e-2      # pre-transient
    assert err[:, 150:].max() < 1e-3     # re-convergence
    # theta channel (VERDICT r2 item 4a): the artificial steady-state
    # reference Lambda*theta row 1:m, saved by the reference alongside every
    # run (ref: examples/ocpLBMPC.m:34-44, data/LBMPC_N*_art_full.mat,
    # plotted by saved_data+plots/plotRESPONSE.m). art_refH[0] is the
    # pre-loop 0 seed (LBMPC_RunExample.m:76); measured deviation
    # (full-length RUN_SLOW runs): pre-transient 1.4e-8 (N=40), 1.2e-6
    # (N=60), 5.8e-6 (N=80) — longer horizons activate more constraint rows
    # pre-transient, where solver noise couples into theta; peak 3.5e-4 AT
    # the step-~67 active-set transient; <= 5.9e-5 after re-lock (same
    # envelope shape as the state channels).
    art = np.asarray(res.art_history)[:, 0]
    g_art = golden(f"LBMPC_N{N}")["art_refH"]
    aerr = np.abs(art - g_art[1: steps + 1])
    assert aerr[:55].max() < 2e-5
    assert aerr.max() < 5e-3
    assert aerr[150:].max() < 2e-4


def test_lmpc_n40_pointwise_control_parity(golden):
    """LMPC N=40 pointwise: every golden state -> our du vs golden du
    (ref golden: data/LMPC_N40_sys_full.mat)."""
    sc = build_scenario(make_preset("LMPC_N40"))
    g = golden("LMPC_N40")["sysH"]
    dxs = jnp.asarray(g[:4, :-1].T)
    du_gold = g[4, 1:]
    Ks = jnp.asarray(sc.ocp.Ks)

    def du_of(dx):
        z, conv = sc.solve(dx, None, None)
        return (Ks @ dx + z[:1])[0], conv

    du, conv = jax.vmap(du_of)(dxs)
    err = np.abs(np.asarray(du) - du_gold)
    assert bool(jnp.all(conv))
    assert np.median(err) < 2e-6
    assert err.max() < 5e-4
    assert (err > 1e-4).sum() < 10


def test_nmpc_n40_closed_loop_parity(golden):
    """NMPC N=40 closed loop (ref golden: data/NMPC_N40_sys_full.mat)."""
    steps = 200 if RUN_SLOW else 60
    sc = build_scenario(make_preset("NMPC_N40", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    sysH = np.asarray(res.sys_history).T
    g = golden("NMPC_N40")["sysH"]
    err = np.abs(sysH[:, : steps + 1] - g[:, : steps + 1])
    assert err[:3].max() < 1e-4   # slow states
    assert err[3].max() < 5e-3    # throttle rate
    assert err[4].max() < 1e-3    # input


def test_dms_lbmpc_n100_flagship_closed_loop_parity(golden):
    """THE flagship: DMS_LBMPC_q100 at its default N=100, full 500 steps vs
    DMS_tLBMPC_q100 (ref: examples/DMS_LBMPC_casadi.m:81-87 N_t=1.0 => N=100,
    mpciterations=500; golden data/casadi/DMS_tLBMPC_q100.mat xlo)."""
    cfg = make_preset("DMS_LBMPC_q100", iterations=500)
    assert cfg.ocp.N == 100  # the preset's own default — no override
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours_abs = np.asarray(res.sys_history)[1:501, :4] + x_wp  # x_0..x_499
    g = golden("DMS_tLBMPC_q100")
    err = np.abs(ours_abs.T - g)
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-3
    assert err[3].max() < 5e-2  # throttle-rate transient at solver-noise level


def test_dms_lbmpc_q50_closed_loop_parity(golden):
    """Oracle window-size sweep at the flagship N=100, q=50 (ref:
    valid_qplots_LBMPC.m, data/casadi/DMS_tLBMPC_q50.mat; q in {10,100} in
    test_parity.py). The 501-column golden duplicates the initial state."""
    steps = 500 if RUN_SLOW else 150
    cfg = make_preset("DMS_LBMPC_q50", iterations=steps)
    assert cfg.ocp.N == 100
    res = build_scenario(cfg).run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1 : steps + 1, :4] + x_wp
    g = golden("DMS_tLBMPC_q50")
    err = np.abs(ours.T - g[:, 1 : 1 + steps])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-2
    assert err[3].max() < 5e-2  # throttle-rate transient at solver-noise level


def test_dms_lbmpc_q10_flagship_closed_loop_parity(golden):
    """Window-sweep point q=10 at the flagship N=100 (VERDICT r2 item 4b;
    ref: valid_qplots_LBMPC.m protocol, golden data/casadi/DMS_tLBMPC_q10.mat
    — previously covered only at N=50). Measured: [1.2e-5, 8.5e-6, 1.3e-4,
    1.4e-2] per state over 150 steps."""
    steps = 500 if RUN_SLOW else 150
    cfg = make_preset("DMS_LBMPC_q10", iterations=steps)
    assert cfg.ocp.N == 100
    res = build_scenario(cfg).run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1 : steps + 1, :4] + x_wp
    g = golden("DMS_tLBMPC_q10")
    err = np.abs(ours.T - g[:, 1 : 1 + steps])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-3
    assert err[3].max() < 5e-2  # throttle-rate transient at solver-noise level


def test_stray_dms_lbmpc_goldens_within_reference_noise_class(golden):
    """Provenance of the two orphan casadi artifacts (VERDICT r2 item 4c):
    tLBMPC.mat (4x500, no duplicated initial column) and DMS_tLBMPC.mat
    (4x501, duplicated initial column like the q-sweep files). NO reference
    script loads or saves either (grep over matlab/); replay can't identify
    them either, because the reference's own nominally-identical runs
    diverge O(1) from the FIRST learned step (its duplicate q50 pair:
    max 3.39 transient / 0.52 post-transient — docs/NOISE_FLOOR.md).

    What the data does pin down, asserted here: both are DMS
    tracking-LBMPC runs of the studied scenario (identical column 0 =
    [0.15, 1.2875, 1.1547, 0]), and both sit strictly INSIDE the
    reference's own run-to-run envelope around the flagship q100 golden
    (measured: 2.63/1.46 transient, 0.36/0.23 post-100 — smaller than the
    q50 pair's self-disagreement on both windows). Combined with
    test_dms_lbmpc_n100_flagship_closed_loop_parity (us == q100 golden to
    1.4e-2), this consumes both files at the only fidelity the data
    supports. Docs: docs/PARITY.md 'orphan artifacts'."""
    q100 = golden("DMS_tLBMPC_q100")                  # (4, 500)
    strays = {"tLBMPC": golden("tLBMPC"),
              "DMS_tLBMPC": golden("DMS_tLBMPC")[:, 1:]}
    q50 = golden("DMS_tLBMPC_q50")[:, 1:]
    q50_2 = golden("DMS_tLBMPC_q50_2")
    ref_pair = np.abs(q50 - q50_2)
    for name, x in strays.items():
        d = np.abs(x - q100)
        assert d[:, 0].max() == 0.0, name          # same scenario, same x_0
        # inside the reference's own reproducibility envelope, both windows
        assert d[:, :100].max() < ref_pair[:, :100].max(), name
        assert d[:, 100:].max() < ref_pair[:, 100:].max(), name
        assert d[:, 100:].max() < 0.5, name        # same steady-state class


@pytest.mark.parametrize("q", [200, 500])
def test_dms_lbmpc_q_large_window_filling_identity_and_golden_class(golden, q):
    """q in {200, 500}: while the window is still FILLING (first 100 steps),
    a q=200/500 run is mathematically identical to the q=100 run — the window
    contents are the same points and the validity mask hides empty slots. The
    reference's own data confirms this for q=50 vs q=100 (byte-identical
    first 100 columns) — but its q200/q500 .mat files VIOLATE it (O(1)
    deviation from its own q100 run inside the filling regime), i.e. they
    were generated under a different protocol than valid_qplots_LBMPC.m
    describes. Parity claims here are therefore (a) the filling-regime
    identity on our side, and (b) the same ~1e-2 steady-state class against
    the golden that the reference's own q100 run shows against it."""
    steps = 150
    cfg = make_preset(f"DMS_LBMPC_q{q}", iterations=steps)
    res = build_scenario(cfg).run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1 : steps + 1, :4] + x_wp

    res100 = build_scenario(make_preset("DMS_LBMPC_q100",
                                        iterations=100)).run()
    ours100 = np.asarray(res100.sys_history)[1:101, :4] + x_wp
    assert np.abs(ours[:100] - ours100).max() < 1e-5  # filling identity

    g = golden(f"DMS_tLBMPC_q{q}")
    off = 1 if g.shape[1] == 501 else 0
    err = np.abs(ours.T - g[:, off : off + steps])
    # post-anomaly steady-state class (the golden's own q100 disagreement
    # in the same window is ~8e-3)
    assert err[:, 80:].max() < 3e-2


def test_dms_lmpc_n100_600step_parity(golden):
    """Tracking LMPC at N=100 over the 600-step golden tLMPC (ref:
    examples/DMS_tracking_LMPC_casadi.m run logged as data/casadi/tLMPC.mat,
    overlaid against the flagship in saved_data+plots/compare.m:5)."""
    steps = 600 if RUN_SLOW else 300
    cfg = make_preset("DMS_LMPC", iterations=steps)
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=100))
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[:steps, :4] + x_wp
    g = golden("tLMPC")
    err = np.abs(ours.T - g[:, :steps])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 1e-2
    # steady state: everything re-converges after the transient
    assert err[:, 250:].max() < 1e-3


def test_nmpc_casadi_n100_600step_parity(golden):
    """Tracking NMPC at N=100 vs the 600-step golden tNMPC (ref:
    examples/DMS_tracking_NMPC_casadi.m:79-87 N_t=1.0 => N=100; golden
    data/casadi/tNMPC.mat, compare.m:6). The golden's 600 columns are
    x_0..x_599, so the longest comparable run is 599 steps."""
    steps = 599 if RUN_SLOW else 150
    cfg = make_preset("NMPC_N50", iterations=steps)
    cfg = dataclasses.replace(
        cfg, family="casadi", ocp=dataclasses.replace(cfg.ocp, N=100)
    )
    sc = build_scenario(cfg)
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1 : steps + 1, :4] + x_wp
    g = golden("tNMPC")
    err = np.abs(ours.T - g[:, 1 : steps + 1])
    assert err[0].max() < 1e-5
    assert err[1].max() < 1e-5
    assert err[2].max() < 1e-4
    assert err[3].max() < 1e-2


def test_dms_lbmpc_q500_pretrained_closed_loop_parity(golden):
    """Pretrained-oracle run (BASELINE config 2 semantics): the q=500 window
    preloaded from train_data (7x500) with online updates continuing, vs
    data/casadi/DMS_tLBMPC_q500_pretrained.mat (generated by the hybrid
    variant with its commented-out `load('train_data.mat')` enabled —
    hybrid_LBMPC_casadi.m:122; the hybrid oracle-in-cost form IS our
    condensed casadi-family LBMPC, docs/PARITY.md)."""
    from lbmpc_tpu.oracle import window_from_arrays

    steps = 500 if RUN_SLOW else 150
    cfg = make_preset("DMS_LBMPC_q500", iterations=steps)
    sc = build_scenario(cfg)
    td = golden("train_data")                    # (7, 500)
    w0 = window_from_arrays(td[:3], td[3:7], q=500)
    dx0 = jnp.asarray(np.asarray(cfg.x_init_abs) - np.asarray(cfg.plant.x_wp))
    res = sc.episode_with_window(dx0, w0)
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[1 : steps + 1, :4] + x_wp
    g = golden("DMS_tLBMPC_q500_pretrained")     # (4, 501), col 0 duplicated
    err = np.abs(ours.T - g[:, 1 : 1 + steps])
    # first 150 steps: tight per-state envelope (measured [2.6e-5, 2.2e-5,
    # 3.8e-4, 5.4e-2]); beyond, the online-updated 500-point windows drift
    # apart at solver-noise level and the run stays in the same low-1e-3
    # steady class (measured full-500 profile [9.1e-4, 1.2e-3, 1.5e-3,
    # 1.0e-2 post-transient] — far inside the reference's own duplicate-run
    # spread, docs/NOISE_FLOOR.md)
    assert err[0, :150].max() < 1e-4
    assert err[1, :150].max() < 1e-4
    assert err[2, :150].max() < 1e-3
    assert err[3].max() < 1e-1   # x4 transient at the solver-class floor
    assert err[:3].max() < 5e-3  # steady class over the full run


def test_dms_lmpc_k_explicit_split_closed_loop_parity(golden):
    """Explicit-c decision split (ref: DMS_tracking_LMPC_casadi_K.m:110-136,
    y = [x; c; u; theta] with u = Kstabil x + c as an equality) vs its own
    golden data/casadi/DMS_tLMPC_K.mat. Envelope tolerances per
    docs/NOISE_FLOOR.md (x4 transient at the solver-class floor)."""
    steps = 500 if RUN_SLOW else 200
    sc = build_scenario(make_preset("DMS_LMPC_K", iterations=steps))
    res = sc.run()
    assert bool(res.solver_converged.all())
    x_wp = np.asarray(sc.cfg.plant.x_wp)
    ours = np.asarray(res.sys_history)[:steps, :4] + x_wp
    g = golden("DMS_tLMPC_K")
    err = np.abs(ours.T - g[:, :steps])
    assert err[0].max() < 1e-4
    assert err[1].max() < 2e-4
    assert err[2].max() < 5e-3
    assert err[3].max() < 2.0          # transient envelope
    assert err[:, 150:].max() < 5e-3   # re-lock


def test_dms_lmpc_k_split_equals_direct_parametrization():
    """The split is exact: eliminating u = Ks x + c gives the SAME OCP as
    the direct du parametrization (DMS_tracking_LMPC_casadi.m) in different
    coordinates — the optimal applied input must match pointwise."""
    cfg_k = make_preset("DMS_LMPC_K")
    cfg_d = dataclasses.replace(make_preset("DMS_LMPC"),
                                ocp=dataclasses.replace(
                                    make_preset("DMS_LMPC").ocp, N=100))
    sc_k = build_scenario(cfg_k)
    sc_d = build_scenario(cfg_d)
    Ks = jnp.asarray(np.atleast_2d(sc_k.ocp.Ks))
    for dx in ([-0.35, -0.4, 0.0, 0.0], [0.1, -0.05, 0.02, 1.0]):
        dxj = jnp.asarray(dx)
        z_k, conv_k = sc_k.solve(dxj, None, jnp.zeros(sc_k.nz))
        z_d, conv_d = sc_d.solve(dxj, None, jnp.zeros(sc_d.nz))
        assert bool(conv_k) and bool(conv_d)
        du_k = (Ks @ dxj + z_k[:1])[0]
        du_d = z_d[0]
        assert abs(float(du_k - du_d)) < 1e-7


def test_noise_floor_transient_contraction():
    """The measured noise-floor claim (docs/NOISE_FLOOR.md): perturbing our
    own SQP budget by one iteration leaves the closed loop identical to 1e-6
    before the active-set transient and re-contracts below 1e-3 after it —
    transient divergence between converged solvers is the floor itself."""
    runs = []
    for sqp_iters in (4, 5):
        cfg = make_preset("LBMPC_N40", iterations=200)
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, sqp_iters=sqp_iters))
        res = build_scenario(cfg).run()
        assert bool(res.solver_converged.all())
        runs.append(np.asarray(res.sys_history).T)
    spread = np.abs(runs[1] - runs[0])
    assert spread[:, :55].max() < 1e-6      # identical up to the transient
    assert spread[:, 150:].max() < 1e-3     # contraction re-locks the loop


def test_solve_stats_reproduce_reference_baseline(golden):
    """Our 5x500 solve-stats protocol run on the reference's OWN raw samples
    must reproduce the published baseline table (BASELINE.md / SURVEY.md §6).

    Consumes solve_sample_full.npy (tracking-NMPC on the AMD CPU) and
    intelCPU_solve_sample_fullLMPC.npy (tracking-LMPC on the Intel CPU) —
    ref: saved_data+plots/solve_stats.m:3,76 loading the same .mat files.
    """
    from lbmpc_tpu.analysis.solve_stats import SolveStats

    nmpc = SolveStats.from_samples(golden("solve_sample_full"))
    assert nmpc.n == 2500
    assert abs(nmpc.mean_ms - 429.7) < 0.5
    assert abs(nmpc.median_ms - 340.6) < 0.5
    assert abs(nmpc.p99_ms - 777.3) < 0.5
    assert abs(nmpc.max_ms - 908.0) < 1.0
    lmpc = SolveStats.from_samples(golden("intelCPU_solve_sample_fullLMPC"))
    assert abs(lmpc.mean_ms - 115.0) < 0.5
    assert abs(lmpc.median_ms - 95.6) < 0.5
    assert abs(lmpc.p99_ms - 228.0) < 0.5
    # remaining two rows of the SURVEY §6 table: tracking-NMPC on the Intel
    # CPU and regular-NMPC on the AMD CPU (solve_stats.m:36,5)
    nmpc_i = SolveStats.from_samples(golden("intelCPU_solve_sample_full"))
    assert abs(nmpc_i.mean_ms - 257.7) < 0.5
    assert abs(nmpc_i.median_ms - 192.2) < 0.5
    assert abs(nmpc_i.p99_ms - 471.0) < 0.5
    reg = SolveStats.from_samples(golden("solve_sample_reg"))
    assert abs(reg.mean_ms - 343.3) < 0.5
    assert abs(reg.median_ms - 280.2) < 0.5
    assert abs(reg.p99_ms - 555.9) < 0.5
    # the reference misses its own 10 ms real-time budget by 10-40x
    # (BASELINE.md) — every measured config violates it
    assert all(s.violates_budget(10.0) for s in (nmpc, lmpc, nmpc_i, reg))


def test_reference_own_run_to_run_spread_exceeds_our_deviation(golden):
    """The reference shipped TWO runs of the q=50 sweep point
    (data/casadi/DMS_tLBMPC_q50.mat and DMS_tLBMPC_q50_2.mat). They disagree
    with each other by up to ~3.4 in the throttle-rate state and 0.02-0.07
    in the slow states — under every column alignment — i.e. the reference's
    OWN artifacts carry a run-to-run spread an order LARGER than any of our
    golden deviations. This is the external counterpart of the measured
    noise floor (docs/NOISE_FLOOR.md): closed-loop trajectories of this
    problem are only reproducible to the active-set-transient envelope, by
    anyone, including the reference itself."""
    a = golden("DMS_tLBMPC_q50")[:, 1:]       # 501-col: drop duplicated col
    b = golden("DMS_tLBMPC_q50_2")
    d = np.abs(a - b)
    assert d[3].max() > 1.0                   # their own x4 spread is O(1)
    assert d[:2].max() > 1e-2                 # slow states: ~2e-2..5e-2
    # ...while OUR deviation vs their primary q50 run stays an order tighter
    # (test_dms_lbmpc_q50_closed_loop_parity: slow states < 2e-4)
