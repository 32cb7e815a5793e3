"""On-chip golden-parity check of the DMS FLAGSHIP bench backend (r4).

Runs the exact bench.py dms_flagship configuration (fused batch SQP,
family="casadi", N=100/q=100, 2 GN x IPM (16, 8), f32) through the full
500-step closed loop and compares the trajectory to the reference golden
DMS_tLBMPC_q100 (data/casadi/DMS_tLBMPC_q100.mat xlo — the reference's own
flagship run). This closes the accuracy chain for the DMS bench line with
REAL closed-loop data: on the synthetic random-window audit distribution the
fused and vmapped paths settle on different local optimizers of the N=100
NLP (scripts/accuracy_audit_dms.py, c0 ~0.2-class), but what matters is the
trajectory the shipping backend produces against the reference's.

Measured r4 (2026-08-21, v5e, B=8 identical lanes, XLA+pallas_chol
backend): conv 0.996 (unconverged only at steps 64-65 — the active-set
switch the noise-floor study documents); x1 max 1.6e-3, x2 3.5e-3, x3
4.8e-2, x4 max 6.5 IN THE TRANSIENT decaying to 0.46 post-step-150.
Measured r5 (2026-08-22, same protocol, the PROMOTED pallas_full backend —
both phases in Pallas at 45.1k solves/s): conv 0.998 (only step 72), x1
1.5e-3, x2 3.2e-3, x3 4.3e-2, x4 transient 6.8 decaying to 0.52 — the
same class, confirming the 2.31x faster backend preserves the closed-loop
trajectory. Both are inside the reference's own duplicate-run noise class
for these artifacts (its q50 run pair disagrees O(1) on x4;
docs/NOISE_FLOOR.md), with perfect lane determinism. The f64 vmapped
path's tolerance at the same shape is x4 < 5e-2 (test_parity_sweep) — the
f32 backend trades that transient accuracy for the fast path; slow states
track throughout.

Usage: python scripts/dms_fused_episode_check.py
"""

import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.controllers.condensed import build_casadi_dms
    from lbmpc_tpu.controllers.lbmpc import (LBMPCWeights,
                                             make_casadi_warm_start)
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.models.mgcm import rk4_step
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.closed_loop import run_closed_loop_batched

    cfg = make_preset("DMS_LBMPC_q100")
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, dtype="float32"))
    from lbmpc_tpu.runtime.scenario import build_scenario

    sc = build_scenario(cfg)
    N, q = cfg.ocp.N, cfg.oracle.q
    qp = build_casadi_dms(
        sc.A, sc.B, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, delta=cfg.plant.ts,
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    # r5: the promoted bench backend — both phases in Pallas (pallas_full,
    # tile 128; B=8 lanes pad to one 128-lane tile). Modes: default = the
    # historical cold (16, 8); "warm" = the ADOPTED bench config (warm
    # (8, 2), sqp_fused qp_warm); "chain" = cross-step warm chain at
    # (4, 2) (raw_qpwarm through the episode carry).
    mode = sys.argv[1] if len(sys.argv) > 1 else "cold"
    sched, qwarm = {"cold": ((16, 8), False), "warm": ((8, 2), True),
                    "chain": ((4, 2), True)}[mode]
    solve = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="casadi", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=sched,
        qp_warm=qwarm, qp_kernel="pallas_full", tile=128,
        alphas=((1.0,), (1.0, 0.5, 0.25)))
    f32 = jnp.float32
    B = 8
    x_wp = jnp.asarray(cfg.plant.x_wp, f32)
    dx0 = jnp.broadcast_to(
        jnp.asarray(np.asarray(cfg.x_init_abs) - np.asarray(cfg.plant.x_wp),
                    f32), (B, 4))
    win0 = init_window(q, dtype=f32)
    wins0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), win0)
    warm = make_casadi_warm_start(qp, sc.A, sc.B, sc.ocp.Ks, dtype=f32)
    plant = lambda x, u: rk4_step(x, u[0], cfg.plant.ts, substeps=1)

    chain_kw = (dict(qp_warm_solve=solve.raw_qpwarm,
                     qp_init_state=solve.init_qp_state)
                if mode == "chain" else {})

    @jax.jit
    def run(dx_init):
        with jax.default_matmul_precision("highest"):
            return run_closed_loop_batched(
                solve.raw, plant, warm,
                jnp.zeros((1, 4), f32), jnp.asarray(sc.A, f32),
                jnp.asarray(sc.B, f32), jnp.asarray(sc.ocp.LAMBDA, f32),
                x_wp, jnp.asarray([cfg.plant.u_wp], f32),
                dx_init, jnp.zeros((B, qp.nz), f32), wins0,
                cfg.iterations, learn=True, log_post_state=False,
                **chain_kw)

    res = run(dx0)
    sysH = np.asarray(res.sys_history)  # (B, T+1, 5)
    conv = float(np.asarray(res.solver_converged).mean())
    ours_abs = sysH[0, 1:501, :4] + np.asarray(cfg.plant.x_wp)
    g = np.load(pathlib.Path(__file__).parent.parent / "tests" / "golden"
                / "DMS_tLBMPC_q100.npy")
    err = np.abs(ours_abs.T - g)
    lane_spread = np.abs(sysH[0] - sysH[-1]).max()
    win = {}
    for name, sl in (("pre_55", slice(0, 55)), ("trans_55_150", slice(55, 150)),
                     ("post_150", slice(150, 500))):
        win[name] = [float(err[i, sl].max()) for i in range(4)]
    conv_t = np.asarray(res.solver_converged)[0]
    print(json.dumps(dict(
        conv=conv,
        unconverged_steps=[int(i) for i in np.nonzero(~conv_t)[0][:20]],
        err_max_per_state=[float(err[i].max()) for i in range(4)],
        err_p99_per_state=[float(np.percentile(err[i], 99)) for i in range(4)],
        err_windows=win,
        lane_determinism=float(lane_spread))), flush=True)


if __name__ == "__main__":
    main()


