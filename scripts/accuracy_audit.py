"""On-chip accuracy audit of fused-SQP configs vs the vmapped reference.

Compares candidate configs' solutions against the vmapped f32 SQP (3 GN x
20 IPM — the parity-grade batched path) on the bench distribution: err in
the applied control c0 per lane. Used to grade the round-3 reduced-IPM
schedules before adopting them in the headline (conv flags alone are not an
accuracy statement).
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
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q, B = 20, 100, 2048
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=3, ipm_iters=20,
                                   dtype="float32"))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="fmincon", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2,
              qp_kernel="pallas_full", tile=256,
              alphas=((1.0,), (1.0, 0.5, 0.25)))

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                     + 0.01 * rng.standard_normal((B, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((B, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((B, q, 4)), f32),
        valid=jnp.ones((B, q), f32), count=jnp.full((B,), q, jnp.int32))
    z0 = jnp.zeros((B, qp.nz), f32)

    ref = jax.jit(jax.vmap(sc.solve))
    z_ref, conv_ref = ref(dx, wins, z0)
    z_ref = np.asarray(z_ref)

    # (schedule, qp_warm) — the warm rows grade the r5 iteration-cut lever
    # (QP2 started from QP1's final interior state; see sqp_fused qp_warm)
    if "warm" in sys.argv[1:]:
        configs = (((16, 8), False), ((8, 2), True), ((6, 2), True),
                   ((6, 4), True), ((4, 2), True), ((4, 4), True))
    else:
        configs = (((16, 16), False), ((16, 8), False), ((12, 10), False))
    for sched, qwarm in configs:
        s = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                    ipm_iters=sched, qp_warm=qwarm, **kw)
        z, conv = s(dx, wins, z0)
        err = np.abs(np.asarray(z)[:, 0] - z_ref[:, 0])
        print(json.dumps(dict(
            sched=list(sched), warm=qwarm,
            conv=round(float(np.mean(np.asarray(conv))), 5),
            c0_err_p50=float(np.median(err)), c0_err_p99=float(np.percentile(err, 99)),
            c0_err_max=float(err.max()))), flush=True)


if __name__ == "__main__":
    main()
