"""Fleet closed-loop phase budget (VERDICT r3 item 3): where does the 4.6x
gap between solve-only (657k solves/s) and fleet closed-loop (144k) go?

Differential knob-A/B of the FULL cohort episode program (the only reliable
phase instrument on the remote runtime — CLAUDE.md): each variant removes one
phase of the closed-loop step (oracle window push, plant integrator, history
logging, warm start) while keeping everything else identical; the time delta
attributes the cost. A solve-only variant (plant/window/logging all cut)
bounds the irreducible solver share.

Bench shape: fmincon LBMPC N=20 q=32 f32, hybrid pallas_full backend (the
fleet_100k.py configuration), cohort `--chunk`, `--steps` steps in one jit.

Usage: python scripts/fleet_phase_budget.py [--chunk 8192] [--steps 10]
"""

import argparse
import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--qp-kernel", default="pallas_full")
    args = ap.parse_args()

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
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_hybrid
    from lbmpc_tpu.models.mgcm import rk4_step, rk23_step
    from lbmpc_tpu.oracle import (init_window, observe_residual, push,
                                  push_batched)
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q = 20, 32
    cfg = make_preset("LBMPC_N40", iterations=args.steps)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=2,
                                   ipm_iters=16),
        oracle=dataclasses.replace(cfg.oracle, q=q))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    pk = (dict(qp_kernel=args.qp_kernel, tile=256,
               alphas=((1.0,), (1.0, 0.5, 0.25)), repair_backend="fused")
          if args.qp_kernel != "xla" else {})
    solve_batch = make_lbmpc_solver_hybrid(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=(16, 8),
        repair_frac=1.0 / 85.0, repair_sqp_iters=1, repair_ipm_iters=8,
        repair_warm="fused", **pk)

    f32 = jnp.float32
    x_wp = jnp.asarray(cfg.plant.x_wp, f32)
    u_wp = jnp.asarray([cfg.plant.u_wp], f32)
    Ks = jnp.asarray(np.atleast_2d(sc.ocp.Ks), f32)
    A32 = jnp.asarray(sc.A, f32)
    B32 = jnp.asarray(sc.B, f32)
    import os
    obs_b = jax.vmap(lambda dx, du, dx1: observe_residual(dx, du, dx1, A32, B32))
    # LBMPC_PUSH=scatter reproduces the pre-r4 per-lane scatter for A/Bs
    push_b = (jax.vmap(push) if os.environ.get("LBMPC_PUSH") == "scatter"
              else push_batched)

    def make_cohort(plant="rk23", learn=True, log=True, do_solve=True,
                    steps=args.steps):
        if plant == "rk23":
            plant_one = lambda x, u: rk23_step(x, u[0], cfg.plant.ts)
        else:
            plant_one = lambda x, u: rk4_step(x, u[0], cfg.plant.ts, substeps=1)
        plant_b = jax.vmap(plant_one)

        @jax.jit
        def run(dx_init, windows0, z0):
            with jax.default_matmul_precision("highest"):
                def step(carry, _):
                    x, window, z_ws = carry
                    dx = x - x_wp[None, :]
                    if do_solve:
                        z, conv = solve_batch.raw(dx, window, z_ws)
                    else:
                        z = z_ws
                        conv = jnp.ones(dx.shape[0], bool)
                    c0 = z[:, :1]
                    du = dx @ Ks.T + c0
                    if plant != "none":
                        x1 = plant_b(x, du + u_wp[None, :])
                    else:
                        x1 = x
                    dx1 = x1 - x_wp[None, :]
                    if learn:
                        xi_new, y_new = obs_b(dx, du, dx1)
                        window1 = push_b(window, xi_new, y_new)
                    else:
                        window1 = window
                    out = ((jnp.concatenate([dx1, du], axis=1), conv)
                           if log else conv)
                    return (x1, window1, z), out

                carry, outs = jax.lax.scan(
                    step, (x_wp[None, :] + dx_init, windows0, z0),
                    None, length=steps)
                return carry[0], outs

        return run

    rng = np.random.default_rng(0)
    B = args.chunk
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                      + rng.uniform(-0.02, 0.02, (B, 4)), f32)
    win0 = init_window(q, d_out=4, dtype=f32)
    wins0 = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), win0)
    z0 = jnp.zeros((B, qp.nz), f32)

    def bench(name, runner):
        t0 = time.time()
        out = runner(dx0, wins0, z0)
        float(np.asarray(out[0]).ravel()[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(args.reps):
            t0 = time.perf_counter()
            out = runner(dx0, wins0, z0)
            float(np.asarray(out[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        step_ms = float(np.median(times)) / args.steps * 1e3
        print(json.dumps(dict(name=name, step_ms=round(step_ms, 3),
                              solves_per_s=round(B / (step_ms * 1e-3), 0),
                              compile_s=round(compile_s, 1))), flush=True)
        return step_ms

    full = bench("full", make_cohort())
    no_learn = bench("no_learn", make_cohort(learn=False))
    rk4 = bench("plant_rk4", make_cohort(plant="rk4"))
    no_log = bench("no_log", make_cohort(log=False))
    solve_only = bench("solve_only", make_cohort(
        plant="none", learn=False, log=False))
    no_solve = bench("no_solve", make_cohort(do_solve=False))
    print(json.dumps(dict(
        phase_ms=dict(
            window_push=round(full - no_learn, 3),
            rk23_vs_rk4=round(full - rk4, 3),
            logging=round(full - no_log, 3),
            non_solve_total=round(full - solve_only, 3),
            solve_total=round(full - no_solve, 3)),
        full_step_ms=round(full, 3))), flush=True)


if __name__ == "__main__":
    main()
