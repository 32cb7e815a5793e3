"""On-chip A/B: fleet closed loop with and without the warm IPM chain.

The bench fleet block (bench.py fleet_closed_loop) runs the hybrid
pallas_full backend at a flat ipm_iters=16 ((16, 16) schedule). qp_warm
threads QP1's final interior state into QP2 (sqp_fused qp_warm; r5
iteration-cut lever), so the second QP's budget can drop to 2 — measured
here over 10 receding-horizon closed-loop steps (the episode distribution
is harder than the bench solve distribution: transients, emptying windows).

Usage: python scripts/fleet_warm_ab.py
"""

import dataclasses
import json
import pathlib
import sys
import time

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
    from lbmpc_tpu.runtime.scenario import build_fleet_episode

    N = 20
    rng = np.random.default_rng(0)
    FLB = 8192
    fl_dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                        + rng.uniform(-0.02, 0.02, (FLB, 4)))

    def bench(name, ipm_iters, qp_warm, warm_chain=False):
        fl_cfg = make_preset("LBMPC_N40", iterations=10)
        fl_cfg = dataclasses.replace(
            fl_cfg,
            ocp=dataclasses.replace(fl_cfg.ocp, N=N),
            solver=dataclasses.replace(fl_cfg.solver, dtype="float32",
                                       sqp_iters=2, ipm_iters=16),
            oracle=dataclasses.replace(fl_cfg.oracle, q=32))
        _, run_cohort = build_fleet_episode(
            fl_cfg, backend="hybrid", qp_kernel="pallas_full",
            repair_frac=1.0 / 85.0, ipm_iters=ipm_iters, qp_warm=qp_warm,
            warm_chain=warm_chain)
        t0 = time.time()
        res = run_cohort(fl_dx)
        float(np.asarray(res.sys_history[:1, -1, 0]).ravel()[0])
        compile_s = time.time() - t0
        times = []
        for _ in range(3):
            t0 = time.perf_counter()
            res = run_cohort(fl_dx)
            float(np.asarray(res.sys_history[:1, -1, 0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        wall = float(np.median(times))
        conv = float(np.mean(np.asarray(res.solver_converged)))
        print(json.dumps(dict(
            name=name, cohort=FLB, steps=10,
            closed_loop_solves_per_s=round(FLB * 10 / wall, 1),
            step_ms=round(wall / 10 * 1e3, 2), conv=round(conv, 5),
            compile_s=round(compile_s, 1))), flush=True)

    def episode(name, ipm_iters, qp_warm, warm_chain=False, B=2048):
        fl_cfg = make_preset("LBMPC_N40", iterations=10)
        fl_cfg = dataclasses.replace(
            fl_cfg,
            ocp=dataclasses.replace(fl_cfg.ocp, N=N),
            solver=dataclasses.replace(fl_cfg.solver, dtype="float32",
                                       sqp_iters=2, ipm_iters=16),
            oracle=dataclasses.replace(fl_cfg.oracle, q=32))
        _, run_cohort = build_fleet_episode(
            fl_cfg, backend="hybrid", qp_kernel="pallas_full",
            repair_frac=1.0 / 85.0, ipm_iters=ipm_iters, qp_warm=qp_warm,
            warm_chain=warm_chain)
        res = run_cohort(fl_dx[:B])
        sysh = np.asarray(res.sys_history)
        conv = float(np.mean(np.asarray(res.solver_converged)))
        return name, sysh, conv

    mode = sys.argv[1] if len(sys.argv) > 1 else "warm"
    if mode == "chaincmp":
        # trajectory-level gate for the chain adoptions: the chained
        # episode must reproduce the cold (16,16) hybrid episode's
        # trajectories (both at conv 1.0; diff in delta coordinates)
        _, ref, cr = episode("cold", None, False)
        for sched in ((4, 2), (2, 2)):
            nm, sysh, cv = episode(f"chain_{sched}", sched, True,
                                   warm_chain=True)
            d = np.abs(sysh - ref)
            print(json.dumps(dict(
                name=nm, conv=cv, ref_conv=cr,
                traj_max=float(d.max()), traj_p99=float(np.percentile(d, 99)),
            )), flush=True)
        return
    if mode == "warm":
        bench("fleet_cold_i16", None, False)
        bench("fleet_warm_i16_2", (16, 2), True)
        bench("fleet_warm_i12_2", (12, 2), True)
        bench("fleet_warm_i8_2", (8, 2), True)
    elif mode == "chain":
        # cross-step warm chain: the carried interior state serves step k+1's
        # first QP, so the whole episode runs on a short schedule (step 0 is
        # the cold-start case the audit cleared at (4, 2))
        bench("fleet_chain_i8_2", (8, 2), True, warm_chain=True)
        bench("fleet_chain_i4_2", (4, 2), True, warm_chain=True)
        bench("fleet_chain_i2_2", (2, 2), True, warm_chain=True)


if __name__ == "__main__":
    main()
