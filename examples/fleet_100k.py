"""BASELINE.json config 5: 100k+ concurrent receding-horizon LBMPC instances.

Runs a fleet of >=100k independent closed-loop LBMPC instances: resident
cohorts of `--chunk` scenarios are swept through the device mesh by one jitted
scan (runtime/sharding.fleet_runner), convergence statistics reduce across the
mesh via psum (global_solve_stats). On a multi-host pod, call with
--multihost so jax.distributed joins the global mesh: each host keeps its
scenario shard local; only the stats reduction crosses DCN.

The reference has no analog of any of this (SURVEY.md §2.3: a single-threaded
MATLAB loop); the per-instance semantics are its ocpLBMPC.m closed loop.

Usage (one v5e chip, ~2 min):   python examples/fleet_100k.py
      (CPU smoke run):          python examples/fleet_100k.py --cpu \
                                    --instances 512 --chunk 64 --steps 3
"""

import argparse
import dataclasses
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--instances", type=int, default=131072)
    ap.add_argument("--chunk", type=int, default=0,
                    help="cohort size; 0 = pick from the HBM budget model "
                         "(runtime/sharding.estimate_fleet_budget)")
    ap.add_argument("--steps", type=int, default=10)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--ipm-iters", type=int, default=16,
                    help="IPM iterations per GN step (16 = the validated "
                         "bench fused_sqp_s2i16 budget)")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--multihost", action="store_true")
    ap.add_argument("--fused", action="store_true",
                    help="batch-level episodes on the fused QP backend "
                         "(run_closed_loop_batched; fastest per solve)")
    ap.add_argument("--backend", default="hybrid",
                    choices=["fused", "hybrid"],
                    help="fused cohort solver; 'hybrid' (default) adds the "
                         "gather-compacted per-step repair (conv 1.0)")
    ap.add_argument("--qp-kernel", default="xla",
                    choices=["xla", "pallas", "pallas_full"],
                    help="QP/GN kernel backend; 'pallas_full' = the round-3 "
                         "all-Pallas phases (bench headline)")
    ap.add_argument("--warm-chain", action="store_true",
                    help="r5 cross-step warm chain (pallas kernels only): "
                         "carry the QP kernel's interior state across "
                         "receding-horizon steps and run the short (4, 2) "
                         "IPM schedule every step (measured 2.0x the cold "
                         "closed-loop rate at conv 1.0)")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(pathlib.Path(__file__).resolve().parent.parent / ".cache" / "jax"))
    import jax.numpy as jnp
    import numpy as np

    import jax as _jax  # noqa: F401 (tree ops in fused path)
    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario
    from lbmpc_tpu.runtime.sharding import (
        estimate_fleet_budget,
        fleet_runner,
        global_solve_stats,
        initialize_multihost,
        scenario_mesh,
    )

    if args.multihost:
        initialize_multihost()

    cfg = make_preset("LBMPC_N40", iterations=args.steps)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=args.N),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=2,
                                   ipm_iters=args.ipm_iters),
        oracle=dataclasses.replace(cfg.oracle, q=32),
    )
    sc = build_scenario(cfg)

    if not args.chunk:
        # exact constraint-row count of this scenario's condensed stack
        mI = ((args.N - 1) * (sc.cs.F_x.shape[0] + sc.cs.F_u.shape[0])
              + sc.cs.F_w_N.shape[0]
              + (sc.cs.F_x_d.shape[0] if sc.cs.F_x_d is not None else 0))
        budget = estimate_fleet_budget(
            n=4, m=1, nth=1, N=args.N, q=cfg.oracle.q, iterations=args.steps,
            fleet=args.instances, mI=int(mI))
        if not budget["fits"]:
            sys.exit(f"fleet does not fit HBM: {budget}")
        args.chunk = min(budget["max_chunk"], args.instances)
        print(f"chunk auto-picked: {args.chunk} (budget {budget})")

    rng = np.random.default_rng(0)
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0])
        + rng.uniform(-0.02, 0.02, (args.instances, 4)),
        jnp.float64,
    )

    mesh = scenario_mesh()
    if args.fused:
        from lbmpc_tpu.runtime.scenario import build_fleet_episode

        chain_kw = (dict(ipm_iters=(4, 2), qp_warm=True, warm_chain=True)
                    if args.warm_chain else {})
        _, run_cohort = build_fleet_episode(cfg, backend=args.backend,
                                            qp_kernel=args.qp_kernel,
                                            **chain_kw)

        def run(dx_all):
            cohorts = dx_all.reshape(-1, args.chunk, dx_all.shape[-1])
            outs = [run_cohort(c) for c in cohorts]
            return jax.tree.map(lambda *a: jnp.concatenate(a), *outs)
    else:
        run = fleet_runner(sc.episode, mesh, chunk=args.chunk)

    # warm-up: compile the cohort program before timing (remote compiles run
    # 10-100 s; round-2 cold-timed runs understated throughput ~5x)
    warm = run(dx0[: args.chunk]) if args.fused else None
    if warm is not None:
        np.asarray(warm.sys_history[:1, -1, 0])

    t0 = time.perf_counter()
    res = run(dx0)
    final = np.asarray(res.sys_history[:, -1, 0])  # forces completion (axon)
    wall = time.perf_counter() - t0

    n_conv, n_tot = global_solve_stats(mesh, res.solver_converged.all(axis=-1))
    solves = args.instances * args.steps
    print(
        f"fleet: {args.instances} concurrent LBMPC instances x {args.steps} "
        f"receding-horizon steps on {len(mesh.devices.ravel())} device(s) "
        f"[{jax.process_count()} host(s)]"
    )
    print(
        f"wall {wall:.1f}s -> {solves / wall:.0f} MPC solves/s; "
        f"converged instances: {n_conv}/{n_tot}; "
        f"final |dx1| p99: {float(np.percentile(np.abs(final), 99)):.4f}"
    )
    import json

    print(json.dumps({
        "metric": "fleet_closed_loop_solves_per_s",
        "value": round(solves / wall, 1),
        "instances": args.instances, "steps": args.steps,
        "chunk": args.chunk, "fused": bool(args.fused),
        "converged_frac": round(int(n_conv) / max(int(n_tot), 1), 4),
        "devices": len(mesh.devices.ravel()), "hosts": jax.process_count(),
    }), flush=True)


if __name__ == "__main__":
    main()
