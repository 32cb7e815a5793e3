"""BASELINE.json config 4: batched scenario sweep on a single host.

4096 initial conditions x disturbance draws of the LBMPC closed loop, vmapped
and (if multiple devices are visible) sharded over the scenario mesh, with
psum'd fleet statistics and response metrics — the batched generalization of
the reference's one-at-a-time RunExample scripts.

Usage:  python examples/scenario_sweep.py [--scenarios 4096] [--steps 100]
"""

import argparse
import dataclasses
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenarios", type=int, default=4096)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--N", type=int, default=20)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", ".cache/jax")
    import jax.numpy as jnp
    import numpy as np

    from lbmpc_tpu.analysis.metrics import response_info
    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario
    from lbmpc_tpu.runtime.sharding import (
        global_solve_stats,
        scenario_mesh,
        shard_scenarios,
        sharded_episode_runner,
    )

    cfg = make_preset("LBMPC_N40", iterations=args.steps)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=args.N),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=2),
        oracle=dataclasses.replace(cfg.oracle, q=32),
    )
    sc = build_scenario(cfg)

    rng = np.random.default_rng(0)
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0])
        + rng.uniform(-0.02, 0.02, (args.scenarios, 4)),
        jnp.float64,
    )

    mesh = scenario_mesh()
    runner = sharded_episode_runner(sc.episode, mesh)
    dx0 = shard_scenarios(mesh, dx0)

    t0 = time.perf_counter()
    res = runner(dx0)
    # force completion (axon: block_until_ready is unreliable)
    final = np.asarray(res.sys_history[:, -1, :])
    wall = time.perf_counter() - t0

    n_conv, n_tot = global_solve_stats(mesh, res.solver_converged.all(axis=-1))
    x1 = res.sys_history[:, :, 0]
    ref = jnp.zeros_like(x1)
    u = res.sys_history[:, :, 4]
    info = response_info(x1, u, ref, cfg.plant.ts)

    print(
        f"{args.scenarios} scenarios x {args.steps} steps on "
        f"{len(mesh.devices.ravel())} device(s): {wall:.1f}s "
        f"({args.scenarios * args.steps / wall:.0f} MPC steps/s)"
    )
    print(f"converged scenarios: {n_conv}/{n_tot}")
    print(
        "fleet metrics: settling p50="
        f"{float(jnp.median(info.settling_time)):.2f}s, "
        f"ctrl_error p50={float(jnp.median(info.ctrl_error)):.4f}, "
        f"final |dx1| max={float(jnp.abs(x1[:, -1]).max()):.4f}"
    )


if __name__ == "__main__":
    main()
