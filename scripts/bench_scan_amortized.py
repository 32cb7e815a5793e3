"""Amortized-dispatch throughput: R sequential batched solves per jit call.

The remote runtime adds a fixed ~25 ms dispatch+RTT floor per call; scanning R
independent batches inside one jit amortizes it. This matches production use
(the closed loop runs hundreds of solves per episode inside one scan).
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
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q = 20, 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=3, ipm_iters=20, dtype="float32"),
    )
    sc = build_scenario(cfg)
    rng = np.random.default_rng(0)
    dt = jnp.float32

    def batch_inputs(batch, R):
        dx = jnp.asarray(
            np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((R, batch, 4)), dt)
        window = init_window(q, dtype=dt)
        windows = type(window)(
            X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), dt),
            Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), dt),
            valid=jnp.ones((R, batch, q), dt),
            count=jnp.full((R, batch), q, jnp.int32),
        )
        return dx, windows, jnp.zeros((R, batch, sc.nz), dt)

    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused

    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    )
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    fused_solve = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=3, ipm_iters=20,
    )
    solve_b = jax.vmap(sc.solve)
    import os
    if os.environ.get("USE_FUSED"):
        solve_b = fused_solve

    def make_scan(R):
        @jax.jit
        def run(dx, windows, z0):
            def body(acc, inp):
                d, w, z = inp
                zs, conv = solve_b(d, w, z)
                return acc + jnp.sum(zs[:, 0]) + jnp.sum(conv), conv

            acc, convs = jax.lax.scan(body, jnp.float32(0.0), (dx, windows, z0))
            return acc, convs

        return run

    def force(out):
        return float(np.asarray(out[0]).ravel()[0])

    import os
    specs = ((8192, 1), (8192, 4), (8192, 8), (4096, 8), (16384, 4))
    if os.environ.get("SPECS"):
        specs = tuple(tuple(int(v) for v in p.split(",")) for p in os.environ["SPECS"].split(";"))
    for batch, R in specs:
        dx, windows, z0 = batch_inputs(batch, R)
        run = make_scan(R)
        t0 = time.perf_counter()
        out = run(dx, windows, z0)
        force(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(dx, windows, z0)
            force(out)
            times.append(time.perf_counter() - t0)
        step = float(np.median(times))
        sps = batch * R / step
        print(json.dumps(dict(batch=batch, R=R, call_ms=round(step * 1e3, 2),
                              solves_per_s=round(sps, 1),
                              conv=round(float(np.mean(np.asarray(out[1]))), 4),
                              compile_s=round(compile_s, 1))), flush=True)


if __name__ == "__main__":
    main()
