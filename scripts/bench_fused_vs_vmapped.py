"""On-chip A/B: vmapped per-problem LBMPC SQP vs batch-level fused SQP.

Decides which backend bench.py should use for the headline metric (ref
protocol: 5-rep median, BASELINE.md tracking-LMPC 115 ms/solve baseline).

Run on the real TPU chip:  python scripts/bench_fused_vs_vmapped.py
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
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
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
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    )
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    fused = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=3, ipm_iters=20,
    )
    vmapped = jax.jit(jax.vmap(sc.solve))

    rng = np.random.default_rng(0)
    dt = jnp.float32

    def batch_inputs(batch):
        dx = jnp.asarray(
            np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4)), dt)
        window = init_window(q, dtype=dt)
        windows = type(window)(
            X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3)), dt),
            Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4)), dt),
            valid=jnp.ones((batch, q), dt),
            count=jnp.full((batch,), q, jnp.int32),
        )
        return dx, windows, jnp.zeros((batch, qp.nz), dt)

    def force(out):
        return float(np.asarray(out[0]).ravel()[0])

    results = {}
    for name, fn in (("vmapped", vmapped), ("fused", fused)):
        for batch in (2048, 8192):
            dx, windows, z0 = batch_inputs(batch)
            t0 = time.perf_counter()
            out = fn(dx, windows, z0)
            force(out)
            compile_s = time.perf_counter() - t0
            times = []
            for _ in range(5):
                t0 = time.perf_counter()
                out = fn(dx, windows, z0)
                force(out)
                times.append(time.perf_counter() - t0)
            step = float(np.median(times))
            conv = float(np.mean(np.asarray(out[1])))
            results[f"{name}_b{batch}"] = dict(
                step_ms=round(step * 1e3, 2),
                solves_per_s=round(batch / step, 1),
                conv=round(conv, 4),
                compile_s=round(compile_s, 1),
            )
            print(json.dumps({name: results[f"{name}_b{batch}"], "batch": batch}),
                  flush=True)

    print(json.dumps({"backend": jax.default_backend(), "results": results}))


if __name__ == "__main__":
    main()
