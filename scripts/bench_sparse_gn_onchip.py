"""On-chip N-scaling: condensed LBMPC SQP vs stage-form (sparse GN) SQP.

VERDICT r1 item 5 'done' criterion: N=300 LBMPC beats condensed on-chip.
Benchmarks the full LBMPC SQP solve (learned-rollout GN + constraints) per
backend at N in {20, 100, 300}, batched + scan-amortized (CLAUDE.md
dispatch-floor note). DTYPE=f32 (default; both backends dtype-matched —
sparse_gn carries the same dtype-aware guards as sparse_ipm) or f64.

Usage: PLAT=axon,cpu python scripts/bench_sparse_gn_onchip.py
Env: NS=20,100,300  SPECS=batch,R;...  ITERS / SQP / DTYPE
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    if os.environ.get("PLAT"):
        jax.config.update("jax_platforms", os.environ["PLAT"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import dataclasses

    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    q = 32
    dt = jnp.float64 if os.environ.get("DTYPE") == "f64" else jnp.float32
    horizons = [int(v) for v in os.environ.get("NS", "20,100,300").split(",")]
    specs = [tuple(int(v) for v in p.split(","))
             for p in os.environ.get("SPECS", "64,4").split(";")]
    ipm_iters = int(os.environ.get("ITERS", "25"))
    sqp_iters = int(os.environ.get("SQP", "2"))
    rng = np.random.default_rng(0)

    def bench(tag, N, batch, R, solve, nz):
        dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                         + 0.01 * rng.standard_normal((R, batch, 4)), dt)
        window = init_window(q, dtype=dt)
        windows = type(window)(
            X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), dt),
            Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), dt),
            valid=jnp.ones((R, batch, q), dt),
            count=jnp.full((R, batch), q, jnp.int32))
        z0 = jnp.zeros((R, batch, nz), dt)
        solve_b = jax.vmap(solve)

        @jax.jit
        def run(dxs, ws, zs):
            def body(acc, inp):
                d, w_, z = inp
                zz, conv = solve_b(d, w_, z)
                return acc + jnp.sum(zz[:, 0]), conv
            with jax.default_matmul_precision("highest"):
                return jax.lax.scan(body, dt(0.0), (dxs, ws, zs))

        t0 = time.perf_counter()
        out = run(dx, windows, z0)
        float(np.asarray(out[0]).ravel()[0])
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(dx, windows, z0)
            float(np.asarray(out[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        step = float(np.median(times)) / R
        print(json.dumps(dict(
            path=tag, N=N, batch=batch, R=R, call_ms=round(step * 1e3, 2),
            solves_per_s=round(batch / step, 1),
            conv=round(float(np.mean(np.asarray(out[1]))), 4),
            compile_s=round(compile_s, 1))), flush=True)

    for N in horizons:
        only = os.environ.get("PATHS")
        for backend in ("condensed", "sparse"):
            if only and backend not in only.split(","):
                continue
            cfg = make_preset("LBMPC_N40")
            cfg = dataclasses.replace(
                cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
                oracle=dataclasses.replace(cfg.oracle, q=q),
                solver=dataclasses.replace(
                    cfg.solver, qp_backend=backend, sqp_iters=sqp_iters,
                    ipm_iters=ipm_iters,
                    dtype="float64" if dt == jnp.float64 else "float32"))
            sc = build_scenario(cfg)
            for batch, R in specs:
                bench(backend, N, batch, R, sc.solve, sc.nz)


if __name__ == "__main__":
    main()
