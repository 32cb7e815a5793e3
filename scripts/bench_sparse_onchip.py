"""On-chip N-scaling: condensed dense IPM vs sparse Riccati IPM (seq + parallel).

ROADMAP perf item 4: the CPU crossover (N~70) is measured; this measures the
TPU crossover for the tracking-LMPC QP at N in {20, 100, 300}, batched and
scan-amortized (R batches per jit call — see CLAUDE.md dispatch-floor note).

All paths f32 with HIGHEST matmul precision (TPU f64 is emulated ~29x).
Prints one JSON line per (path, N, batch) spec.
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

    if os.environ.get("PLAT"):  # axon plugin overrides JAX_PLATFORMS (CLAUDE.md)
        jax.config.update("jax_platforms", os.environ["PLAT"])
    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.controllers.condensed import build_casadi_dms
    from lbmpc_tpu.models.mgcm import TS, mgcm_dlti
    from lbmpc_tpu.ops.ipm import solve_qp
    from lbmpc_tpu.ops.sparse_ipm import make_stage_qp, solve_sparse
    from lbmpc_tpu.sets.terminal import get_cons
    from lbmpc_tpu.synthesis import mat_ocp

    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, K=ocp.Ks, LAMBDA=ocp.LAMBDA, PSI=ocp.PSI,
        LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0, cache=True,
    )
    rng = np.random.default_rng(0)
    dt = jnp.float64 if os.environ.get("DTYPE") == "f64" else jnp.float32
    f32 = lambda t: jax.tree.map(
        lambda x: x.astype(dt) if hasattr(x, "astype") and jnp.issubdtype(x.dtype, jnp.floating) else x, t)

    horizons = [int(v) for v in os.environ.get("NS", "20,100,300").split(",")]
    specs = [tuple(int(v) for v in p.split(","))
             for p in os.environ.get("SPECS", "1024,8").split(";")]
    iters = int(os.environ.get("ITERS", "25"))

    def bench(tag, N, batch, R, run, x0s):
        t0 = time.perf_counter()
        out = run(x0s)
        float(np.asarray(out[0]).ravel()[0])  # force host transfer (axon)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(x0s)
            float(np.asarray(out[0]).ravel()[0])
            times.append(time.perf_counter() - t0)
        step = float(np.median(times))
        print(json.dumps(dict(
            path=tag, N=N, batch=batch, R=R, call_ms=round(step * 1e3, 2),
            solves_per_s=round(batch * R / step, 1),
            conv=round(float(np.mean(np.asarray(out[1]))), 4),
            compile_s=round(compile_s, 1))), flush=True)

    for N in horizons:
        sqp = f32(make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T,
                                ocp.LAMBDA, ocp.PSI, cs, N, delta=TS))
        qpc = build_casadi_dms(A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA,
                               ocp.PSI, cs, N, delta=TS, terminal_at="last",
                               tighten_first_step=False)
        Hc = jnp.asarray(qpc.H, dt)

        def cond_solve(x0, qpc=qpc, Hc=Hc):
            g = jnp.asarray(qpc.g0, dt) + jnp.asarray(qpc.Gg, dt) @ x0
            h = jnp.asarray(qpc.h0, dt) + jnp.asarray(qpc.Hp, dt) @ x0
            sol = solve_qp(Hc, g, jnp.asarray(qpc.G, dt), h, iters=iters)
            return sol.z[0], sol.converged

        def sparse_solve(x0, par=False, sqp=sqp):
            sol = solve_sparse(sqp, x0, iters=iters, parallel=par)
            return sol.U[0, 0], sol.converged

        paths = {
            "condensed": cond_solve,
            "sparse_seq": lambda x0, s=sparse_solve: s(x0, False),
            "sparse_par": lambda x0, s=sparse_solve: s(x0, True),
        }
        only = os.environ.get("PATHS")
        for batch, R in specs:
            x0s = jnp.asarray(
                np.array([-0.35, -0.4, 0.0, 0.0]) +
                0.01 * rng.standard_normal((R, batch, 4)), dt)
            for tag, fn in paths.items():
                if only and tag not in only.split(","):
                    continue
                solve_b = jax.vmap(fn)

                @jax.jit
                def run(xs, solve_b=solve_b):
                    def body(acc, x):
                        u0, conv = solve_b(x)
                        return acc + jnp.sum(u0.astype(dt)) + jnp.sum(conv), conv
                    with jax.default_matmul_precision("highest"):
                        return jax.lax.scan(body, dt(0.0), xs)

                bench(tag, N, batch, R, run, x0s)


if __name__ == "__main__":
    main()
