"""On-chip sweep of the fused LBMPC SQP: batch size x ipm_iters x tile.

Usage: python scripts/bench_fused_sweep.py "<spec>;<spec>;..."
  spec = batch,ipm_iters,tile[,sqp_iters]        e.g. "16384,20,512"
Default sweep covers the candidate bench.py operating points.
"""

import dataclasses
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

SPECS = [
    (16384, 20, 512, 3),
    (32768, 20, 512, 3),
    (8192, 25, 512, 3),
    (16384, 25, 512, 3),
]


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

    specs = SPECS
    if len(sys.argv) > 1:
        specs = []
        for part in sys.argv[1].split(";"):
            f = [int(v) for v in part.split(",")]
            specs.append((f[0], f[1], f[2], f[3] if len(f) > 3 else 3))

    N, q = 20, 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
                              oracle=dataclasses.replace(cfg.oracle, q=q))
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.synthesis import mat_ocp
    from lbmpc_tpu.sets.terminal import get_cons_poly

    p = cfg.plant
    A, B, C, _ = mgcm_dlti(p.ts)
    ocp = mat_ocp(A, B, C, poles=cfg.ocp.poles, T=cfg.ocp.T)
    cs = get_cons_poly(
        x_min=p.x_min, x_max=p.x_max, u_min=p.u_min, u_max=p.u_max,
        x_wp=p.x_wp, u_wp=p.u_wp, state_uncert=p.state_uncert,
        A=A, B=B, Q=ocp.Q, R=ocp.R,
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(
        A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI, cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    )
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)

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

    for batch, ipm_iters, tile, sqp_iters in specs:
        fused = make_lbmpc_solver_fused(
            qp, A, B, ocp.Ks, w, family="fmincon", delta=p.ts,
            bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
            dx_ref=np.asarray(cfg.dx_ref), sqp_iters=sqp_iters,
            ipm_iters=ipm_iters, tile=tile,
        )
        dx, windows, z0 = batch_inputs(batch)
        t0 = time.perf_counter()
        out = fused(dx, windows, z0)
        force(out)
        compile_s = time.perf_counter() - t0
        times = []
        for _ in range(5):
            t0 = time.perf_counter()
            out = fused(dx, windows, z0)
            force(out)
            times.append(time.perf_counter() - t0)
        step = float(np.median(times))
        print(json.dumps(dict(
            batch=batch, ipm_iters=ipm_iters, tile=tile, sqp_iters=sqp_iters,
            step_ms=round(step * 1e3, 2), solves_per_s=round(batch / step, 1),
            conv=round(float(np.mean(np.asarray(out[1]))), 4),
            compile_s=round(compile_s, 1),
        )), flush=True)


if __name__ == "__main__":
    main()
