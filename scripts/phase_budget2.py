"""Round-3 phase budget: the all-Pallas pipeline's per-launch costs.

Times (scan-amortized, batch 2048): the GN kernel alone, the QP kernel at
16 and 8 iterations, one XLA ladder rollout, and the full fused i16_8 step
— locating the remaining gap to speed-of-light (bench sol_frac 0.39).
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
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights, make_residual_and_jac
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.ops.pallas_gn import build_pallas_gn_kernel
    from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver_h
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q, B, R = 20, 100, 2048, 32
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    f32 = jnp.float32
    gn = build_pallas_gn_kernel(
        qp, sc.A, sc.B, sc.ocp.Ks, w, delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), q=q, tile=256)
    qp16 = build_pallas_qp_solver_h(qp.G, iters=16, tile=256)
    qp8 = build_pallas_qp_solver_h(qp.G, iters=8, tile=256)
    residual_single, _ = make_residual_and_jac(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), dtype=f32)
    res_b = jax.vmap(residual_single, in_axes=(0, 0, 0))
    Gd = jnp.asarray(qp.G, f32)
    h0d = jnp.asarray(qp.h0, f32)
    Hpd = jnp.asarray(qp.Hp, f32)

    rng = np.random.default_rng(0)
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                     + 0.01 * rng.standard_normal((R, B, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((R, B, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((R, B, q, 4)), f32),
        valid=jnp.ones((R, B, q), f32),
        count=jnp.full((R, B), q, jnp.int32))
    z0 = jnp.asarray(0.01 * rng.standard_normal((R, B, qp.nz)), f32)

    def scan_time(fn, reps=5):
        @jax.jit
        def run(dx, wins, z0):
            def body(acc, inp):
                d_, w_, z_ = inp
                return acc + fn(d_, w_, z_), None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (dx, wins, z0))
            return acc

        float(np.asarray(run(dx, wins, z0)))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(dx, wins, z0)))
            ts.append(time.perf_counter() - t0)
        return round(float(np.median(ts)) / R * 1e3, 3)

    with jax.default_matmul_precision("highest"):
        def gn_phase(d_, w_, z_):
            e, H, g = gn(z_, d_, w_)
            return jnp.sum(e) + jnp.sum(H[0, :1]) + jnp.sum(g)

        def qp16_phase(d_, w_, z_):
            e, H, g = gn(z_, d_, w_)
            h = h0d[None, :] + d_ @ Hpd.T
            x, mu = qp16.raw_packed(H, g, h - z_ @ Gd.T)
            return jnp.sum(x) + jnp.sum(mu)

        def qp8_phase(d_, w_, z_):
            e, H, g = gn(z_, d_, w_)
            h = h0d[None, :] + d_ @ Hpd.T
            x, mu = qp8.raw_packed(H, g, h - z_ @ Gd.T)
            return jnp.sum(x) + jnp.sum(mu)

        def ladder1(d_, w_, z_):
            e = res_b(z_, d_, w_)
            return jnp.sum(e)

        full = make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon",
            delta=cfg.plant.ts, bandwidth=cfg.oracle.bandwidth,
            ridge=cfg.oracle.ridge, dx_ref=np.asarray(cfg.dx_ref),
            sqp_iters=2, ipm_iters=(16, 8), qp_kernel="pallas_full",
            tile=256, alphas=((1.0,), (1.0, 0.5, 0.25)))

        def full_phase(d_, w_, z_):
            z, conv = full.raw(d_, w_, z_)
            return jnp.sum(z[:, 0]) + jnp.sum(conv)

        out = {
            "gn_kernel_ms": scan_time(gn_phase),
            "gn_plus_qp16_ms": scan_time(qp16_phase),
            "gn_plus_qp8_ms": scan_time(qp8_phase),
            "ladder_rollout_ms": scan_time(ladder1),
            "full_i16_8_ms": scan_time(full_phase),
        }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
