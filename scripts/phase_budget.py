"""Scan-amortized phase budget of the fused SQP at the bench operating point.

Times each phase as an R-deep jitted scan at batch 2048 (so the ~25 ms
remote dispatch floor amortizes away — CLAUDE.md), giving the real device
cost of: the residual+Jacobian scan, one learned rollout (merit ladder
unit), the GN-term einsums, and the Pallas QP kernel. Round-3 targeting:
after the Pallas QP promotion and ladder collapse, which phase binds?
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
    residual_single, res_jac_single = make_residual_and_jac(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), dtype=f32)
    res_b = jax.vmap(residual_single, in_axes=(0, 0, 0))
    resjac_b = jax.vmap(res_jac_single, in_axes=(0, 0, 0))
    pallas_qp = build_pallas_qp_solver_h(qp.G, iters=16, tile=256)
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
                out = fn(d_, w_, z_)
                return acc + out, None
            acc, _ = jax.lax.scan(body, jnp.float32(0.0), (dx, wins, z0))
            return acc

        float(np.asarray(run(dx, wins, z0)))   # compile + warm
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(run(dx, wins, z0)))
            ts.append(time.perf_counter() - t0)
        return float(np.median(ts)) / R * 1e3   # ms per step

    with jax.default_matmul_precision("highest"):
        def jac_phase(d_, w_, z_):
            e, J = resjac_b(z_, d_, w_)
            return jnp.sum(e) + jnp.sum(J[:, 0])

        def rollout_phase(d_, w_, z_):
            e = res_b(z_, d_, w_)
            return jnp.sum(e)

        def gnterm_phase(d_, w_, z_):
            # J of the right shape without the scan: synthesize from z_
            J = jnp.broadcast_to(z_[:, None, :], (B, 95, qp.nz)) * 1e-3
            e = J[:, :, 0]
            Hb = 2.0 * jnp.einsum("bei,bej->bij", J, J,
                                  precision=jax.lax.Precision.HIGHEST)
            gb = 2.0 * jnp.einsum("bei,be->bi", J, e,
                                  precision=jax.lax.Precision.HIGHEST)
            return jnp.sum(Hb) + jnp.sum(gb)

        def qp_phase(d_, w_, z_):
            h = h0d[None, :] + d_ @ Hpd.T
            Hb = (jnp.eye(qp.nz, dtype=f32)[None]
                  + 1e-3 * z_[:, :, None] * z_[:, None, :])
            x, mu = pallas_qp(Hb, z_, h)
            return jnp.sum(x) + jnp.sum(mu)

        out = {
            "jac_ms": scan_time(jac_phase),
            "rollout_ms": scan_time(rollout_phase),
            "gnterms_ms": scan_time(gnterm_phase),
            "qp_pallas16_ms": scan_time(qp_phase),
        }
    print(json.dumps({k: round(v, 3) for k, v in out.items()}))


if __name__ == "__main__":
    main()
