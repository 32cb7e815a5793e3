"""On-chip alpha-acceptance statistics of the fused SQP's Armijo ladder.

If (say) 99.9% of lanes accept alpha=1 at every GN iteration on the bench
distribution, the 6-evaluation ladder is paying ~5 ms/step to serve a 0.1%
tail that the hybrid repair machinery could catch instead (round-3 VERDICT
item 1 follow-up: the rollout phases, not the IPM, dominate the fused step
after the Pallas QP promotion).
"""

import dataclasses
import json
import pathlib
import sys

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
    from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q, B = 20, 100, 2048
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
    Gd = jnp.asarray(qp.G, f32)
    h0d = jnp.asarray(qp.h0, f32)
    Hpd = jnp.asarray(qp.Hp, f32)
    fused = build_fused_qp_solver(None, qp.G, iters=16, tile=512)
    residual_single, res_jac_single = make_residual_and_jac(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), dtype=f32)
    res_b = jax.vmap(residual_single, in_axes=(0, 0, 0))
    resjac_b = jax.vmap(res_jac_single, in_axes=(0, 0, 0))
    ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625)
    rho = 1e4

    @jax.jit
    def alpha_trace(dx0, windows, z):
        # replica of sqp_fused._solve with alpha_sel captured per GN iter
        h = h0d[None, :] + dx0 @ Hpd.T

        def merit(zb):
            e = res_b(zb, dx0, windows)
            viol = jnp.sum(jnp.maximum(zb @ Gd.T - h, 0.0), axis=1)
            return jnp.sum(e * e, axis=1) + rho * viol, viol

        sels = []
        with jax.default_matmul_precision("highest"):
            for _ in range(2):
                e, J = resjac_b(z, dx0, windows)
                Hb = 2.0 * jnp.einsum("bei,bej->bij", J, J,
                                      precision=jax.lax.Precision.HIGHEST)
                Hb = Hb + 1e-6 * jnp.eye(Hb.shape[-1], dtype=f32)[None]
                gb = 2.0 * jnp.einsum("bei,be->bi", J, e,
                                      precision=jax.lax.Precision.HIGHEST)
                sub = fused.raw_with_H(Hb, gb, h - z @ Gd.T)
                d = sub.x
                m0, v0 = merit(z)
                dirderiv = jnp.sum(gb * d, axis=1) - rho * v0
                accepted = jnp.zeros_like(m0, bool)
                alpha_sel = jnp.zeros_like(m0)
                for a in ALPHAS:
                    m_a, _ = merit(z + a * d)
                    ok = jnp.logical_and(~accepted,
                                         m_a <= m0 + 1e-4 * a * dirderiv)
                    alpha_sel = jnp.where(ok, a, alpha_sel)
                    accepted = jnp.logical_or(accepted, ok)
                d = jnp.where(jnp.isfinite(d), d, 0.0)
                z = z + alpha_sel[:, None] * d
                sels.append(alpha_sel)
        return jnp.stack(sels)

    rng = np.random.default_rng(0)
    counts = {}
    for rep in range(8):
        dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                         + 0.01 * rng.standard_normal((B, 4)), f32)
        win0 = init_window(q, dtype=f32)
        wins = type(win0)(
            X=jnp.asarray(0.1 * rng.standard_normal((B, q, 3)), f32),
            Y=jnp.asarray(0.001 * rng.standard_normal((B, q, 4)), f32),
            valid=jnp.ones((B, q), f32),
            count=jnp.full((B,), q, jnp.int32))
        sels = np.asarray(alpha_trace(dx, wins, jnp.zeros((B, qp.nz), f32)))
        for gi in range(2):
            u, c = np.unique(sels[gi], return_counts=True)
            for a, n in zip(u, c):
                counts[(gi, float(a))] = counts.get((gi, float(a)), 0) + int(n)
    total = 8 * B
    out = {f"gn{gi}_alpha_{a}": round(n / total, 6)
           for (gi, a), n in sorted(counts.items())}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
