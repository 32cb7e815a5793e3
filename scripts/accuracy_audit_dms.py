"""On-chip accuracy audit of the DMS flagship bench config vs the vmapped
reference path (r4: grades the bench.py dms_flagship line the same way
scripts/accuracy_audit.py grades the fmincon headline — conv flags alone
are not an accuracy statement).

Candidate: fused batch SQP, family="casadi", N=100/q=100, 2 GN x IPM (16,8),
per-GN ladders — exactly the bench operating point. Reference: the vmapped
f32 SQP at full budget (3 GN x 20). Metric: |du_0| error per lane (the
applied control).
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
    from lbmpc_tpu.controllers.condensed import build_casadi_dms
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights, make_lbmpc_solver
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    cfg = make_preset("DMS_LBMPC_q100")
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, dtype="float32"))
    sc = build_scenario(cfg)
    N, q, B = cfg.ocp.N, cfg.oracle.q, 512
    qp = build_casadi_dms(
        sc.A, sc.B, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, delta=cfg.plant.ts,
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="casadi", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref))
    cand = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
        tile=256, alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)
    ref = jax.vmap(make_lbmpc_solver(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=3, ipm_iters=20,
        dtype=jnp.float32, **kw))

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dx0 = np.asarray(cfg.x_init_abs) - np.asarray(cfg.plant.x_wp)
    dx = jnp.asarray(dx0 + 0.01 * rng.standard_normal((B, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((B, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((B, q, 4)), f32),
        valid=jnp.ones((B, q), f32), count=jnp.full((B,), q, jnp.int32))
    z0 = jnp.zeros((B, qp.nz), f32)
    ref2 = jax.vmap(make_lbmpc_solver(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=4, ipm_iters=25,
        dtype=jnp.float32, **kw))
    cand3 = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=3, ipm_iters=(16, 10, 8),
        tile=256, alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)
    # r5 promoted backend: XLA GN + full-Pallas Mehrotra kernel (the bench
    # dms_flagship configuration after the +44% A/B)
    candp = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
        qp_kernel="pallas", tile=128, alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)
    # r5 warm IPM chain at the DMS shape (sqp_fused qp_warm): the adopted
    # bench schedule (8, 2) — measured 68.3k solves/s vs 42.0k cold (16, 8)
    candw = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(8, 2),
        qp_warm=True, qp_kernel="pallas_full", tile=128,
        alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)

    zc, cc = cand(dx, wins, z0)
    zp, cp = candp(dx, wins, z0)
    zw, cw = candw(dx, wins, z0)
    zr, cr = ref(dx, wins, z0)
    zr2, cr2 = ref2(dx, wins, z0)
    zc3, cc3 = cand3(dx, wins, z0)

    def stats(za, zb):
        d0 = np.abs(np.asarray(za[:, 0]) - np.asarray(zb[:, 0]))
        return dict(c0_p50=float(np.percentile(d0, 50)),
                    c0_p99=float(np.percentile(d0, 99)),
                    c0_max=float(d0.max()))

    print(json.dumps(dict(
        cand_s2_vs_ref_s3=stats(zc, zr),
        cand_pallas_s2_vs_ref_s3=stats(zp, zr),
        cand_pallas_vs_cand_xla=stats(zp, zc),
        cand_warm8_2_vs_ref_s3=stats(zw, zr),
        cand_warm8_2_vs_cand_xla=stats(zw, zc),
        cand_s3_vs_ref_s3=stats(zc3, zr),
        # solver-class noise floor: the reference against a deeper budget of
        # ITSELF — if this is the same order as the candidate error, the
        # spread is the N=100 NLP's conditioning, not under-convergence
        ref_s3_vs_ref_s4=stats(zr, zr2),
        conv=dict(cand_s2=float(np.asarray(cc).mean()),
                  cand_pallas_s2=float(np.asarray(cp).mean()),
                  cand_warm8_2=float(np.asarray(cw).mean()),
                  cand_s3=float(np.asarray(cc3).mean()),
                  ref_s3=float(np.asarray(cr).mean()),
                  ref_s4=float(np.asarray(cr2).mean())), B=B)), flush=True)


if __name__ == "__main__":
    main()
