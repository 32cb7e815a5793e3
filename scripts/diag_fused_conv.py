"""Diagnose the fused backend's non-converged lanes at the bench operating
point: failure-reason breakdown (mu stall / feasibility / NaN) and distance
to the vmapped f32 optimum. ROADMAP perf item 1."""
import dataclasses, json, sys
import numpy as np

def main():
    import jax
    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent.parent / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused

    N, q = 20, 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=3, ipm_iters=20, dtype="float32"))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P,
        sc.ocp.T, sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T, sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="fmincon", delta=cfg.plant.ts, bandwidth=cfg.oracle.bandwidth,
              ridge=cfg.oracle.ridge, dx_ref=np.asarray(cfg.dx_ref), sqp_iters=3,
              ipm_iters=20)
    fused = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w, **kw)

    rng = np.random.default_rng(0)
    batch = 2048
    dt = jnp.float32
    dx = jnp.asarray(np.array([-0.35,-0.4,0.0,0.0]) + 0.01*rng.standard_normal((batch,4)), dt)
    win = init_window(q, dtype=dt)
    wins = type(win)(X=jnp.asarray(0.1*rng.standard_normal((batch,q,3)), dt),
                     Y=jnp.asarray(0.001*rng.standard_normal((batch,q,4)), dt),
                     valid=jnp.ones((batch,q), dt), count=jnp.full((batch,), q, jnp.int32))
    z0 = jnp.zeros((batch, sc.nz), dt)

    z, conv = fused(dx, wins, z0)
    z = np.asarray(z); conv = np.asarray(conv)
    # recompute the conv ingredients host-side
    G = np.asarray(qp.G, np.float64); h = np.asarray(qp.h0, np.float64)[None,:] + np.asarray(dx, np.float64) @ np.asarray(qp.Hp, np.float64).T
    viol = (z @ G.T - h).max(axis=1)
    h_scale = 1.0 + np.abs(h).max(axis=1)
    finite = np.isfinite(z).all(axis=1)
    print(json.dumps(dict(conv=float(conv.mean()),
        n_flagged=int((~conv).sum()),
        n_nonfinite=int((~finite).sum()),
        n_viol=int((viol > 2e-3*h_scale).sum()),
        viol_flagged=np.percentile(viol[~conv], [0,50,100]).tolist() if (~conv).any() else None)))
    # vmapped f32 reference on the flagged lanes (full batch for shape reuse)
    zr, convr = jax.jit(jax.vmap(sc.solve))(dx, wins, z0)
    zr = np.asarray(zr)
    err0 = np.abs(z[:,0] - zr[:,0])
    fl = ~conv
    print(json.dumps(dict(
        err0_all=np.percentile(err0,[50,99,100]).tolist(),
        err0_flagged=np.percentile(err0[fl],[0,50,100]).tolist() if fl.any() else None,
        err0_conv_max=float(err0[conv].max()),
        vmapped_conv=float(np.asarray(convr).mean()))))
    # are flagged lanes' dx0 clustered?
    if fl.any():
        print("flagged dx0 mean", np.asarray(dx)[fl].mean(axis=0).tolist(),
              "overall", np.asarray(dx).mean(axis=0).tolist())
        sys.stdout.flush()

if __name__ == "__main__":
    main()
