"""On-chip A/B sweep of fused-SQP configs against the mu-stall floor.

For each config: convergence fraction, timing at the bench operating point,
and err vs the on-chip vmapped f32 reference. ROADMAP perf item 1."""
import dataclasses, json, pathlib, sys, time
import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))

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
    base = dict(family="fmincon", delta=cfg.plant.ts, bandwidth=cfg.oracle.bandwidth,
                ridge=cfg.oracle.ridge, dx_ref=np.asarray(cfg.dx_ref))

    rng = np.random.default_rng(0)
    batch = 2048
    dt = jnp.float32
    dx = jnp.asarray(np.array([-0.35,-0.4,0.0,0.0]) + 0.01*rng.standard_normal((batch,4)), dt)
    win = init_window(q, dtype=dt)
    wins = type(win)(X=jnp.asarray(0.1*rng.standard_normal((batch,q,3)), dt),
                     Y=jnp.asarray(0.001*rng.standard_normal((batch,q,4)), dt),
                     valid=jnp.ones((batch,q), dt), count=jnp.full((batch,), q, jnp.int32))
    z0 = jnp.zeros((batch, sc.nz), dt)

    zr = np.asarray(jax.jit(jax.vmap(sc.solve))(dx, wins, z0)[0])

    configs = {
        "base_s3_i20":    dict(sqp_iters=3, ipm_iters=20),
        "i30":            dict(sqp_iters=3, ipm_iters=30),
        "s4_i20":         dict(sqp_iters=4, ipm_iters=20),
        "dcap1e6":        dict(sqp_iters=3, ipm_iters=20, d_cap=1e6),
        "dcap1e8":        dict(sqp_iters=3, ipm_iters=20, d_cap=1e8),
        "noscale":        dict(sqp_iters=3, ipm_iters=20, scale=False),
        "s4_i30":         dict(sqp_iters=4, ipm_iters=30),
    }
    import os
    if os.environ.get("CONFIGS"):
        # e.g. CONFIGS="s3_i16:3,16;s3_i14:3,14;s2_i16:2,16"
        configs = {}
        for part in os.environ["CONFIGS"].split(";"):
            nm, it = part.split(":")
            s_, i_ = (int(v) for v in it.split(","))
            configs[nm] = dict(sqp_iters=s_, ipm_iters=i_)
    for name, kw in configs.items():
        solver = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w, **base, **kw)
        z, conv = solver(dx, wins, z0)
        zf = np.asarray(z); cf = np.asarray(conv)
        # time it (amortized scan like bench)
        R = 16
        dxs = jnp.broadcast_to(dx, (R,)+dx.shape)
        winss = jax.tree.map(lambda a: jnp.broadcast_to(a, (R,)+a.shape), wins)
        z0s = jnp.broadcast_to(z0, (R,)+z0.shape)
        @jax.jit
        def run(d_, w_, zz):
            def body(acc, inp):
                dd, ww, z_ = inp
                zs, cc = solver.raw(dd, ww, z_)
                return acc + jnp.sum(zs[:,0]), cc
            with jax.default_matmul_precision("highest"):
                acc, cs_ = jax.lax.scan(body, jnp.float32(0.0), (d_, w_, zz))
            return acc, cs_
        float(np.asarray(run(dxs, winss, z0s)[0]).ravel()[0])
        t0 = time.perf_counter(); out = run(dxs, winss, z0s)
        float(np.asarray(out[0]).ravel()[0]); dtv = (time.perf_counter()-t0)/R
        err0 = np.abs(zf[:,0]-zr[:,0])
        print(json.dumps(dict(config=name, conv=float(cf.mean()),
            n_flagged=int((~cf).sum()),
            err0_p50=float(np.percentile(err0,50)), err0_max=float(err0.max()),
            err0_flagged_max=float(err0[~cf].max()) if (~cf).any() else 0.0,
            step_ms=dtv*1e3, solves_per_s=batch/dtv)), flush=True)

if __name__ == "__main__":
    main()
