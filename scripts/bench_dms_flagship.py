"""On-chip baseline: DMS-LBMPC flagship (N=100, q=100, casadi family) per
backend — the VERDICT r3 item-1 measurement ("no DMS throughput/p99 number
exists anywhere").

The flagship formulation is the dual-trajectory multiple-shooting NLP of
/root/reference/matlab/LBMPC/examples/DMS_LBMPC_casadi.m:122-130 (N=100,
q=100): learned-trajectory cost, nominal-trajectory constraints with the
tightened first step and the 616-row terminal set at k=1. Condensed TPU form:
z = [du_0..du_99; theta] (nz=101), constraint stack mI=1624.

Usage: python scripts/bench_dms_flagship.py [mode]
  mode in {xla, vmapped, sparse, pallas, pfull} — one backend per process so a
  wedged compile doesn't take the others down.
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
    from lbmpc_tpu.controllers.condensed import build_casadi_dms
    from lbmpc_tpu.controllers.lbmpc import (LBMPCWeights, make_lbmpc_solver,
                                             make_lbmpc_solver_sparse)
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    cfg = make_preset("DMS_LBMPC_q100")
    cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, dtype="float32"))
    sc = build_scenario(cfg)
    N, q = cfg.ocp.N, cfg.oracle.q
    qp = build_casadi_dms(
        sc.A, sc.B, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, delta=cfg.plant.ts,
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    print(json.dumps(dict(nz=qp.nz, mI=qp.G.shape[0])), flush=True)
    kw = dict(family="casadi", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref))

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    x_wp = np.asarray(cfg.plant.x_wp)
    dx0_base = np.asarray(cfg.x_init_abs) - x_wp

    def batch_inputs(batch, R):
        dx = jnp.asarray(dx0_base + 0.01 * rng.standard_normal((R, batch, 4)),
                         f32)
        win0 = init_window(q, dtype=f32)
        wins = type(win0)(
            X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), f32),
            Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), f32),
            valid=jnp.ones((R, batch, q), f32),
            count=jnp.full((R, batch), q, jnp.int32))
        z0 = jnp.zeros((R, batch, qp.nz), f32)
        return dx, wins, z0

    def make_scan(solve_b):
        @jax.jit
        def run(dx, windows, z0):
            def body(acc, inp):
                d, w_, z = inp
                zs, conv = solve_b(d, w_, z)
                return acc + jnp.sum(zs[:, 0]), conv
            acc, convs = jax.lax.scan(body, jnp.float32(0.0),
                                      (dx, windows, z0))
            return acc, convs
        return run

    def force(out):
        return float(np.asarray(out[0]).ravel()[0])

    def bench(name, solve_b, batch, R, reps=3):
        run = make_scan(solve_b)
        dx, wins, z0 = batch_inputs(batch, R)
        t0 = time.time()
        out = run(dx, wins, z0)
        force(out)
        compile_s = time.time() - t0
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(dx, wins, z0)
            force(out)
            times.append(time.perf_counter() - t0)
        step = float(np.median(times)) / R
        conv = float(np.mean(np.asarray(out[1])))
        print(json.dumps(dict(
            name=name, batch=batch, R=R, step_ms=round(step * 1e3, 3),
            solves_per_s=round(batch / step, 0), conv=round(conv, 5),
            compile_s=round(compile_s, 1))), flush=True)

    mode = sys.argv[1] if len(sys.argv) > 1 else "xla"
    if mode == "xla":
        # tile 512 (the N=20 default) OOMs scoped VMEM in pallas_chol at
        # nz_p=104 ((nz_p^2, T) block = 23M); 256 fits (11.5M)
        for sqp, ipm in ((2, (16, 8)), (3, (16, 10, 8))):
            bench(f"fused_xla_s{sqp}", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=sqp, ipm_iters=ipm,
                tile=256, alphas=((1.0,), (1.0, 0.5, 0.25)), **kw),
                batch=512, R=8)
    elif mode == "xla2":
        # batch scaling: the (B, mI)x(mI, nz^2) KKT-assembly matmul is
        # MXU-underutilized at batch 512
        s = make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
            tile=256, alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)
        for batch, R in ((1024, 8), (2048, 8)):
            bench(f"fused_xla_s2_b{batch}", s, batch=batch, R=R)
    elif mode == "knobs":
        # differential phase budget at batch 1024 (CLAUDE.md: knob-A/B of the
        # full program is the reliable phase instrument)
        base = dict(tile=256, **kw)
        for name, sqp, ipm, al in (
                ("base_s2_i16_8", 2, (16, 8), ((1.0,), (1.0, 0.5, 0.25))),
                ("i8_4", 2, (8, 4), ((1.0,), (1.0, 0.5, 0.25))),
                ("ladder1", 2, (16, 8), ((1.0,), (1.0,))),
                ("s1_i16", 1, (16,), ((1.0,),)),
        ):
            bench(name, make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=sqp, ipm_iters=ipm,
                alphas=al, **base), batch=1024, R=8)
    elif mode == "vmapped":
        vm = make_lbmpc_solver(qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2,
                               ipm_iters=16, dtype=f32, **kw)
        bench("vmapped_s2i16", jax.vmap(vm), batch=2048, R=4)
    elif mode == "sparse":
        vm = make_lbmpc_solver_sparse(
            qp, sc.A, sc.B, sc.ocp.Ks, w, sc.cs, sqp_iters=2, ipm_iters=16,
            terminal_at=cfg.ocp.terminal_at,
            tighten_first_step=cfg.ocp.tighten_first_step, dtype=f32, **kw)
        bench("sparse_s2i16", jax.vmap(vm), batch=1024, R=4)
    elif mode == "pallas":
        # r5: the full-Pallas Mehrotra kernel at the DMS shape was the r4
        # 'VMEM-infeasible at the 128-lane minimum (19.6M vs 16M)' negative;
        # ops/pallas_ipm._qp_vmem_grant now raises the scoped limit (25.9M
        # grant at nz_p=104/T=128). XLA GN + in-VMEM IPM loop. Caveat the
        # A/B must price in: the kernel's KKT assembly is DENSE over all
        # mI rows (the XLA path's structured assembly skips ~2/3 of the
        # MACs), so this trades assembly FLOPs for zero M traffic.
        for tile in (128,):
            bench(f"fused_pallas_t{tile}_s2", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
                qp_kernel="pallas", tile=tile,
                alphas=((1.0,), (1.0, 0.5, 0.25)), **kw), batch=1024, R=8)
    elif mode == "pfull":
        bench("pfull_t128_s2", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
            qp_kernel="pallas_full", tile=128,
            alphas=((1.0,), (1.0, 0.5, 0.25)), **kw), batch=1024, R=8)
    elif mode == "warm":
        # r5 IPM-iteration cut at the DMS shape (see sqp_fused qp_warm):
        # QP2 warm-started from QP1's final interior state. The nz_p=104
        # chol/assembly dominates the step, so each trimmed iteration is
        # worth ~2x what it is at N=20.
        al = ((1.0,), (1.0, 0.5, 0.25))
        bench("pfull_cold_i16_8", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2, ipm_iters=(16, 8),
            qp_kernel="pallas_full", tile=128, alphas=al, **kw),
            batch=1024, R=8)
        for sched in ((16, 2), (10, 2), (8, 2)):
            bench(f"pfull_warm_i{sched[0]}_{sched[1]}",
                  make_lbmpc_solver_fused(
                      qp, sc.A, sc.B, sc.ocp.Ks, w, sqp_iters=2,
                      ipm_iters=sched, qp_warm=True,
                      qp_kernel="pallas_full", tile=128, alphas=al, **kw),
                  batch=1024, R=8)
    elif mode == "cholstore":
        # r5 lever 1 (docs/ROADMAP.md): factor reuse at the DMS shape.
        # LBMPC_CHOL_STORE=0 -> refactor-per-solve (2 factorizations/IPM
        # iter, the r4 production path); unset -> chol_factor_solve +
        # chol_resolve with the raised scoped-VMEM limit (1 factorization +
        # one HBM L roundtrip, ~88 MB/iter at b1024 ~ 0.1 ms vs the ~10.8k
        # sequential ops of a refactor). env is read at solver-build time.
        import os
        base = dict(sqp_iters=2, ipm_iters=(16, 8), tile=256,
                    alphas=((1.0,), (1.0, 0.5, 0.25)), **kw)
        prev = os.environ.get("LBMPC_CHOL_STORE")
        os.environ["LBMPC_CHOL_STORE"] = "0"
        try:
            nostore = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                              **base)
        finally:
            if prev is None:
                del os.environ["LBMPC_CHOL_STORE"]
            else:
                os.environ["LBMPC_CHOL_STORE"] = prev
        store = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w, **base)
        bench("nostore_s2_b1024", nostore, batch=1024, R=8)
        bench("store_s2_b1024", store, batch=1024, R=8)
        bench("store_s2_b1024_rep", store, batch=1024, R=8)


if __name__ == "__main__":
    main()
