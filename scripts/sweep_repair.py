"""On-chip sweep: gather-compacted repair on top of the fused s2i16 backend.

VERDICT r1 item 2: find the (repair_frac K, repair budget, warm-start seed)
frontier giving converged_frac >= 0.999 at >= 200k solves/s. Repair lanes are
mu-stalls whose fused iterate is already near the optimum, so the repair is
seeded at the fused z (repair_warm="fused") with a reduced SQP budget.

Prints one JSON line per config (cost, conv, accuracy audit vs the vmapped
f32 reference on the same batch).

Usage: PLAT=axon,cpu python scripts/sweep_repair.py
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
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights, make_lbmpc_solver
    from lbmpc_tpu.controllers.sqp_fused import (make_lbmpc_solver_fused,
                                                 make_lbmpc_solver_hybrid)
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q = 20, 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=3, ipm_iters=20,
                                   dtype="float32"))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="fmincon", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref))

    batch, R = 2048, 32
    rng = np.random.default_rng(0)
    dt = jnp.float32
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                     + 0.01 * rng.standard_normal((R, batch, 4)), dt)
    window = init_window(q, dtype=dt)
    windows = type(window)(
        X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), dt),
        Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), dt),
        valid=jnp.ones((R, batch, q), dt),
        count=jnp.full((R, batch), q, jnp.int32))
    z0 = jnp.zeros((R, batch, sc.nz), dt)

    # f32 vmapped reference for the accuracy audit (slab 0)
    vm_ref = jax.vmap(make_lbmpc_solver(qp, sc.A, sc.B, sc.ocp.Ks, w, **kw,
                                        sqp_iters=4, ipm_iters=30,
                                        dtype=jnp.float32))

    @jax.jit
    def ref0(d, w_, z):
        with jax.default_matmul_precision("highest"):
            return vm_ref(d, w_, z)

    z_ref, _ = ref0(dx[0], jax.tree.map(lambda a: a[0], windows), z0[0])
    z_ref = np.asarray(z_ref)

    def make_scan(solve_b):
        @jax.jit
        def run(dxs, ws, zs):
            def body(acc, inp):
                d, w_, z = inp
                zz, conv = solve_b(d, w_, z)
                return acc + jnp.sum(zz[:, 0]), (conv, zz[:, 0])
            acc, (convs, c0s) = jax.lax.scan(body, jnp.float32(0.0),
                                             (dxs, ws, zs))
            return acc, convs, c0s
        return run

    def force(out):
        return float(np.asarray(out[0]).ravel()[0])

    def measure(name, solve_b, audit_solve=None):
        run = make_scan(solve_b)
        t0 = time.perf_counter()
        force(run(dx, windows, z0))
        compile_s = time.perf_counter() - t0
        times = []
        out = None
        for _ in range(5):
            t0 = time.perf_counter()
            out = run(dx, windows, z0)
            force(out)
            times.append(time.perf_counter() - t0)
        step = float(np.median(times)) / R
        conv = float(np.mean(np.asarray(out[1])))
        # audit: slab-0 z vs the vmapped f32 reference
        z_a, _ = (audit_solve or solve_b)(
            dx[0], jax.tree.map(lambda a: a[0], windows), z0[0])
        err = np.abs(np.asarray(z_a)[:, 0] - z_ref[:, 0])
        print(json.dumps(dict(
            name=name, batch=batch, R=R, step_ms=round(step * 1e3, 3),
            solves_per_s=round(batch / step, 1), conv=round(conv, 5),
            worst_unconv_per_call=int(np.max(
                (1.0 - np.asarray(out[1], float)).sum(axis=1))),
            audit_c0_p50=float(np.median(err)), audit_c0_max=float(err.max()),
            compile_s=round(compile_s, 1))), flush=True)

    bs, bi = (int(v) for v in os.environ.get("BASE", "2,16").split(","))
    tile = int(os.environ.get("TILE", "512"))
    configs = [(32, 1, 20, "fused"), (32, 2, 20, "fused"),
               (64, 1, 20, "fused"), (64, 2, 25, "fused"),
               (128, 3, 30, "ws")]
    if os.environ.get("REPAIRS"):
        configs = []
        for spec in os.environ["REPAIRS"].split(";"):
            k_, rs_, ri_, warm_ = spec.split(",")
            configs.append((int(k_), int(rs_), int(ri_), warm_))
    else:
        base = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w, **kw,
                                       sqp_iters=bs, ipm_iters=bi)
        measure(f"fused_s{bs}i{bi}", base)

    for K, rs, ri, warm in configs:
        h = make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, **kw, sqp_iters=bs, ipm_iters=bi,
            tile=tile,
            repair_frac=K / batch, repair_sqp_iters=rs, repair_ipm_iters=ri,
            repair_warm=warm)
        measure(f"s{bs}i{bi}+rep_K{K}_s{rs}i{ri}_{warm}_t{tile}", h)

    if os.environ.get("FLEET"):
        from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fleet

        for frac, rs, ri in [(1 / 128, 1, 20), (1 / 64, 1, 20),
                             (1 / 128, 2, 25)]:
            fleet = make_lbmpc_solver_fleet(
                qp, sc.A, sc.B, sc.ocp.Ks, w, **kw, sqp_iters=2,
                ipm_iters=16, repair_frac=frac, repair_sqp_iters=rs,
                repair_ipm_iters=ri)
            t0 = time.perf_counter()
            force(fleet(dx, windows, z0))
            compile_s = time.perf_counter() - t0
            times = []
            out = None
            for _ in range(5):
                t0 = time.perf_counter()
                out = fleet(dx, windows, z0)
                force(out)
                times.append(time.perf_counter() - t0)
            call = float(np.median(times))
            conv = float(np.mean(np.asarray(out[1])))
            z_a = np.asarray(out[0][0])
            err = np.abs(z_a[:, 0] - z_ref[:, 0])
            print(json.dumps(dict(
                name=f"fleet_deferred_K{int(batch*R*frac)}_s{rs}i{ri}",
                batch=batch, R=R, step_ms=round(call / R * 1e3, 3),
                solves_per_s=round(batch * R / call, 1),
                conv=round(conv, 6),
                audit_c0_p50=float(np.median(err)),
                audit_c0_max=float(err.max()),
                compile_s=round(compile_s, 1))), flush=True)


if __name__ == "__main__":
    main()
