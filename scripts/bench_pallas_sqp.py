"""On-chip A/B: fused LBMPC SQP with qp_kernel='pallas' vs 'xla'.

Round-3 VERDICT item 1: promote the full-Pallas Mehrotra kernel
(ops/pallas_ipm.build_pallas_qp_solver_h — whole IPM loop in one kernel
launch, state resident in VMEM) onto the production SQP path and measure it
at the bench operating point (N=20, q=100, batch 2048, R=32 scan-amortized).

Usage: python scripts/bench_pallas_sqp.py [tile ...]
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
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import (make_lbmpc_solver_fused,
                                                 make_lbmpc_solver_hybrid)
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q = 20, 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=2, ipm_iters=16,
                                   dtype="float32"))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="fmincon", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=16)

    batch, R = 2048, 32
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                     + 0.01 * rng.standard_normal((R, batch, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), f32),
        valid=jnp.ones((R, batch, q), f32),
        count=jnp.full((R, batch), q, jnp.int32))
    z0 = jnp.zeros((R, batch, sc.nz), f32)

    def make_scan(solve_b):
        @jax.jit
        def run(dx, windows, z0):
            def body(acc, inp):
                d, w_, z = inp
                zs, conv = solve_b(d, w_, z)
                return acc + jnp.sum(zs[:, 0]), conv
            acc, convs = jax.lax.scan(body, jnp.float32(0.0), (dx, windows, z0))
            return acc, convs
        return run

    def force(out):
        return float(np.asarray(out[0]).ravel()[0])

    def bench(name, solve_b, reps=5):
        run = make_scan(solve_b)
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
            name=name, step_ms=round(step * 1e3, 3),
            solves_per_s=round(batch / step, 0), conv=round(conv, 5),
            compile_s=round(compile_s, 1))), flush=True)
        return step, conv

    mode = sys.argv[1] if len(sys.argv) > 1 else "ab"
    if mode == "ab":
        bench("xla_s2i16", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, **kw))
        bench("pallas_s2i16_t256", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas", tile=256, **kw))
        bench("hybrid_pallas_t256", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas", tile=256,
            repair_frac=24.0 / batch, repair_sqp_iters=1, repair_ipm_iters=8,
            repair_warm="fused", **kw))
    elif mode == "ladder":
        # ladder variants on the pallas QP backend (alpha_stats.py: GN0
        # accepts alpha=1 at 100%, GN1 at 86.7% with a graded tail)
        LADDERS = {
            "full6": (1.0, 0.5, 0.25, 0.125, 0.0625),
            "gn0_1_gn1_3": ((1.0,), (1.0, 0.5, 0.25)),
            "gn0_1_gn1_2": ((1.0,), (1.0, 0.5)),
            "gn0_1_gn1_1": ((1.0,), (1.0,)),
        }
        for name, al in LADDERS.items():
            bench(f"pallas_{name}", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas", tile=256,
                alphas=al, **kw))
        bench("hybrid_pallas_gn013", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas", tile=256,
            alphas=((1.0,), (1.0, 0.5, 0.25)),
            repair_frac=24.0 / batch, repair_sqp_iters=1, repair_ipm_iters=8,
            repair_warm="fused", **kw))
    elif mode == "full":
        # GN phase in-kernel too (ops/pallas_gn): two launches per GN iter
        al = ((1.0,), (1.0, 0.5, 0.25))
        bench("pallas_full_ladder6", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full", tile=256,
            **kw))
        bench("pallas_full_gn013", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full", tile=256,
            alphas=al, **kw))
        bench("hybrid_pfull_gn013", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full", tile=256,
            alphas=al, repair_frac=24.0 / batch, repair_sqp_iters=1,
            repair_ipm_iters=8, repair_warm="fused", **kw))
    elif mode == "tile":
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, alphas=al)
        base.pop("ipm_iters")
        for t in (256, 512):
            bench(f"pfull_i16_8_t{t}", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full",
                ipm_iters=(16, 8), tile=t, **base))
    elif mode == "mono":
        # one launch per GN iteration: GN + Mehrotra fused
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, tile=256, alphas=al)
        base.pop("ipm_iters")
        bench("pfull_i16_8", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full",
            ipm_iters=(16, 8), **base))
        base128 = dict(base, tile=128)
        bench("mono_i16_8_t128", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_mono",
            ipm_iters=(16, 8), **base128))
        bench("hyb_mono_i16_8_t128", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_mono",
            ipm_iters=(16, 8), repair_frac=24.0 / batch, repair_sqp_iters=1,
            repair_ipm_iters=8, repair_warm="fused", repair_backend="fused",
            **base128))
    elif mode == "mono256":
        # r5: the mono kernel at tile 256 via pallas_gn's scoped-VMEM grant
        # (VERDICT r3 item 2b — the r3/r4 mono negative was measured at its
        # then-16M-feasible tile 128; 256 OOMed at 19.3M and is now granted
        # 26.3M). A/B vs the production two-launch pfull at the same tile.
        import os
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, alphas=al)
        base.pop("ipm_iters")
        bench("pfull_i16_8_t256", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full",
            ipm_iters=(16, 8), tile=256, **base))
        prev = os.environ.get("LBMPC_MONO_TILE")
        os.environ["LBMPC_MONO_TILE"] = "256"
        try:
            bench("mono_i16_8_t256", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_mono",
                ipm_iters=(16, 8), tile=256, **base))
        finally:
            if prev is None:
                del os.environ["LBMPC_MONO_TILE"]
            else:
                os.environ["LBMPC_MONO_TILE"] = prev
    elif mode == "gn512":
        # r5: pallas_full at a SHARED tile 512 via the VMEM grants (the r3
        # negatives were OOMs under the 16M default, never timings; the
        # GN->QP packed handoff requires one tile for both kernels — a
        # mismatched 512/256 run measured conv 0.0, now prevented by
        # sqp_fused's shared _pf_tile)
        import os
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, alphas=al)
        base.pop("ipm_iters")
        prev = {v: os.environ.get(v) for v in
                ("LBMPC_GN_TILE", "LBMPC_QP_TILE")}
        os.environ["LBMPC_GN_TILE"] = os.environ["LBMPC_QP_TILE"] = "512"
        try:
            bench("pfull_i16_8_t512", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full",
                ipm_iters=(16, 8), tile=512, **base))
        finally:
            for v, p in prev.items():
                if p is None:
                    os.environ.pop(v, None)
                else:
                    os.environ[v] = p
    elif mode == "ipm":
        # per-GN IPM budgets: the warm second QP may need fewer iterations
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, qp_kernel="pallas_full", tile=256, alphas=al)
        base.pop("ipm_iters")
        for sched in ((16, 16), (16, 12), (16, 10), (16, 8), (12, 10)):
            bench(f"pfull_i{sched[0]}_{sched[1]}", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=sched, **base))
        bench("hyb_pfull_i16_10", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=(16, 10),
            repair_frac=24.0 / batch, repair_sqp_iters=1, repair_ipm_iters=8,
            repair_warm="fused", repair_backend="fused", **base))
    elif mode == "warm":
        # r5 IPM-iteration cut: QP2 warm-started from QP1's final interior
        # (s, z) — h2 = h1 - G d1 = s1 at the measured 100% alpha=1 GN0
        # acceptance, so the start is exactly primal-feasible and carries
        # the active set. Baseline = the adopted cold (16, 8).
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, qp_kernel="pallas_full", tile=256, alphas=al)
        base.pop("ipm_iters")
        bench("pfull_cold_i16_8", make_lbmpc_solver_fused(
            qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=(16, 8), **base))
        for tail in (6, 4, 2):
            bench(f"pfull_warm_i16_{tail}", make_lbmpc_solver_fused(
                qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=(16, tail),
                qp_warm=True, **base))
        bench("hyb_pfull_warm_i16_4", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=(16, 4), qp_warm=True,
            repair_frac=24.0 / batch, repair_sqp_iters=1, repair_ipm_iters=8,
            repair_warm="fused", repair_backend="fused", **base))
    elif mode == "warm2":
        # round 2 of the warm sweep: the audit cleared (14, 2)/(12, 2) at
        # conv 1.0 with the unchanged accuracy class — cut QP1's cold
        # budget too, and take the hybrid at the winner
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, qp_kernel="pallas_full", tile=256, alphas=al)
        base.pop("ipm_iters")
        for sched in ((16, 2), (14, 2), (12, 2), (10, 2)):
            bench(f"pfull_warm_i{sched[0]}_{sched[1]}",
                  make_lbmpc_solver_fused(
                      qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=sched,
                      qp_warm=True, **base))
        for sched in ((16, 2), (12, 2)):
            bench(f"hyb_pfull_warm_i{sched[0]}_{sched[1]}",
                  make_lbmpc_solver_hybrid(
                      qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=sched,
                      qp_warm=True, repair_frac=24.0 / batch,
                      repair_sqp_iters=1, repair_ipm_iters=8,
                      repair_warm="fused", repair_backend="fused", **base))
    elif mode == "warm3":
        # round 3: the audit cleared (8, 2) at the unchanged class — find
        # the cold-QP1 floor (the warm chain makes the two QPs a single
        # continued solve, so total iterations is the real budget)
        al = ((1.0,), (1.0, 0.5, 0.25))
        base = dict(kw, qp_kernel="pallas_full", tile=256, alphas=al)
        base.pop("ipm_iters")
        for sched in ((10, 2), (8, 2), (6, 2), (6, 4)):
            bench(f"pfull_warm_i{sched[0]}_{sched[1]}",
                  make_lbmpc_solver_fused(
                      qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=sched,
                      qp_warm=True, **base))
        bench("hyb_pfull_warm_i8_2", make_lbmpc_solver_hybrid(
            qp, sc.A, sc.B, sc.ocp.Ks, w, ipm_iters=(8, 2), qp_warm=True,
            repair_frac=24.0 / batch, repair_sqp_iters=1, repair_ipm_iters=8,
            repair_warm="fused", repair_backend="fused", **base))
    elif mode == "repair":
        al = ((1.0,), (1.0, 0.5, 0.25))
        for rk, rs, ri in ((24, 1, 8), (24, 2, 16), (128, 2, 16)):
            bench(f"hyb_pfull_frep_k{rk}_s{rs}i{ri}", make_lbmpc_solver_hybrid(
                qp, sc.A, sc.B, sc.ocp.Ks, w, qp_kernel="pallas_full",
                tile=256, alphas=al, repair_frac=rk / batch,
                repair_sqp_iters=rs, repair_ipm_iters=ri,
                repair_warm="fused", repair_backend="fused", **kw))


if __name__ == "__main__":
    main()
