"""Benchmark: batched LBMPC solves/s on the current default backend.

Measures the BASELINE.json headline metric: LBMPC OCP solves per second per
chip at N=20 horizon (full SQP solve: learned-model Gauss-Newton cost + the
nominal constraint stack + terminal set, per reference semantics), plus the
per-step latency of one batched solve vs the 10 ms real-time budget.

vs_baseline compares against the reference's measured tracking-LMPC solve rate
(115.0 ms mean per solve, CasADi+IPOPT on Intel CPU — BASELINE.md), i.e.
vs_baseline = our_solves_per_s / (1 / 0.115).

Prints ONE JSON line.
"""

import dataclasses
import json
import time

import numpy as np


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update("jax_compilation_cache_dir", str(__import__("pathlib").Path(__file__).parent / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    # Throughput path runs the IPM/SQP in float32 (active-set-exact, ~2e-4
    # control accuracy vs f64 — TPU f64 is emulated ~29x slower); parity tests
    # keep float64 on CPU.
    N = 20
    q = 100
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q),
        solver=dataclasses.replace(cfg.solver, sqp_iters=3, ipm_iters=20, dtype="float32"),
    )
    sc = build_scenario(cfg)

    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import (make_lbmpc_solver_fused,
                                                 make_lbmpc_solver_hybrid)

    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    )
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    # Round-3 headline configuration (scripts/bench_pallas_sqp.py A/Bs):
    #   - qp_kernel="pallas_full": the GN phase (residual + hand-derived
    #     Jacobian + H/g normal terms, ops/pallas_gn.py) and the full
    #     Mehrotra IPM (ops/pallas_ipm.py) each run as ONE kernel launch
    #     with batch-in-lanes VMEM-resident state — two launches per GN
    #     iteration, no XLA-side J/H materialization (the r2 XLA path spent
    #     3.5 ms/step there, nearly all op-issue overhead);
    #   - per-GN Armijo ladders ((1.0,), (1.0, .5, .25)): measured on the
    #     bench distribution (scripts/alpha_stats.py) GN iter 0 accepts
    #     alpha=1 on 100.000% of lanes; iter 1 keeps fallbacks for its 13%
    #     tail; merit at the iterate reuses the Jacobian pass's residual;
    #   - kernel semantics equality-tested vs the XLA path at f32 roundoff
    #     (tests/test_pallas_gn.py, test_pallas_ipm.py);
    #   - r5 warm IPM chain (qp_warm): QP2 starts from QP1's final interior
    #     (s, z) — exactly primal-feasible at x=0 because GN0 accepts
    #     alpha=1 on 100% of lanes (h2 = h1 - G d1 = s1) — so the two QPs
    #     act as ONE continued solve and the schedule drops (16, 8) ->
    #     (8, 2). Accuracy audit: identical c0 error class vs the vmapped
    #     reference (p50 8.1e-3 / p99 1.0e-2 / max 1.1e-2) all the way down
    #     to (4, 2); (8, 2) is adopted with a 2x total-iteration margin
    #     over that floor. Measured (scripts/bench_pallas_sqp.py warm3):
    #     cold (16,8) 724.7k -> warm (8,2) 1,071k solves/s, conv 0.99998.
    LADDER = ((1.0,), (1.0, 0.5, 0.25))
    IPM_SCHED = (8, 2)
    fused_fast_solve = make_lbmpc_solver_fused(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=IPM_SCHED,
        qp_kernel="pallas_full", tile=256, alphas=LADDER, qp_warm=True,
    )
    # conv-1.0 headline: + gather-compacted repair of the flagged mu-stall
    # lanes, now ALSO through the fused pallas machinery at K=24 lanes
    # (repair_backend="fused": 1 GN x 8 IPM warm-seeded at the fused
    # iterate; the old vmapped repair cost ~1.4 ms of K-insensitive
    # sequential depth, the fused one ~0.2 ms). On-chip: conv 1.0, 3.88 ms,
    # 527k solves/s; deeper repair budgets again only cost time.
    hybrid_solve = make_lbmpc_solver_hybrid(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=IPM_SCHED,
        qp_kernel="pallas_full", tile=256, alphas=LADDER, qp_warm=True,
        repair_frac=24.0 / 2048.0, repair_sqp_iters=1, repair_ipm_iters=8,
        repair_warm="fused", repair_backend="fused",
    )

    rng = np.random.default_rng(0)
    dt = jnp.float32

    def batch_inputs(batch, R):
        dx = jnp.asarray(
            np.array([-0.35, -0.4, 0.0, 0.0])
            + 0.01 * rng.standard_normal((R, batch, 4)),
            dt,
        )
        window = init_window(q, dtype=dt)
        windows = type(window)(
            X=jnp.asarray(0.1 * rng.standard_normal((R, batch, q, 3)), dt),
            Y=jnp.asarray(0.001 * rng.standard_normal((R, batch, q, 4)), dt),
            valid=jnp.ones((R, batch, q), dt),
            count=jnp.full((R, batch), q, jnp.int32),
        )
        z0 = jnp.zeros((R, batch, sc.nz), dt)
        return dx, windows, z0

    # Production shape: the closed loop runs hundreds of sequential batched
    # solves inside one jitted scan, so the dispatch overhead of the remote
    # runtime (~25 ms/call) is amortized. Measure R solves per call the same
    # way and report per-solve throughput.
    def make_scan(solve_b, R):
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
        # axon remote backend: block_until_ready does not reliably block;
        # force completion via a host transfer of a scalar
        return float(np.asarray(out[0]).ravel()[0])

    backends = {
        "vmapped_sqp": jax.vmap(sc.solve),
        "pfull_warm_s2i8_2": fused_fast_solve,
        "hybrid_pfull_warm_s2i8_2": hybrid_solve,
    }
    best = None
    runs = {}
    for name, batch, R in (("vmapped_sqp", 8192, 8),
                           ("pfull_warm_s2i8_2", 2048, 32),
                           ("hybrid_pfull_warm_s2i8_2", 2048, 32)):
        dx, windows, z0 = batch_inputs(batch, R)
        run = make_scan(backends[name], R)
        runs[name] = (run, (dx, windows, z0))
        force(run(dx, windows, z0))
        reps = 5
        times = []
        out = None
        for _ in range(reps):
            t0 = time.perf_counter()
            out = run(dx, windows, z0)
            force(out)
            times.append(time.perf_counter() - t0)
        step = float(np.median(times)) / R
        sps = batch / step
        conv = float(np.mean(np.asarray(out[1])))
        cand = dict(name=name, batch=batch, R=R, step_ms=step * 1e3,
                    solves_per_s=sps, conv=conv)
        print(json.dumps({"candidate": cand}), file=__import__("sys").stderr, flush=True)
        # require a production-grade fleet: >=99.9% converged lanes for the
        # headline (VERDICT r1: a backend that leaves 0.3% of the fleet
        # unconverged is not the final answer)
        if conv >= 0.999 and (best is None or sps > best["solves_per_s"]):
            best = cand

    if best is None:
        # no backend met the conv gate (regressed chip/config): fail loudly
        # with the candidates instead of crashing on best["name"] (ADVICE r2)
        print(json.dumps({"error": "no backend met conv>=0.999",
                          "metric": "lbmpc_sqp_solves_per_s_N20",
                          "value": 0.0, "unit": "solves/s",
                          "vs_baseline": 0.0}))
        raise SystemExit(1)

    # p99 per-step latency (BASELINE.json names it): >=100 call samples of the
    # winning backend at R=32 steps per call (VERDICT r3 item 5: 15 samples
    # made the percentile the max; 100+ samples give a real distribution).
    # Each sample = per-call mean step time INCLUDING the remote runtime's
    # ~25 ms dispatch+RTT divided by R (~0.8 ms at R=32) — a conservative
    # upper bound on the on-device step time. Intra-call per-step variance:
    # every step under jit executes the identical fixed-iteration program
    # (no data-dependent control flow anywhere in the solver), so within-call
    # steps differ only by hardware noise; across-call jitter IS the tail
    # being measured (analysis/solve_stats implements the reference's 5x500
    # CI protocol, solve_stats.m:9-30).
    from lbmpc_tpu.analysis.solve_stats import SolveStats

    R99 = 32
    N_SAMPLES = 100
    p99_run = make_scan(backends[best["name"]], R99)
    p99_args = batch_inputs(best["batch"], R99)
    force(p99_run(*p99_args))
    samples = []
    for _ in range(N_SAMPLES):
        t0 = time.perf_counter()
        force(p99_run(*p99_args))
        samples.append((time.perf_counter() - t0) / R99)
    stats = SolveStats.from_samples(np.asarray(samples))
    run, args = runs[best["name"]]

    # MFU / roofline. XLA's cost model excludes custom-call (Pallas) bodies
    # and undercounts the scanned fused program, so FLOPs come from the
    # analytic per-phase model (every term names the op it counts —
    # analysis/roofline.py); HBM bytes still come from the XLA cost model.
    from lbmpc_tpu.analysis.roofline import (Roofline,
                                             fused_sqp_flops_per_solve,
                                             fused_sqp_op_split,
                                             program_costs)

    ne = (N - 2) * 5 + 4 + 4
    # r5: the Pallas kernel's KKT assembly executes suffix-restricted MACs
    # (plus padding) — scale the analytic kkt term to what the hardware
    # actually runs so the MFU/roofline is not flattered (or understated)
    from lbmpc_tpu.ops.pallas_ipm import assembly_mac_ratio

    kkt_ratio = assembly_mac_ratio(np.asarray(qp.G))
    shape_kw = dict(N=N, n=4, m=1, q=q, mc=qp.G.shape[0], ne=ne, nz=qp.nz,
                    kkt_mac_ratio=kkt_ratio)
    # n_merit=2 / ipm_iters: per-GN averages of the asymmetric ladder
    # ((1,), (1,.5,.25)) and the warm IPM schedule — the model's totals are
    # linear in both, so the averages give the exact sums (m0 reuses the
    # Jacobian pass's residual, costing no extra rollout)
    ipm_avg = sum(IPM_SCHED) / len(IPM_SCHED)
    phases = fused_sqp_flops_per_solve(sqp_iters=2, ipm_iters=ipm_avg,
                                       n_merit=2, **shape_kw)
    split = fused_sqp_op_split(sqp_iters=2, ipm_iters=ipm_avg, n_merit=2,
                               **shape_kw)
    # the K=24 fused 1-GN/8-IPM repair touches 24/2048 of lanes: ~1% extra
    rfrac = 24.0 / 2048.0
    repair_frac_flops = rfrac * fused_sqp_flops_per_solve(
        sqp_iters=1, ipm_iters=8, n_merit=3, **shape_kw)["total"]
    repair_split = fused_sqp_op_split(sqp_iters=1, ipm_iters=8, n_merit=3,
                                      **shape_kw)
    hyb = best["name"].startswith("hybrid")
    flops_per_solve = phases["total"] + (repair_frac_flops if hyb else 0.0)
    mxu_solve = split["mxu"] + (rfrac * repair_split["mxu"] if hyb else 0.0)
    vpu_solve = split["vpu"] + (rfrac * repair_split["vpu"] if hyb else 0.0)
    xla_flops, xla_bytes = program_costs(run, *args)
    solves_call = best["R"] * best["batch"]
    rl = Roofline(flops_per_call=flops_per_solve * solves_call,
                  bytes_per_call=xla_bytes,
                  call_s=stats.median_ms * 1e-3 * best["R"],
                  solves_per_call=solves_call,
                  mxu_flops_per_call=mxu_solve * solves_call,
                  vpu_flops_per_call=vpu_solve * solves_call)
    rl_dict = rl.as_dict()
    rl_dict["flops_model"] = "analytic (XLA cost model excludes Pallas custom calls; its count: %.0f/solve)" % (
        xla_flops / max(solves_call, 1))
    rl_dict["phase_flops_frac"] = {
        k: round(v / phases["total"], 3) for k, v in phases.items()
        if k != "total"}

    # ---- DMS flagship (N=100, q=100, casadi family) — VERDICT r4 item 1:
    # the reference's flagship formulation (DMS_LBMPC_casadi.m:122-130) on
    # the fast path, driver-captured. Fused batch SQP (s2, IPM (16,8)) with
    # qp_kernel="pallas_full": the N=100 Pallas GN kernel handing packed H
    # to the full-Pallas Mehrotra kernel, made feasible at nz_p=104 by the
    # r5 scoped-VMEM grants (the r4 'VMEM-infeasible at the 128-lane
    # minimum' barrier was the default 16M policy, not the hardware) and
    # the causal-suffix KKT assembly. Measured r5 ladder
    # (scripts/bench_dms_flagship.py, b1024, conv 1.0 throughout):
    # 52.5 ms/step XLA+pallas_chol (r4 production) -> 36.4 qp_kernel=
    # "pallas" -> 22.7 pallas_full (45.1k solves/s, 2.31x r4). Accuracy:
    # scripts/accuracy_audit_dms.py pallas-vs-XLA backend c0 p50 4.4e-6 /
    # max 1.2e-2 (the documented hard-lane class), identical spread vs the
    # vmapped reference.
    from lbmpc_tpu.controllers.condensed import build_casadi_dms

    def _guarded(fn, label):
        # a secondary-metric failure (e.g. a VMEM regression in a new kernel
        # config) must not cost the headline JSON line: degrade to an error
        # field the judge can see instead of crashing the driver capture
        try:
            return fn()
        except Exception as e:  # noqa: BLE001 - deliberate breadth
            import sys as _sys
            print(json.dumps({"bench_block_failed": label,
                              "error": repr(e)[:500]}),
                  file=_sys.stderr, flush=True)
            return {"error": f"{label} failed: {type(e).__name__}"}

    def _dms_block():
        dms_cfg = make_preset("DMS_LBMPC_q100")
        dms_cfg = dataclasses.replace(
            dms_cfg, solver=dataclasses.replace(dms_cfg.solver, dtype="float32"))
        dms_sc = build_scenario(dms_cfg)
        dms_qp = build_casadi_dms(
            dms_sc.A, dms_sc.B, dms_sc.ocp.Q, dms_sc.ocp.R, dms_sc.ocp.P,
            dms_sc.ocp.T, dms_sc.ocp.LAMBDA, dms_sc.ocp.PSI, dms_sc.cs,
            dms_cfg.ocp.N, delta=dms_cfg.plant.ts,
            terminal_at=dms_cfg.ocp.terminal_at,
            tighten_first_step=dms_cfg.ocp.tighten_first_step)
        dms_w = LBMPCWeights.make(dms_sc.ocp.Q, dms_sc.ocp.R, dms_sc.ocp.P,
                                  dms_sc.ocp.T, dms_sc.ocp.LAMBDA, dms_sc.ocp.PSI)
        # r5 warm IPM chain at the DMS shape (scripts/bench_dms_flagship.py
        # warm): cold (16,8) 42.0k -> warm (8,2) 68.3k solves/s, conv 1.0;
        # accuracy graded by scripts/accuracy_audit_dms.py (warm rows)
        dms_solve = make_lbmpc_solver_fused(
            dms_qp, dms_sc.A, dms_sc.B, dms_sc.ocp.Ks, dms_w, family="casadi",
            delta=dms_cfg.plant.ts, bandwidth=dms_cfg.oracle.bandwidth,
            ridge=dms_cfg.oracle.ridge, dx_ref=np.asarray(dms_cfg.dx_ref),
            sqp_iters=2, ipm_iters=(8, 2), qp_warm=True,
            qp_kernel="pallas_full", tile=128,
            alphas=((1.0,), (1.0, 0.5, 0.25)))
        dms_B, dms_R = 1024, 8
        dms_run = make_scan(dms_solve, dms_R)
        dms_x0 = np.asarray(dms_cfg.x_init_abs) - np.asarray(dms_cfg.plant.x_wp)
        dms_dx = jnp.asarray(dms_x0 + 0.01 * rng.standard_normal((dms_R, dms_B, 4)), dt)
        dw0 = init_window(100, dtype=dt)
        dms_wins = type(dw0)(
            X=jnp.asarray(0.1 * rng.standard_normal((dms_R, dms_B, 100, 3)), dt),
            Y=jnp.asarray(0.001 * rng.standard_normal((dms_R, dms_B, 100, 4)), dt),
            valid=jnp.ones((dms_R, dms_B, 100), dt),
            count=jnp.full((dms_R, dms_B), 100, jnp.int32))
        dms_z0 = jnp.zeros((dms_R, dms_B, dms_qp.nz), dt)
        force(dms_run(dms_dx, dms_wins, dms_z0))
        force(dms_run(dms_dx, dms_wins, dms_z0))   # 2x warmup: the first timed
        # call after compile caught a multi-second straggler in the r4 shakeout
        dms_times = []
        dms_out = None
        for _ in range(30):
            t0 = time.perf_counter()
            dms_out = dms_run(dms_dx, dms_wins, dms_z0)
            force(dms_out)
            dms_times.append((time.perf_counter() - t0) / dms_R)
        dms_stats = SolveStats.from_samples(np.asarray(dms_times))
        dms_step = float(np.median(dms_times))
        return {
            "solves_per_s": round(dms_B / dms_step, 1),
            "batch": dms_B,
            "batched_step_ms": round(dms_step * 1e3, 2),
            "p99_step_ms": round(dms_stats.p99_ms, 2),
            "converged_frac": round(float(np.mean(np.asarray(dms_out[1]))), 4),
            # reference analog: tracking-NMPC (the closest published solve-time
            # series for an N=100 casadi NLP on MGCM) 257.7 ms mean, Intel CPU
            "vs_ref_tnmpc": round(dms_B / dms_step * 0.2577, 1),
        }

    dms_metrics = _guarded(_dms_block, "dms_flagship_N100_q100")

    # ---- fleet closed loop (VERDICT r4 item 3): chunk-8192 cohort, 10
    # receding-horizon steps through run_closed_loop_batched on the hybrid
    # pallas_full backend — the fleet_100k.py per-cohort engine, with the
    # r4 lockstep window push (the per-lane scatter was 78% of the step) ----
    from lbmpc_tpu.runtime.scenario import build_fleet_episode

    def _fleet_block():
        fl_cfg = make_preset("LBMPC_N40", iterations=10)
        fl_cfg = dataclasses.replace(
            fl_cfg,
            ocp=dataclasses.replace(fl_cfg.ocp, N=N),
            solver=dataclasses.replace(fl_cfg.solver, dtype="float32",
                                       sqp_iters=2, ipm_iters=16),
            oracle=dataclasses.replace(fl_cfg.oracle, q=32))
        # r5 cross-step warm chain (scripts/fleet_warm_ab.py): the QP
        # kernel's interior state rides the episode carry, so every step
        # runs the short (4, 2) schedule (step 0 = the audit-cleared cold
        # (4, 2)). Measured at cohort 8192: cold (16,16) 642k -> warm
        # (8,2) 1,067k -> chain (4,2) 1,258k closed-loop solves/s, conv
        # 1.0 throughout; chain-vs-cold trajectories agree at p99 4e-4
        # (the 0.088 max is a single lane the cold path itself flags).
        _, run_cohort = build_fleet_episode(
            fl_cfg, backend="hybrid", qp_kernel="pallas_full",
            repair_frac=1.0 / 85.0, ipm_iters=(4, 2), qp_warm=True,
            warm_chain=True)
        FLB = 8192
        fl_dx = jnp.asarray(
            np.array([-0.35, -0.4, 0.0, 0.0])
            + rng.uniform(-0.02, 0.02, (FLB, 4)))
        fl_res = run_cohort(fl_dx)
        float(np.asarray(fl_res.sys_history[:1, -1, 0]).ravel()[0])
        fl_times = []
        for _ in range(3):
            t0 = time.perf_counter()
            fl_res = run_cohort(fl_dx)
            float(np.asarray(fl_res.sys_history[:1, -1, 0]).ravel()[0])
            fl_times.append(time.perf_counter() - t0)
        fl_wall = float(np.median(fl_times))
        fl_conv = float(np.mean(np.asarray(fl_res.solver_converged)))
        return {
            "closed_loop_solves_per_s": round(FLB * 10 / fl_wall, 1),
            "cohort": FLB, "steps": 10,
            "step_ms": round(fl_wall / 10 * 1e3, 2),
            "converged_frac": round(fl_conv, 4),
        }

    fleet_metrics = _guarded(_fleet_block, "fleet_closed_loop")

    ref_solve_s = 0.115  # reference tracking-LMPC mean solve time (BASELINE.md)
    print(
        json.dumps(
            {
                "metric": "lbmpc_sqp_solves_per_s_N20",
                "value": round(best["solves_per_s"], 1),
                "unit": "solves/s",
                "vs_baseline": round(best["solves_per_s"] * ref_solve_s, 1),
                "backend_impl": best["name"],
                "batch": best["batch"],
                "solves_per_call": best["R"] * best["batch"],
                "batched_step_ms": round(best["step_ms"], 2),
                "p99_step_ms": round(stats.p99_ms, 2),
                "p99_protocol": (
                    f"p99 of {N_SAMPLES} per-call mean step times (R={R99}, "
                    "incl. dispatch/R ~0.8 ms; fixed-iteration jit => "
                    "intra-call steps are data-independent)"),
                "p99_n_samples": N_SAMPLES,
                "rt_budget_ms": 10.0,
                "p99_within_rt_budget": not stats.violates_budget(10.0),
                "converged_frac": round(best["conv"], 4),
                "roofline": rl_dict,
                # second + third metric lines (VERDICT r4 items 1 & 3),
                # carried as fields to keep the one-JSON-line contract
                "dms_flagship_N100_q100": dms_metrics,
                "fleet_closed_loop": fleet_metrics,
                "backend": jax.default_backend(),
            }
        )
    )


if __name__ == "__main__":
    main()
