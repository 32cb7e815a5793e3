"""Runtime-layer tests: sharding, determinism, failure masking, checkpointing."""

import dataclasses
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.checkpoint import EpisodeState, load, save
from lbmpc_tpu.runtime.scenario import build_scenario
from lbmpc_tpu.runtime.sharding import (
    global_solve_stats,
    scenario_mesh,
    shard_scenarios,
    sharded_episode_runner,
)


def _small_cfg(**kw):
    cfg = make_preset("LBMPC_N40", iterations=3, **kw)
    return dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=8),
        solver=dataclasses.replace(cfg.solver, sqp_iters=1, ipm_iters=10),
        oracle=dataclasses.replace(cfg.oracle, q=16),
    )


def test_eight_device_mesh_available():
    assert len(jax.devices()) == 8  # xla_force_host_platform_device_count


def test_sharded_episode_matches_unsharded():
    sc = build_scenario(_small_cfg())
    mesh = scenario_mesh(8)
    runner = sharded_episode_runner(sc.episode, mesh)
    batch = 16
    dx0 = jnp.asarray(
        np.tile([-0.35, -0.4, 0.0, 0.0], (batch, 1))
        + 0.002 * np.random.default_rng(0).standard_normal((batch, 4))
    )
    sharded = runner(shard_scenarios(mesh, dx0))
    local = jax.vmap(sc.episode)(dx0)
    np.testing.assert_allclose(
        np.asarray(sharded.sys_history), np.asarray(local.sys_history), atol=1e-9
    )


def test_global_solve_stats_psum():
    mesh = scenario_mesh(8)
    conv = jnp.asarray([True] * 13 + [False] * 3)
    n_conv, n_tot = global_solve_stats(mesh, shard_scenarios(mesh, conv))
    assert (n_conv, n_tot) == (13, 16)


def test_episode_deterministic_across_runs():
    """jit-determinism: same inputs -> bit-identical trajectories (the race-
    detection analog of SURVEY.md §5 for a single device)."""
    sc = build_scenario(_small_cfg())
    dx0 = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    a = np.asarray(sc.episode(dx0).sys_history)
    b = np.asarray(sc.episode(dx0).sys_history)
    np.testing.assert_array_equal(a, b)


def test_failure_masking_no_nan_propagation():
    """Infeasible scenarios flag converged=False without poisoning the batch."""
    sc = build_scenario(_small_cfg())
    dx0 = jnp.asarray([[-0.35, -0.4, 0.0, 0.0], [-0.6, -0.6, 0.0, 0.0]])
    res = jax.vmap(sc.episode)(dx0)
    conv = np.asarray(res.solver_converged)
    assert conv[0].all()
    assert not conv[1].any()
    assert np.isfinite(np.asarray(res.sys_history)[0]).all()


def test_fault_injection_isolated_across_lanes():
    """A poisoned (NaN) scenario must not contaminate its batch neighbors —
    the batched analog of per-process fault isolation (SURVEY.md §5)."""
    sc = build_scenario(_small_cfg())
    good = jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    bad = jnp.asarray([jnp.nan, -0.4, 0.0, 0.0])
    res = jax.vmap(sc.episode)(jnp.stack([good, bad]))
    sysH = np.asarray(res.sys_history)
    assert np.isfinite(sysH[0]).all()       # healthy lane unaffected
    assert np.isnan(sysH[1]).any()          # poisoned lane visibly failed
    ref = np.asarray(sc.episode(good).sys_history)
    np.testing.assert_allclose(sysH[0], ref, atol=1e-9)


def test_fixed_oracle_no_online_updates(golden):
    """BASELINE config 2: LBMPC with a fixed pretrained oracle — the data
    window must stay untouched through the episode."""
    from lbmpc_tpu.oracle import window_from_arrays

    data = golden("train_data")
    cfg = dataclasses.replace(
        _small_cfg(), learn_online=False,
        oracle=dataclasses.replace(_small_cfg().oracle, q=64),
    )
    sc = build_scenario(cfg)
    w = window_from_arrays(data[:3], data[3:7], q=64)
    res = sc.episode_with_window(jnp.asarray(cfg.dx_init), w)
    assert bool(res.solver_converged.all())
    assert int(res.final_window.count) == 64
    np.testing.assert_array_equal(np.asarray(res.final_window.Y), np.asarray(w.Y))


def test_checkpoint_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    st = EpisodeState(
        step=42,
        x_abs=rng.standard_normal((4, 4)),
        window_X=rng.standard_normal((4, 16, 3)),
        window_Y=rng.standard_normal((4, 16, 4)),
        window_valid=np.ones((4, 16)),
        window_count=np.full(4, 16),
        z_warm=rng.standard_normal((4, 9)),
    )
    p = tmp_path / "ck.npz"
    save(p, st, meta={"preset": "LBMPC_N40"})
    st2, meta = load(p)
    assert st2.step == 42
    assert meta["preset"] == "LBMPC_N40"
    np.testing.assert_array_equal(st.x_abs, st2.x_abs)
    np.testing.assert_array_equal(st.window_Y, st2.window_Y)


def test_checkpoint_resume_matches_uninterrupted(tmp_path):
    """Interrupted-then-resumed episode == uninterrupted episode (VERDICT r1
    item 9): run 40 steps, checkpoint through disk, resume 30 more; the
    concatenated history and every downstream state must match the single
    70-step run exactly (same jitted program, same f64 carry)."""
    from lbmpc_tpu.runtime.checkpoint import capture, load, resume, save

    cfg = make_preset("LBMPC_N40", iterations=70)
    sc = build_scenario(cfg)
    full = sc.run()

    sc40 = build_scenario(dataclasses.replace(cfg, iterations=40))
    part1 = sc40.run()
    p = tmp_path / "ck.npz"
    save(p, capture(part1, step=40), meta={"preset": cfg.name})
    state, meta = load(p)
    assert state.step == 40 and meta["preset"] == cfg.name
    part2 = resume(sc, state, steps=30)

    h_full = np.asarray(full.sys_history)
    h1 = np.asarray(part1.sys_history)     # rows 0..40 (incl. initial)
    h2 = np.asarray(part2.sys_history)     # rows 40..70 (its "initial" = resume point)
    np.testing.assert_allclose(h1, h_full[:41], atol=1e-12)
    np.testing.assert_allclose(h2[1:], h_full[41:], atol=1e-12)
    np.testing.assert_allclose(np.asarray(part2.final_x),
                               np.asarray(full.final_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(part2.final_window.Y),
                               np.asarray(full.final_window.Y), atol=1e-12)
    assert bool(part2.solver_converged.all())


def test_sharded_fleet_checkpoint_resume(tmp_path):
    """Capture/resume of a mesh-sharded fleet cohort (VERDICT r2 item 6):
    interrupt a sharded batched run mid-sweep, round-trip through disk,
    resume re-sharded over the same 8-device mesh — concatenation equals
    the uninterrupted sharded run to f64 roundoff (the resumed program is a
    differently-fused jit, so bitwise equality is not guaranteed; 1e-12
    matches the single-episode resume test's tolerance)."""
    from lbmpc_tpu.runtime.checkpoint import capture, load, resume, save
    from lbmpc_tpu.runtime.sharding import (scenario_mesh,
                                            shard_scenarios,
                                            sharded_episode_runner)

    cfg = make_preset("LBMPC_N40", iterations=24)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=8),
        solver=dataclasses.replace(cfg.solver, sqp_iters=1, ipm_iters=12),
        oracle=dataclasses.replace(cfg.oracle, q=8),
    )
    sc = build_scenario(cfg)
    rng = np.random.default_rng(3)
    B = 16
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0]) + rng.uniform(-0.02, 0.02, (B, 4)))
    mesh = scenario_mesh()
    full = sharded_episode_runner(sc.episode, mesh)(shard_scenarios(mesh, dx0))

    sc12 = build_scenario(dataclasses.replace(cfg, iterations=12))
    part1 = sharded_episode_runner(sc12.episode, mesh)(
        shard_scenarios(mesh, dx0))
    p = tmp_path / "fleet_ck.npz"
    save(p, capture(part1, step=12), meta={"preset": cfg.name, "fleet": B})
    state, meta = load(p)
    assert meta["fleet"] == B and state.x_abs.shape == (B, 4)
    part2 = resume(sc, state, steps=12, mesh=mesh)

    h_full = np.asarray(full.sys_history)
    np.testing.assert_array_equal(np.asarray(part1.sys_history),
                                  h_full[:, :13])
    np.testing.assert_allclose(np.asarray(part2.sys_history)[:, 1:],
                               h_full[:, 13:], atol=1e-12)
    np.testing.assert_allclose(np.asarray(part2.final_x),
                               np.asarray(full.final_x), atol=1e-12)
    np.testing.assert_allclose(np.asarray(part2.final_window.Y),
                               np.asarray(full.final_window.Y), atol=1e-12)


def test_fleet_runner_chunked_matches_direct():
    """fleet_runner (BASELINE config 5 driver): cohort-scanned fleet equals
    the directly-vmapped episodes, stats reduce across the CPU mesh."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario
    from lbmpc_tpu.runtime.sharding import (
        fleet_runner,
        global_solve_stats,
        scenario_mesh,
    )

    cfg = make_preset("LBMPC_N40", iterations=3)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=8),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=1, ipm_iters=10),
        oracle=dataclasses.replace(cfg.oracle, q=8),
    )
    sc = build_scenario(cfg)
    rng = np.random.default_rng(0)
    F = 64
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0]) + rng.uniform(-0.02, 0.02, (F, 4)))

    mesh = scenario_mesh()  # 8 virtual CPU devices (tests/conftest.py)
    run = fleet_runner(sc.episode, mesh, chunk=16)
    res = run(dx0)
    assert res.sys_history.shape[0] == F

    direct = jax.vmap(sc.episode)(dx0)
    np.testing.assert_allclose(
        np.asarray(res.sys_history), np.asarray(direct.sys_history),
        rtol=0, atol=1e-6)

    n_conv, n_tot = global_solve_stats(mesh, res.solver_converged.all(axis=-1))
    assert n_tot == F and n_conv > 0

    import pytest

    with pytest.raises(ValueError):
        run(dx0[:50])  # not a chunk multiple


def test_sharded_fused_hybrid_solve_matches_unsharded():
    """Sharded == unsharded for the fused/hybrid QP path (VERDICT r2 item 5:
    previously only the vmapped episode path had this gate). The hybrid
    solver (bench headline backend) is run once with replicated inputs and
    once with scenario-sharded inputs over the 8-device mesh; tolerance is
    the fused f32 backend's documented accuracy class (sharding changes XLA
    fusion order, and the Mehrotra iteration amplifies roundoff near
    active-set boundaries — a sharding BUG would produce O(1) garbage)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_hybrid
    from lbmpc_tpu.oracle import init_window

    N, q = 12, 16
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    B = 16
    hybrid = make_lbmpc_solver_hybrid(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=12,
        tile=B, interpret=True, repair_frac=2.0 / B, repair_sqp_iters=1,
        repair_ipm_iters=8, repair_warm="fused")
    rng = np.random.default_rng(7)
    f32 = jnp.float32
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                      + 0.01 * rng.standard_normal((B, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((B, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((B, q, 4)), f32),
        valid=jnp.ones((B, q), f32), count=jnp.full((B,), q, jnp.int32))
    z0 = jnp.zeros((B, qp.nz), f32)

    z_un, conv_un = hybrid(dx0, wins, z0)
    mesh = scenario_mesh()
    shard = NamedSharding(mesh, P("scenario"))
    args = jax.device_put((dx0, wins, z0),
                          jax.tree.map(lambda _: shard, (dx0, wins, z0)))
    z_sh, conv_sh = hybrid(*args)
    assert np.abs(np.asarray(z_sh) - np.asarray(z_un)).max() < 2e-2
    # identical convergence verdicts lane-by-lane
    assert bool(conv_un.all()) and bool(conv_sh.all())


@pytest.mark.skipif(not os.environ.get("RUN_SLOW"),
                    reason="interpret-mode pallas_full compile is minutes")
def test_sharded_pallas_full_matches_unsharded():
    """Sharded == unsharded for the PRODUCTION (pallas_full, fused-repair)
    backend on the 8-device mesh. Slow: interpret-mode XLA compilation of
    the unrolled kernel graphs; the fast gate on the xla hybrid
    (test_sharded_fused_hybrid_solve_matches_unsharded) covers the same
    data movement every CI run. Also regression-guards the lazily-built
    kernel caches against tracer leaks across re-traces (the sharded call
    is a second trace of the same solver — caught a real bug)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_hybrid
    from lbmpc_tpu.oracle import init_window

    N, q, B = 12, 16, 16
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    hy = make_lbmpc_solver_hybrid(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=cfg.plant.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=12, tile=2,
        interpret=True, qp_kernel="pallas_full",
        alphas=((1.0,), (1.0, 0.5)), repair_frac=2.0 / B,
        repair_sqp_iters=1, repair_ipm_iters=8, repair_warm="fused",
        repair_backend="fused")
    rng = np.random.default_rng(0)
    f32 = jnp.float32
    dx = jnp.asarray(np.array([-0.35, -0.4, 0, 0])
                     + 0.01 * rng.standard_normal((B, 4)), f32)
    win0 = init_window(q, dtype=f32)
    wins = type(win0)(
        X=jnp.asarray(0.1 * rng.standard_normal((B, q, 3)), f32),
        Y=jnp.asarray(0.001 * rng.standard_normal((B, q, 4)), f32),
        valid=jnp.ones((B, q), f32), count=jnp.full((B,), q, jnp.int32))
    z0 = jnp.zeros((B, qp.nz), f32)
    z_un, c_un = hy(dx, wins, z0)
    mesh = scenario_mesh()
    shard = NamedSharding(mesh, P("scenario"))
    args = jax.device_put((dx, wins, z0),
                          jax.tree.map(lambda _: shard, (dx, wins, z0)))
    z_sh, c_sh = hy(*args)
    assert np.abs(np.asarray(z_sh) - np.asarray(z_un)).max() < 2e-2
    assert bool(np.asarray(c_un).all()) and bool(np.asarray(c_sh).all())


def test_batched_fused_episode_matches_f64_episodes():
    """run_closed_loop_batched + fused SQP backend: whole-cohort episode scan
    reproduces the per-scenario f64 episodes (tiny config, interpret kernels).

    sqp_iters=2, ipm_iters in the bench.py fused_sqp_s2i16 class — this is
    the closed-loop accuracy evidence backing the reduced-iteration headline
    candidate."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_fleet_episode, build_scenario

    cfg = make_preset("LBMPC_N40", iterations=4)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=8),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=2, ipm_iters=16),
        oracle=dataclasses.replace(cfg.oracle, q=8),
    )
    sc, run = build_fleet_episode(cfg)
    rng = np.random.default_rng(0)
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0]) + rng.uniform(-0.02, 0.02, (8, 4)))
    res = run(dx0)
    assert np.asarray(res.sys_history).shape == (8, 5, 5)
    assert float(np.asarray(res.solver_converged).mean()) == 1.0

    ref_cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, dtype="float64",
                                        sqp_iters=3, ipm_iters=25))
    ref = jax.vmap(build_scenario(ref_cfg).episode)(dx0)
    diff = np.abs(np.asarray(res.sys_history) - np.asarray(ref.sys_history)).max()
    assert diff < 5e-4, diff


def test_mixed_dtype_episode_tracks_f64():
    """Scenario-level dtype='mixed' (f32 IPM + f64 refinement per QP) stays
    within ~1e-5 of the all-f64 episode — ROADMAP perf item 3."""
    import dataclasses

    cfg64 = make_preset("LBMPC_N40", iterations=4)
    cfgmx = dataclasses.replace(
        cfg64, solver=dataclasses.replace(cfg64.solver, dtype="mixed"))
    r64 = build_scenario(cfg64).run()
    rmx = build_scenario(cfgmx).run()
    d = np.abs(np.asarray(rmx.sys_history) - np.asarray(r64.sys_history)).max()
    assert d < 1e-5, d
    assert np.asarray(rmx.solver_converged).all()


def test_fleet_budget_estimator_calibration():
    """HBM budget model reproduces the measured round-2 OOM bracket at the
    fleet operating point (v5e, f32, N=20, q=32, mI=214, 131072 instances x
    10 steps): chunk 8192 runs, chunk 16384 fails with a TPU OOM-class
    error — the model's max_chunk must land exactly on the validated 8192,
    i.e. within 2x of the boundary, per VERDICT r1 item 4."""
    from lbmpc_tpu.runtime.sharding import estimate_fleet_budget

    b = estimate_fleet_budget(n=4, m=1, nth=1, N=20, q=32, iterations=10,
                              fleet=131072, mI=214)
    assert b["fits"] and b["max_chunk"] == 8192
    # f64 working set halves the ceiling
    b64 = estimate_fleet_budget(n=4, m=1, nth=1, N=20, q=32, iterations=10,
                                fleet=131072, mI=214, history_bytes=8,
                                work_bytes=8)
    assert b64["max_chunk"] <= 4096
    # long-horizon stacks scale mI ~ 30 N: the guess path stays conservative
    long_ = estimate_fleet_budget(n=4, m=1, nth=1, N=100, q=32,
                                  iterations=10, fleet=131072)
    assert long_["max_chunk"] < b["max_chunk"]
    # all-Pallas backend, r4 MEASURED bracket (fleet ceiling probes,
    # 2026-08-21): every chunk up to the whole fleet as ONE cohort runs at
    # 2^20 = 1048576 instances; 2^21 fails RESOURCE_EXHAUSTED. The model
    # must admit exactly the validated boundary.
    bp = estimate_fleet_budget(n=4, m=1, nth=1, N=20, q=32, iterations=10,
                               fleet=131072, mI=214, backend="pallas_full")
    assert bp["fits"] and bp["max_chunk"] >= 131072
    assert bp["validated_to"] == 1048576
    assert bp["per_lane_work"] < b["per_lane_work"] / 10
    b1m = estimate_fleet_budget(n=4, m=1, nth=1, N=20, q=32, iterations=10,
                                fleet=1 << 20, mI=214, backend="pallas_full")
    assert b1m["max_chunk"] == 1 << 20          # whole fleet in one cohort
    b2m = estimate_fleet_budget(n=4, m=1, nth=1, N=20, q=32, iterations=10,
                                fleet=1 << 21, mI=214, backend="pallas_full")
    assert b2m["max_chunk"] < 1 << 21           # the measured OOM point


def test_fleet_warm_chain_episode_matches_reference():
    """r5 cross-step warm chain: build_fleet_episode(warm_chain=True)
    threads the Mehrotra kernel's interior (s, z) state across receding-
    horizon steps (run_closed_loop_batched qp_warm_solve carry), so every
    step runs the short warm schedule. The chained episode must track the
    deep f64 reference episode like the plain fleet path does (same gate
    as test_fleet_episode_*: trajectory-level agreement, conv 1.0)."""
    import dataclasses

    import numpy as np
    import jax
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_fleet_episode, build_scenario

    cfg = make_preset("LBMPC_N40", iterations=4)
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=8),
        solver=dataclasses.replace(cfg.solver, dtype="float32", sqp_iters=2,
                                   ipm_iters=16),
        oracle=dataclasses.replace(cfg.oracle, q=8),
    )
    sc, run = build_fleet_episode(cfg, backend="hybrid",
                                  qp_kernel="pallas_full",
                                  ipm_iters=(8, 2), qp_warm=True,
                                  warm_chain=True)
    rng = np.random.default_rng(0)
    dx0 = jnp.asarray(
        np.array([-0.35, -0.4, 0.0, 0.0]) + rng.uniform(-0.02, 0.02, (8, 4)))
    res = run(dx0)
    assert float(np.asarray(res.solver_converged).mean()) == 1.0

    ref_cfg = dataclasses.replace(
        cfg, solver=dataclasses.replace(cfg.solver, dtype="float64",
                                        sqp_iters=3, ipm_iters=25))
    ref = jax.vmap(build_scenario(ref_cfg).episode)(dx0)
    diff = np.abs(np.asarray(res.sys_history)
                  - np.asarray(ref.sys_history)).max()
    assert diff < 1e-3, diff
