"""Fused Pallas IPM kernel — interpret-mode correctness (CPU CI).

Real-chip throughput is measured by bench scripts; here the kernel's math is
validated against the XLA IPM on the actual MPC QP and on random problems.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.ops.ipm import solve_qp
from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver


def test_pallas_kernel_matches_ipm_random():
    rng = np.random.default_rng(0)
    n, m = 6, 10
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    G = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((m, n))])
    hb = np.concatenate([np.full(2 * n, 5.0), rng.uniform(1, 3, m)])
    B = 128
    gs = rng.standard_normal((B, n))
    hs = np.tile(hb, (B, 1)) + 0.05 * rng.uniform(0, 1, (B, 2 * n + m))
    solver = build_pallas_qp_solver(H, G, iters=18, tile=128, interpret=True)
    x_pl, conv = solver(jnp.asarray(gs), jnp.asarray(hs))
    assert bool(np.asarray(conv).all())
    for i in range(6):
        ref = np.asarray(
            solve_qp(jnp.asarray(H), jnp.asarray(gs[i]), jnp.asarray(G),
                     jnp.asarray(hs[i]), iters=30).x
        )
        np.testing.assert_allclose(np.asarray(x_pl)[i], ref, atol=1e-5)


def test_pallas_kernel_on_mpc_qp():
    """The real N=20 LMPC QP (806 rows, 616-row terminal set)."""
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.sets.terminal import get_cons
    from lbmpc_tpu.synthesis import mat_ocp

    Ad, Bd, C, _ = mgcm_dlti()
    ocp = mat_ocp(Ad, Bd, C)
    cs = get_cons(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=Ad, B=Bd, K=ocp.Ks, LAMBDA=ocp.LAMBDA, PSI=ocp.PSI,
        LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0, cache=True,
    )
    qp = build_fmincon_lmpc(Ad, Bd, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20)
    rng = np.random.default_rng(1)
    B = 128
    dxs = np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((B, 4))
    g = (qp.Gg @ dxs.T).T + qp.g0
    h = qp.h0 + (qp.Hp @ dxs.T).T
    solver = build_pallas_qp_solver(qp.H, qp.G, iters=20, tile=128, interpret=True)
    x_pl, conv = solver(jnp.asarray(g), jnp.asarray(h))
    assert float(np.asarray(conv).mean()) > 0.95
    for i in range(4):
        ref = np.asarray(
            solve_qp(jnp.asarray(qp.H), jnp.asarray(g[i]), jnp.asarray(qp.G),
                     jnp.asarray(h[i]), iters=30).x
        )
        # f32 kernel vs f64 reference: control-relevant head of z
        np.testing.assert_allclose(np.asarray(x_pl)[i][:1], ref[:1], atol=5e-4)


def test_pallas_h_kernel_matches_xla_fused_path():
    """Per-problem-H full-IPM kernel (build_pallas_qp_solver_h) vs the
    XLA-composed ipm_fused path on identical SQP-style QPs: identical
    semantics (d_cap/ridge/equilibration/tau), so trajectories agree to f32
    op-ordering roundoff (measured: median 1.7e-8, worst lane 1.1e-2 in the
    documented hard-lane class)."""
    from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver
    from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver_h

    rng = np.random.default_rng(0)
    nz, mI, B = 21, 214, 32
    G = rng.standard_normal((mI, nz)).astype(np.float32)
    Hb = np.zeros((B, nz, nz), np.float32)
    g = np.zeros((B, nz), np.float32)
    h = np.zeros((B, mI), np.float32)
    for b in range(B):
        J = rng.standard_normal((40, nz))
        Hb[b] = (2 * J.T @ J + 1e-3 * np.eye(nz)).astype(np.float32)
        g[b] = rng.standard_normal(nz)
        h[b] = np.abs(rng.standard_normal(mI)) + 0.1
    xla = build_fused_qp_solver(None, G, iters=16, tile=32, interpret=True)
    pal = build_pallas_qp_solver_h(G, iters=16, tile=32, interpret=True)
    with jax.default_matmul_precision("highest"):
        sub = xla.raw_with_H(jnp.asarray(Hb), jnp.asarray(g), jnp.asarray(h))
        xp, mup = jax.jit(pal)(jnp.asarray(Hb), jnp.asarray(g), jnp.asarray(h))
    d = np.abs(np.asarray(xp) - np.asarray(sub.x))
    assert np.median(d) < 1e-6
    assert d.max() < 5e-2
    # mu distributions agree (same convergence behavior)
    assert np.abs(np.asarray(mup) - np.asarray(sub.mu)).max() < 1e-3
    # non-tile-multiple batch exercises the padding path
    xp2, _ = jax.jit(pal)(jnp.asarray(Hb[:20]), jnp.asarray(g[:20]),
                          jnp.asarray(h[:20]))
    assert np.abs(np.asarray(xp2) - np.asarray(xp)[:20]).max() < 1e-5


def test_fused_sqp_pallas_qp_kernel_matches_xla():
    """make_lbmpc_solver_fused(qp_kernel='pallas'): the full LBMPC SQP with
    the one-launch Pallas IPM reproduces the XLA-subproblem SQP (measured:
    z max diff 3.7e-4, median 1.5e-8, conv 1.0 both)."""
    import dataclasses

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q, B = 12, 16, 16
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q))
    sc = build_scenario(cfg)
    qp = build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, N, dx_ref=np.asarray(cfg.dx_ref),
        terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step)
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights as W

    w = W.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
               sc.ocp.LAMBDA, sc.ocp.PSI)
    kw = dict(family="fmincon", delta=cfg.plant.ts,
              bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
              dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, ipm_iters=16,
              tile=B, interpret=True)
    sx = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                 qp_kernel="xla", **kw)
    sp = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                 qp_kernel="pallas", **kw)
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
    zx, cx = sx(dx, wins, z0)
    zp, cp = sp(dx, wins, z0)
    d = np.abs(np.asarray(zx) - np.asarray(zp))
    assert np.median(d) < 1e-6
    assert d.max() < 5e-3
    assert bool(np.asarray(cx).all()) and bool(np.asarray(cp).all())


def test_pallas_h_kernel_causal_suffix_matches_xla():
    """r5 causal-suffix assembly: a G whose rows have strongly graded
    max-nonzero columns drives nonzero lo128 offsets (the production N=20
    and N=12 CI shapes have mD < 256, so every suffix starts at 0 and the
    sliced-matmul path would otherwise ship untested — the DMS nz=101/
    mI=1024 shape that motivated it only runs on chip). The XLA reference
    never sorts rows, so agreement also pins the row-permutation
    bookkeeping."""
    from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver
    from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver_h

    rng = np.random.default_rng(3)
    nz, mI, B = 21, 384, 32
    G = np.zeros((mI, nz), np.float32)
    for i in range(mI):
        # graded causality: row i reaches column ~ i * nz / mI (plus a box
        # row every 4th to mix single-support rows into the sort)
        hi = max(1, (i * nz) // mI + 1)
        if i % 4 == 0:
            G[i, hi - 1] = 1.0
        else:
            G[i, :hi] = rng.standard_normal(hi)
    # sanity: the builder must see nonzero suffix starts at this shape
    maxc = sorted(int(np.nonzero(G[i])[0][-1]) for i in range(mI))
    import bisect
    los = {bisect.bisect_left(maxc, j) // 128 * 128 for j in range(nz)}
    assert max(los) >= 128, los
    Hb = np.zeros((B, nz, nz), np.float32)
    g = np.zeros((B, nz), np.float32)
    h = np.zeros((B, mI), np.float32)
    for b in range(B):
        J = rng.standard_normal((40, nz))
        Hb[b] = (2 * J.T @ J + 1e-3 * np.eye(nz)).astype(np.float32)
        g[b] = rng.standard_normal(nz)
        h[b] = np.abs(rng.standard_normal(mI)) + 0.1
    xla = build_fused_qp_solver(None, G, iters=16, tile=32, interpret=True)
    deep = build_fused_qp_solver(None, G, iters=40, tile=32, interpret=True)
    pal = build_pallas_qp_solver_h(G, iters=16, tile=32, interpret=True)
    with jax.default_matmul_precision("highest"):
        sub = xla.raw_with_H(jnp.asarray(Hb), jnp.asarray(g), jnp.asarray(h))
        ref = deep.raw_with_H(jnp.asarray(Hb), jnp.asarray(g), jnp.asarray(h))
        xp, mup = jax.jit(pal)(jnp.asarray(Hb), jnp.asarray(g),
                               jnp.asarray(h))
    d16 = np.abs(np.asarray(xp) - np.asarray(sub.x))
    assert np.median(d16) < 1e-6
    # per-lane arbitration against a 40-iteration deep solve: f32
    # op-ordering flips WHICH hard lanes stall at 16 iterations (measured
    # here: the two 6e-2 pal-vs-xla16 outlier lanes match the deep
    # reference to 4e-8 — the XLA-16 trajectory was the unconverged one,
    # mu 1e-3 vs 1e-10), so the bound is the better of the two matches.
    d40 = np.abs(np.asarray(xp) - np.asarray(ref.x))
    per_lane = np.minimum(d16.max(axis=1), d40.max(axis=1))
    assert per_lane.max() < 5e-3, per_lane.max()


def test_fused_sqp_warm_started_qp2_matches_cold():
    """r5 IPM-iteration-cut lever (docs/ROADMAP.md #1): with qp_warm=True
    the second QP starts from QP1's final interior (s, z) — exactly
    primal-feasible at x=0 whenever GN0 accepted alpha=1 (h2 = h1 - G d1 =
    s1) — and a (16, 2) schedule reproduces the cold (16, 8) SQP to f32
    roundoff (measured here: dz max 6e-7; on-chip adoption measured in
    scripts/bench_pallas_sqp.py mode "warm")."""
    import dataclasses

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
    from lbmpc_tpu.controllers.lbmpc import LBMPCWeights
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fused
    from lbmpc_tpu.oracle import init_window
    from lbmpc_tpu.runtime.scenario import build_scenario

    N, q, B = 12, 16, 16
    cfg = make_preset("LBMPC_N40")
    cfg = dataclasses.replace(
        cfg, ocp=dataclasses.replace(cfg.ocp, N=N),
        oracle=dataclasses.replace(cfg.oracle, q=q))
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
              dx_ref=np.asarray(cfg.dx_ref), sqp_iters=2, tile=B,
              interpret=True, alphas=((1.0,), (1.0, 0.5, 0.25)))
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
    cold = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                   qp_kernel="pallas", ipm_iters=(16, 8),
                                   **kw)
    z_c, c_c = cold(dx, wins, z0)
    warm = make_lbmpc_solver_fused(qp, sc.A, sc.B, sc.ocp.Ks, w,
                                   qp_kernel="pallas", ipm_iters=(16, 2),
                                   qp_warm=True, **kw)
    z_w, c_w = warm(dx, wins, z0)
    d = np.abs(np.asarray(z_w) - np.asarray(z_c))
    assert d.max() < 1e-4, d.max()
    assert bool(np.asarray(c_c).all()) and bool(np.asarray(c_w).all())
