"""Fused batch-level LBMPC SQP vs the vmapped f64 SQP — interpret CI."""

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.controllers.condensed import build_fmincon_lmpc
from lbmpc_tpu.controllers.lbmpc import LBMPCWeights, make_lbmpc_solver
from lbmpc_tpu.controllers.sqp_fused import (make_lbmpc_solver_fused,
                                             make_lbmpc_solver_hybrid)
from lbmpc_tpu.models.mgcm import mgcm_dlti
from lbmpc_tpu.oracle import init_window
from lbmpc_tpu.sets.terminal import get_cons_poly
from lbmpc_tpu.synthesis import mat_ocp


def test_fused_sqp_matches_f64_sqp():
    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons_poly(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0, 0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20,
                            terminal_at="first", tighten_first_step=True)
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    rng = np.random.default_rng(0)
    batch, q = 128, 32
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4)))
    win = init_window(q)
    wins = type(win)(
        X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3))),
        Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4))),
        valid=jnp.ones((batch, q)), count=jnp.full((batch,), q, jnp.int32),
    )
    z0 = jnp.zeros((batch, qp.nz))
    fused = make_lbmpc_solver_fused(qp, A, B, ocp.Ks, w, sqp_iters=3,
                                    ipm_iters=20, tile=128, interpret=True)
    zf, conv = fused(dx0, wins, z0)
    assert not np.isnan(np.asarray(zf)).any()
    assert float(np.asarray(conv).mean()) > 0.9
    ref = make_lbmpc_solver(qp, A, B, ocp.Ks, w, sqp_iters=3, ipm_iters=25)
    z_ref, _ = jax.jit(jax.vmap(ref))(dx0, wins, z0)
    err0 = np.abs(np.asarray(zf)[:, 0] - np.asarray(z_ref)[:, 0])
    assert np.median(err0) < 1e-6
    assert err0.max() < 1e-3
    # unscaled variant (scale=False) must agree too in interpret mode — the
    # equilibration is exact modulo roundoff; this pins the algebra
    fused_ns = make_lbmpc_solver_fused(qp, A, B, ocp.Ks, w, sqp_iters=3,
                                       ipm_iters=20, tile=128, interpret=True,
                                       scale=False)
    zn, _ = fused_ns(dx0, wins, z0)
    assert np.abs(np.asarray(zn)[:, 0] - np.asarray(zf)[:, 0]).max() < 1e-3


def test_hybrid_repair_fixes_flagged_lanes():
    """The hybrid wrapper re-solves flagged lanes on the vmapped path and
    leaves converged fused lanes untouched."""
    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons_poly(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0, 0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20,
                            terminal_at="first", tighten_first_step=True)
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    rng = np.random.default_rng(1)
    batch, q = 128, 32
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4)))
    win = init_window(q)
    wins = type(win)(
        X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3))),
        Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4))),
        valid=jnp.ones((batch, q)), count=jnp.full((batch,), q, jnp.int32),
    )
    z0 = jnp.zeros((batch, qp.nz))
    # starve the fused path (1 IPM iter) so lanes genuinely flag, then check
    # the repair pass (healthy iters) recovers every repaired lane to the f64
    # answer while the shapes stay static under jit
    hyb = make_lbmpc_solver_hybrid(qp, A, B, ocp.Ks, w, sqp_iters=3,
                                   ipm_iters=1, tile=128, interpret=True,
                                   repair_frac=1.0, repair_ipm_iters=25)
    fused_only = make_lbmpc_solver_fused(qp, A, B, ocp.Ks, w, sqp_iters=3,
                                         ipm_iters=1, tile=128, interpret=True)
    _, conv_f = fused_only(dx0, wins, z0)
    assert float(np.asarray(conv_f).mean()) < 1.0  # starved: some lanes flag
    zh, conv_h = hyb(dx0, wins, z0)
    assert float(np.asarray(conv_h).mean()) == 1.0
    ref = make_lbmpc_solver(qp, A, B, ocp.Ks, w, sqp_iters=3, ipm_iters=25)
    z_ref, _ = jax.jit(jax.vmap(ref))(dx0, wins, z0)
    flagged = ~np.asarray(conv_f)
    err0 = np.abs(np.asarray(zh)[:, 0] - np.asarray(z_ref)[:, 0])
    assert err0[flagged].max() < 1e-3


def test_manual_gauss_newton_jacobian_matches_jacfwd():
    """jac_mode='manual' (sensitivity scan + closed-form NW grad) ==
    jac_mode='jacfwd' solver output to f32 roundoff."""
    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons_poly(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0, 0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20,
                            terminal_at="first", tighten_first_step=True)
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    rng = np.random.default_rng(2)
    batch, q = 64, 32
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0]) + 0.01 * rng.standard_normal((batch, 4)))
    win = init_window(q)
    wins = type(win)(
        X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3))),
        Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4))),
        valid=jnp.ones((batch, q)), count=jnp.full((batch,), q, jnp.int32),
    )
    z0 = jnp.zeros((batch, qp.nz))
    z_probe = jnp.asarray(0.05 * rng.standard_normal((batch, qp.nz)),
                          jnp.float32)
    for family in ("fmincon", "casadi"):
        man = make_lbmpc_solver_fused(qp, A, B, ocp.Ks, w, family=family,
                                      sqp_iters=3, ipm_iters=20, tile=64,
                                      interpret=True, jac_mode="manual")
        ad = make_lbmpc_solver_fused(qp, A, B, ocp.Ks, w, family=family,
                                     sqp_iters=3, ipm_iters=20, tile=64,
                                     interpret=True, jac_mode="jacfwd")
        # the strong property: residual and Jacobian agree pointwise to f32
        # roundoff at an arbitrary iterate (J scale here is ~16)
        dx32 = dx0.astype(jnp.float32)
        w32 = jax.tree.map(lambda a: a.astype(jnp.float32)
                           if a.dtype != jnp.int32 else a, wins)
        e_m, J_m = man._resjac_b(z_probe, dx32, w32)
        e_a, J_a = ad._resjac_b(z_probe, dx32, w32)
        assert float(jnp.abs(e_m - e_a).max()) < 1e-5, family
        assert float(jnp.abs(J_m - J_a).max()) < 1e-5, family
        # solver-level: f32 QP chains amplify roundoff on individual lanes,
        # so compare loosely + require the typical lane to agree tightly
        z_m, _ = man(dx0, wins, z0)
        z_a, _ = ad(dx0, wins, z0)
        assert not np.isnan(np.asarray(z_m)).any()
        d0 = np.abs(np.asarray(z_m)[:, 0] - np.asarray(z_a)[:, 0])
        assert np.median(d0) < 1e-5, family
        assert d0.max() < 5e-2, family


def test_hybrid_repair_warm_seeded_and_fleet_deferred():
    """Round-2 repair variants: repair_warm='fused' (seed the re-solve at the
    fused iterate with a reduced budget — the headline bench configuration)
    and the deferred whole-call repair (make_lbmpc_solver_fleet) both recover
    every flagged lane."""
    from lbmpc_tpu.controllers.sqp_fused import make_lbmpc_solver_fleet

    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons_poly(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0, 0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 20,
                            terminal_at="first", tighten_first_step=True)
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    rng = np.random.default_rng(2)
    batch, q = 64, 32
    dx0 = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                      + 0.01 * rng.standard_normal((batch, 4)))
    win = init_window(q)
    wins = type(win)(
        X=jnp.asarray(0.1 * rng.standard_normal((batch, q, 3))),
        Y=jnp.asarray(0.001 * rng.standard_normal((batch, q, 4))),
        valid=jnp.ones((batch, q)), count=jnp.full((batch,), q, jnp.int32),
    )
    z0 = jnp.zeros((batch, qp.nz))
    # warm-seeded repair with the (starved-base, healthy-repair) pattern
    hyb = make_lbmpc_solver_hybrid(qp, A, B, ocp.Ks, w, sqp_iters=2,
                                   ipm_iters=1, tile=64, interpret=True,
                                   repair_frac=1.0, repair_sqp_iters=2,
                                   repair_ipm_iters=25, repair_warm="fused")
    zh, conv_h = hyb(dx0, wins, z0)
    assert float(np.asarray(conv_h).mean()) == 1.0
    assert bool(np.isfinite(np.asarray(zh)).all())

    # deferred whole-call repair over R stacked batches
    R = 2
    fleet = make_lbmpc_solver_fleet(
        qp, A, B, ocp.Ks, w, sqp_iters=2, ipm_iters=1,
        repair_frac=1.0, repair_sqp_iters=2, repair_ipm_iters=25,
        tile=64, interpret=True)
    dxR = jnp.stack([dx0, dx0 + 0.001])
    winsR = jax.tree.map(lambda a: jnp.stack([a, a]), wins)
    z0R = jnp.zeros((R, batch, qp.nz))
    zf, convf = fleet(dxR, winsR, z0R)
    assert zf.shape == (R, batch, qp.nz)
    assert float(np.asarray(convf).mean()) == 1.0


def test_pallas_full_gn_qp_tile_handoff_locked():
    """r5 regression: the pallas_full GN->QP handoff is tile-blocked packed
    H, so BOTH kernels must share one lane tile. A GN-512/QP-256 mismatch
    measured conv 0.0 on chip (silently deinterleaved H); sqp_fused now
    derives one shared _pf_tile = min(tile, LBMPC_GN_TILE, LBMPC_QP_TILE)
    and uses it for both builders even when the env knobs disagree."""
    import os

    A, B, C, _ = mgcm_dlti()
    ocp = mat_ocp(A, B, C)
    cs = get_cons_poly(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0, 0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=A, B=B, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    qp = build_fmincon_lmpc(A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T,
                            ocp.LAMBDA, ocp.PSI, cs, 12,
                            terminal_at="first", tighten_first_step=True)
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    prev = {v: os.environ.get(v) for v in ("LBMPC_GN_TILE", "LBMPC_QP_TILE")}
    os.environ["LBMPC_GN_TILE"] = "512"
    os.environ["LBMPC_QP_TILE"] = "256"
    try:
        s = make_lbmpc_solver_fused(
            qp, A, B, ocp.Ks, w, qp_kernel="pallas_full", tile=512,
            sqp_iters=1, ipm_iters=4, interpret=True)
        assert s._pf_tile == 256
        gn = s._gn_raw_for(8)           # builds the GN kernel lazily
        assert gn.tile == s._pf_tile
    finally:
        for v, p in prev.items():
            if p is None:
                os.environ.pop(v, None)
            else:
                os.environ[v] = p
