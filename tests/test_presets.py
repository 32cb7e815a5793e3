"""Coverage smoke: every preset builds and runs a short episode."""

import dataclasses

import numpy as np
import pytest

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.scenario import build_scenario

ALL_PRESETS = (
    [f"LMPC_N{n}" for n in (20, 40, 50, 60, 80, 100)]
    + [f"LBMPC_N{n}" for n in (20, 40, 50, 60, 80, 100)]
    + [f"NMPC_N{n}" for n in (20, 40, 50)]
    + [f"DMS_LBMPC_q{q}" for q in (10, 50, 100, 200, 500)]
    + ["DMS_LMPC"]
)


def test_all_presets_resolve():
    for name in ALL_PRESETS:
        cfg = make_preset(name)
        assert cfg.name == name


@pytest.mark.parametrize(
    "name", ["LMPC_N20", "LBMPC_N20", "NMPC_N20", "DMS_LBMPC_q50", "DMS_LMPC"]
)
def test_preset_short_episode(name):
    """One representative per family runs 3 steps without NaNs."""
    cfg = make_preset(name, iterations=3)
    # shrink horizons/windows to keep the smoke fast
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=min(cfg.ocp.N, 12)),
        oracle=dataclasses.replace(cfg.oracle, q=8),
        solver=dataclasses.replace(cfg.solver, sqp_iters=1, ipm_iters=12),
    )
    sc = build_scenario(cfg)
    res = sc.run()
    sysH = np.asarray(res.sys_history)
    assert sysH.shape[0] == 4
    assert np.isfinite(sysH).all()


def test_mg2_presets_converge():
    """BASELINE config 1: 2-state Moore-Greitzer tracking MPC at N=20.

    Both MG2 presets must drive the compressor from the far corner of the box
    to the operating point (no golden data exists — the 2-state plant is this
    framework's design; the test asserts convergence + constraint respect).
    """
    import numpy as np

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario

    for name in ("MG2_LMPC_N20", "MG2_LBMPC_N20"):
        sc = build_scenario(make_preset(name))
        res = sc.run()
        h = np.asarray(res.sys_history)
        assert np.isfinite(h).all()
        assert float(np.mean(np.asarray(res.solver_converged))) > 0.99
        # settles near the operating point
        assert np.linalg.norm(h[-1, :2]) < 0.02, name
        # state box respected by the true plant trajectory (plus the model
        # mismatch the tightening budget allows for)
        assert np.abs(h[:, 0]).max() <= 0.5 + 0.02 + 1e-6
        assert np.abs(h[:, 1]).max() <= 0.5 + 0.02 + 1e-6


def test_mg2_dlti_matches_nonlinear_step():
    """MG2 exact discretization vs one RK4 step of the nonlinear plant."""
    import numpy as np
    import jax.numpy as jnp

    from lbmpc_tpu.models.mgcm import MG2_EQ_U, MG2_EQ_X, mg2_dlti, mg2_ode, rk4_step

    Ad, Bd, _, _ = mg2_dlti()
    dx = np.array([0.01, -0.02])
    du = 0.005
    x1 = rk4_step(jnp.asarray(MG2_EQ_X + dx), jnp.asarray(MG2_EQ_U + du), 0.01,
                  substeps=4, ode=mg2_ode)
    lin = Ad @ dx + (Bd * du).ravel()
    assert np.abs((np.asarray(x1) - MG2_EQ_X) - lin).max() < 5e-6


def test_mg2_robust_tube_preset():
    """Ks-consistent tube variant (ROADMAP item 10): set construction is
    contractive and the disturbed closed loop converges inside the box.

    The reference's K_t-based robust layout limit-cycles on this plant (see
    config.py note); the tube variant must (a) produce strictly positive
    tightening margins, (b) a nonempty Ks-consistent terminal set, and
    (c) drive the true nonlinear plant to the operating point."""
    import numpy as np

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario
    from lbmpc_tpu.sets.polytope import Polytope

    cfg = make_preset("MG2_LBMPC_N20_robust")
    sc = build_scenario(cfg)
    # (a) margins: tightened rhs strictly inside the raw box rhs
    raw = make_preset("MG2_LBMPC_N20")
    sc0 = build_scenario(raw)
    assert (sc.cs.h_x < sc0.cs.h_x).all()
    assert (sc.cs.h_u < sc0.cs.h_u).all()
    assert (sc.cs.h_x > 0).all() and (sc.cs.h_u > 0).all()
    # (b) terminal set nonempty and invariant one step under the Ks loop
    term = Polytope(sc.cs.F_w_N, sc.cs.h_w_N)
    c, r = term.chebyshev_center()
    assert r > 1e-6
    Ks = np.atleast_2d(sc.ocp.Ks)
    L = np.atleast_2d(sc.ocp.PSI) - Ks @ np.atleast_2d(sc.ocp.LAMBDA)
    n = sc.A.shape[0]
    Aw = np.block([[sc.A + sc.B @ Ks, sc.B @ L],
                   [np.zeros((L.shape[1] if L.ndim > 1 else 1, n)).reshape(-1, n),
                    np.eye(np.atleast_2d(sc.ocp.LAMBDA).shape[1])]])
    # invariance via support LPs: for every row f of F, h_term(Aw' f) <= h
    for i in range(len(sc.cs.h_w_N)):
        assert term.support(Aw.T @ sc.cs.F_w_N[i]) <= sc.cs.h_w_N[i] + 1e-7
    # (c) closed loop on the true nonlinear plant
    res = sc.run()
    h = np.asarray(res.sys_history)
    assert np.isfinite(h).all()
    assert float(np.mean(np.asarray(res.solver_converged))) > 0.99
    assert np.linalg.norm(h[-1, :2]) < 0.02
    assert np.abs(h[:, 0]).max() <= 0.5 + 0.02 + 1e-6


def test_mx_lbmpc_preset_nominal_cost_with_data_collection():
    """LBMPC_casadi.m variant (MX): the cost optimizes the NOMINAL dynamics
    (learned constraint commented out in the reference, :292-293) while the
    oracle window is still acquired every step (:195-198). The control law
    must therefore equal tracking LMPC with the same stacks, and the episode
    must come back with a filled window."""
    import dataclasses

    import numpy as np

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_scenario

    steps = 40
    mx = build_scenario(make_preset("MX_LBMPC", iterations=steps))
    res = mx.run()
    assert bool(res.solver_converged.all())
    # window collected despite the LMPC control law (init_window seeds a
    # valid (0,0) observation like both reference families, hence +1)
    assert int(np.asarray(res.final_window.count)) == steps + 1
    # identical control trajectory to the plain LMPC with the same stacks
    plain_cfg = dataclasses.replace(make_preset("MX_LBMPC", iterations=steps),
                                    collect_data=False)
    plain = build_scenario(plain_cfg).run()
    assert int(np.asarray(plain.final_window.count)) == 1  # seed only
    np.testing.assert_allclose(np.asarray(res.sys_history),
                               np.asarray(plain.sys_history), atol=1e-12)
