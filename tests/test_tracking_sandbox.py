"""trackingMPC sandbox tests: set pipeline + closed-loop tracking behavior."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lbmpc_tpu.controllers.tracking_sandbox import (
    build_tracking_setup,
    reference_schedule,
    run_tracking_episode,
)
from lbmpc_tpu.sets.polytope import box


@pytest.fixture(scope="module")
def setup():
    return build_tracking_setup()


def test_reference_schedule_values():
    assert np.allclose(np.asarray(reference_schedule(jnp.asarray(0))), [4.95, 0.0])
    assert np.allclose(np.asarray(reference_schedule(jnp.asarray(30))), [-5.5, 0.0])
    assert np.allclose(np.asarray(reference_schedule(jnp.asarray(65))), [2.0, 0.0])
    assert np.allclose(np.asarray(reference_schedule(jnp.asarray(95))), [0.0, 0.0])


def test_terminal_set_properties(setup):
    """Extended MPIS: invariant under Ak and inside the constraint set."""
    term = setup.term
    A, B, K = setup.model.A, setup.model.B, setup.K
    L = setup.PSI - K @ setup.LAMBDA
    Ak = np.block([[A + B @ K, B @ L], [np.zeros((2, 2)), np.eye(2)]])
    # invariance: image of each vertex stays inside
    V = term.vertices()
    img = V @ Ak.T
    assert (term.F @ img.T - term.h[:, None]).max() < 1e-7
    # the projected terminal set contains the origin
    assert setup.Xf.contains([0.0, 0.0])
    # extended terminal set is at least as permissive as the classic MAIS
    # in x-space (the whole point of tracking MPC — ref RunExample.m:97-110)
    mais_V = setup.mais.vertices()
    vol_proxy_mais = np.abs(mais_V).max()
    xf_V = setup.Xf.vertices()
    vol_proxy_xf = np.abs(xf_V).max()
    assert vol_proxy_xf >= vol_proxy_mais - 1e-9


def test_tracking_episode_follows_schedule(setup):
    res = jax.jit(
        lambda x0: run_tracking_episode(setup, x0, iterations=100)
    )(jnp.asarray([0.0, -2.0]))
    # the k=31 reference jump to an infeasible target (-5.5 outside X) makes
    # one QP instance borderline; everything else converges
    assert float(np.asarray(res.converged).mean()) >= 0.98
    sysH = np.asarray(res.sys_history)
    # x1 approaches each reference plateau by the end of its window
    assert abs(sysH[30, 0] - 4.95) < 0.3
    assert abs(sysH[60, 0] - (-5.5)) < 0.6   # -5.5 is outside X, tracker saturates
    assert abs(sysH[90, 0] - 2.0) < 0.3
    assert abs(sysH[100, 0]) < 0.3
    # input constraints respected
    assert np.abs(sysH[1:, 2:]).max() <= 0.3 + 1e-6


def test_robust_variant_tightens_and_tracks():
    setup_r = build_tracking_setup(robust_w=0.1)
    # tightened terminal set is a subset of the nominal one in x-space
    res = jax.jit(
        lambda x0: run_tracking_episode(
            setup_r, x0, iterations=100, w_max=0.1, disturbance_seed=7
        )
    )(jnp.asarray([0.0, -2.0]))
    conv = np.asarray(res.converged)
    assert conv.mean() > 0.9  # disturbances may graze feasibility occasionally
    sysH = np.asarray(res.sys_history)
    # state constraints hold despite disturbances (tube tightening at work)
    assert np.abs(sysH[:, :2]).max() <= 5.0 + 0.15
