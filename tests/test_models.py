"""Parity tests for the plant/model layer (L0/L1).

Targets: the 15-digit DLTI constants in models/nominalModel.m:14-21 and the
matrix dumps in examples/DSS_NMPC.m:7-100.
"""

import jax
import jax.numpy as jnp
import numpy as np

from lbmpc_tpu.models.mgcm import (
    MGCM_EQ_U,
    MGCM_EQ_X,
    mgcm_dlti,
    mgcm_ode,
    nominal_step,
    rk23_step,
    rk4_step,
)

# ref: models/nominalModel.m:14-21 (exact discretization at Ts=0.01)
A_REF = np.array(
    [
        [1.01126321746508, -0.0100340214950357, 6.46038913508018e-05, 1.93716902346107e-07],
        [0.0100340214950357, 0.995515380253533, -0.0127681799951143, -5.57226765949308e-05],
        [0, 0, 0.957038195891878, 0.00792982548734094],
        [0, 0, -7.92982548734093, 0.602405619103784],
    ]
)
B_REF = np.array(
    [[4.95338239742896e-07], [-0.000193159646826652], [0.0429618041081219], [7.92982548734093]]
)


def test_dlti_matches_reference_constants():
    Ad, Bd, C, D = mgcm_dlti()
    np.testing.assert_allclose(Ad, A_REF, atol=1e-13)
    np.testing.assert_allclose(Bd, B_REF, atol=1e-13)
    np.testing.assert_allclose(C, np.eye(4))


def test_equilibrium_is_fixed_point():
    f = mgcm_ode(jnp.asarray(MGCM_EQ_X), MGCM_EQ_U)
    np.testing.assert_allclose(np.asarray(f), 0.0, atol=1e-4)


def test_rk4_step_order():
    """One RK4 step agrees with two half-steps to ~O(h^5)."""
    x = jnp.asarray(MGCM_EQ_X) + jnp.asarray([0.1, -0.05, 0.02, 0.0])
    u = MGCM_EQ_U + 0.1
    dt = 0.01
    one = rk4_step(x, u, dt, substeps=1)
    two = rk4_step(x, u, dt, substeps=2)
    fine = rk4_step(x, u, dt, substeps=32)
    np.testing.assert_allclose(np.asarray(one), np.asarray(fine), atol=1e-3)
    err1 = np.abs(np.asarray(one) - np.asarray(fine)).max()
    err2 = np.abs(np.asarray(two) - np.asarray(fine)).max()
    assert err2 < err1 / 8 + 1e-14  # 4th-order convergence


def test_rk23_converges_to_fine_rk4():
    """Adaptive RK23 over one sample should agree with very fine RK4 to ~1e-6."""
    x = jnp.asarray(MGCM_EQ_X) + jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    u = 1.0
    ref = rk4_step(x, u, 0.01, substeps=64)
    got = rk23_step(x, u, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_rk23_vmaps():
    xs = jnp.asarray(MGCM_EQ_X)[None, :] + jnp.linspace(-0.3, 0.3, 8)[:, None] * jnp.asarray(
        [1.0, 1.0, 0.0, 0.0]
    )
    us = jnp.linspace(0.9, 1.3, 8)
    out = jax.vmap(lambda x, u: rk23_step(x, u, 0.01))(xs, us)
    ref = jnp.stack([rk23_step(xs[i], us[i], 0.01) for i in range(8)])
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-7)


def test_nominal_step_linear():
    Ad, Bd, _, _ = mgcm_dlti()
    dx = jnp.asarray([0.1, 0.2, -0.1, 0.5])
    du = jnp.asarray([0.3])
    out = nominal_step(dx, du, jnp.asarray(Ad), jnp.asarray(Bd))
    np.testing.assert_allclose(np.asarray(out), Ad @ np.asarray(dx) + Bd @ np.asarray(du))
