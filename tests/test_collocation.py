"""Collocation transcription tests (reference 4th scheme)."""

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.models.collocation import collocation_step, legendre_coeffs
from lbmpc_tpu.models.mgcm import MGCM_EQ_U, MGCM_EQ_X, rk4_step


def test_coefficients_quadrature_exact():
    """Degree-3 Gauss-Legendre quadrature integrates degree-5 polys exactly."""
    C, D, B = legendre_coeffs(3)
    assert np.isclose(B.sum(), 1.0)  # integrates constants
    # D extrapolates polynomials exactly: check with f(t)=t^3 sampled at taus
    pts, _ = np.polynomial.legendre.leggauss(3)
    tau = np.concatenate([[0.0], (pts + 1.0) / 2.0])
    vals = tau**3
    assert np.isclose(np.dot(D, vals), 1.0)


def test_collocation_matches_fine_rk4():
    x = jnp.asarray(MGCM_EQ_X) + jnp.asarray([-0.2, -0.3, 0.0, 0.0])
    u = MGCM_EQ_U + 0.2
    ref = rk4_step(x, u, 0.01, substeps=64)
    got = collocation_step(x, u, 0.01)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_collocation_stable_at_large_step():
    """The throttle mode (lambda ~ -44.7) makes explicit RK4 diverge for
    dt >~ 0.065; implicit collocation stays bounded."""
    x = jnp.asarray(MGCM_EQ_X) + jnp.asarray([0.0, 0.0, 0.1, 0.0])
    u = MGCM_EQ_U

    def roll(step_fn, dt, n):
        y = x
        for _ in range(n):
            y = step_fn(y, u, dt)
        return np.asarray(y)

    col = roll(lambda a, b, c: collocation_step(a, b, c), 0.1, 10)
    assert np.isfinite(col).all() and np.abs(col).max() < 10.0
    rk = roll(lambda a, b, c: rk4_step(a, b, c), 0.1, 10)
    assert (~np.isfinite(rk)).any() or np.abs(rk).max() > 1e3  # RK4 blows up


def test_collocation_vmaps():
    xs = jnp.asarray(MGCM_EQ_X)[None, :] + 0.05 * jnp.arange(4)[:, None] * jnp.asarray(
        [1.0, 1.0, 0.0, 0.0]
    )
    us = jnp.full((4,), MGCM_EQ_U)
    out = jax.vmap(lambda a, b: collocation_step(a, b, 0.01))(xs, us)
    assert out.shape == (4, 4)
    assert np.isfinite(np.asarray(out)).all()
