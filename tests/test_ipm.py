"""Tests for the batched dense IPM QP/LP solver vs scipy references."""

import numpy as np
import pytest
import scipy.optimize

import jax
import jax.numpy as jnp

from lbmpc_tpu.ops.ipm import solve_qp, solve_qp_batched, support_function_batched


def _random_qp(rng, n, m):
    """Strictly convex QP with bounded feasible set (box + random cuts)."""
    A = rng.standard_normal((n, n))
    H = A @ A.T + n * np.eye(n)
    g = rng.standard_normal(n)
    G_extra = rng.standard_normal((m, n))
    G = np.vstack([np.eye(n), -np.eye(n), G_extra])
    h = np.concatenate([np.full(2 * n, 5.0), rng.uniform(1.0, 3.0, m)])
    return H, g, G, h


def _scipy_qp(H, g, G, h):
    n = g.shape[0]
    res = scipy.optimize.minimize(
        lambda x: 0.5 * x @ H @ x + g @ x,
        np.zeros(n),
        jac=lambda x: H @ x + g,
        constraints=[{"type": "ineq", "fun": lambda x: h - G @ x, "jac": lambda x: -G}],
        method="SLSQP",
        options={"maxiter": 200, "ftol": 1e-12},
    )
    return res.x


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_qp_matches_scipy(seed):
    rng = np.random.default_rng(seed)
    H, g, G, h = _random_qp(rng, 6, 8)
    sol = solve_qp(jnp.asarray(H), jnp.asarray(g), jnp.asarray(G), jnp.asarray(h))
    x_ref = _scipy_qp(H, g, G, h)
    assert bool(sol.converged)
    np.testing.assert_allclose(np.asarray(sol.x), x_ref, atol=1e-6)


def test_lp_matches_scipy_linprog():
    rng = np.random.default_rng(3)
    n = 5
    # bounded polytope: box plus random halfspaces
    G = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((10, n))])
    h = np.concatenate([np.full(2 * n, 2.0), rng.uniform(0.5, 2.0, 10)])
    for seed in range(5):
        c = np.random.default_rng(seed).standard_normal(n)
        res = scipy.optimize.linprog(c, A_ub=G, b_ub=h, bounds=(None, None))
        sol = solve_qp(
            jnp.zeros((n, n)), jnp.asarray(c), jnp.asarray(G), jnp.asarray(h), iters=40
        )
        np.testing.assert_allclose(float(c @ np.asarray(sol.x)), res.fun, atol=1e-7)


def test_support_function_box():
    """Support function of the unit box is the l1 norm of the direction."""
    n = 4
    F = np.vstack([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    C = np.random.default_rng(0).standard_normal((12, n))
    vals = support_function_batched(jnp.asarray(C), jnp.asarray(F), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(vals), np.abs(C).sum(axis=1), atol=1e-8)


def test_batched_matches_loop():
    rng = np.random.default_rng(7)
    B = 16
    Hs, gs, Gs, hs = [], [], [], []
    for _ in range(B):
        H, g, G, h = _random_qp(rng, 5, 6)
        Hs.append(H); gs.append(g); Gs.append(G); hs.append(h)
    Hb, gb, Gb, hb = map(lambda a: jnp.asarray(np.stack(a)), (Hs, gs, Gs, hs))
    batch = solve_qp_batched(Hb, gb, Gb, hb)
    for i in range(B):
        single = solve_qp(Hb[i], gb[i], Gb[i], hb[i])
        np.testing.assert_allclose(np.asarray(batch.x[i]), np.asarray(single.x), atol=1e-9)
    assert bool(jnp.all(batch.converged))


def test_mixed_precision_refinement():
    """f32 solve + f64 polish lands within ~1e-5 of the full f64 optimum —
    device-side accuracy beyond the reference solvers' own tolerance."""
    from lbmpc_tpu.ops.ipm import solve_qp_mixed

    rng = np.random.default_rng(5)
    H, g, G, h = _random_qp(rng, 6, 8)
    full = solve_qp(jnp.asarray(H), jnp.asarray(g), jnp.asarray(G), jnp.asarray(h), iters=30)
    mixed = solve_qp_mixed(jnp.asarray(H), jnp.asarray(g), jnp.asarray(G), jnp.asarray(h))
    np.testing.assert_allclose(np.asarray(mixed.x), np.asarray(full.x), atol=1e-5)
    assert bool(mixed.converged)


def test_active_constraints_multipliers():
    """KKT: z >= 0 and complementary slackness at the solution."""
    rng = np.random.default_rng(11)
    H, g, G, h = _random_qp(rng, 6, 8)
    sol = solve_qp(jnp.asarray(H), jnp.asarray(g), jnp.asarray(G), jnp.asarray(h))
    z = np.asarray(sol.z)
    s = np.asarray(sol.s)
    assert (z > -1e-9).all()
    assert np.abs(z * s).max() < 1e-6


def test_infeasibility_certificate():
    """Infeasible QP {x <= -1, x >= 1}: the IPM's blown-up duals form a Farkas
    ray (y >= 0, G'y = 0, h'y < 0) and the flag fires; a feasible twin with
    the same geometry stays clean."""
    import jax.numpy as jnp

    from lbmpc_tpu.ops.ipm import solve_qp

    H = jnp.eye(1)
    g = jnp.zeros(1)
    G = jnp.array([[1.0], [-1.0]])
    sol_bad = solve_qp(H, g, G, jnp.array([-1.0, -1.0]), iters=30)
    assert bool(sol_bad.infeasible) and not bool(sol_bad.converged)
    assert float(sol_bad.farkas_gap) > 0
    sol_ok = solve_qp(H, g, G, jnp.array([1.0, 1.0]), iters=30)
    assert bool(sol_ok.converged) and not bool(sol_ok.infeasible)


def test_infeasibility_certificate_batched_isolation():
    """One infeasible lane in a vmapped batch flags only itself."""
    import jax
    import jax.numpy as jnp

    from lbmpc_tpu.ops.ipm import solve_qp

    H = jnp.broadcast_to(jnp.eye(2), (4, 2, 2))
    g = jnp.zeros((4, 2))
    G = jnp.broadcast_to(jnp.array([[1.0, 0.0], [-1.0, 0.0], [0.0, 1.0], [0.0, -1.0]]), (4, 4, 2))
    h = jnp.stack([
        jnp.array([1.0, 1.0, 1.0, 1.0]),
        jnp.array([-1.0, -1.0, 1.0, 1.0]),   # infeasible in x1
        jnp.array([2.0, 0.5, 1.0, 1.0]),
        jnp.array([1.0, 1.0, -2.0, -1.0]),   # infeasible in x2
    ])
    sol = jax.vmap(lambda a, b, c, d: solve_qp(a, b, c, d, iters=30))(H, g, G, h)
    assert np.asarray(sol.infeasible).tolist() == [False, True, False, True]
    assert np.asarray(sol.converged).tolist() == [True, False, True, False]
