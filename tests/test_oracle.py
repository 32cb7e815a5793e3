"""Oracle tests: NW regression semantics + the open-loop validation protocol.

The reference's de-facto oracle unit test is learning_model_test.m:163-205 —
roll true/nominal/learned models side by side; the learned model must predict
the true next state better than the nominal one after warmup.
"""

import numpy as np

import jax
import jax.numpy as jnp

from lbmpc_tpu.models.mgcm import MGCM_EQ_U, MGCM_EQ_X, mgcm_dlti, rk23_step
from lbmpc_tpu.oracle import (
    DataWindow,
    init_window,
    learned_step,
    make_xi,
    nw_estimate,
    observe_residual,
    push,
)


def _reference_nw(xi, X_cols, Y_cols, bw=0.5, lam=0.001):
    """Straight transcription of the oracleL2NW.m math for cross-checking."""
    kvals = np.array([np.exp(-np.sum((X_cols[:, i] - xi) ** 2) / bw**2) for i in range(X_cols.shape[1])])
    w = kvals / (lam + kvals.sum())
    return (Y_cols * w[None, :]).sum(axis=1)


def test_nw_matches_reference_math():
    rng = np.random.default_rng(0)
    q = 17
    X = rng.standard_normal((3, q)) * 0.3
    Y = rng.standard_normal((4, q)) * 0.01
    xi = rng.standard_normal(3) * 0.2
    window = DataWindow(
        X=jnp.asarray(X.T), Y=jnp.asarray(Y.T),
        valid=jnp.ones(q), count=jnp.asarray(q, jnp.int32),
    )
    ours = np.asarray(nw_estimate(jnp.asarray(xi), window))
    ref = _reference_nw(xi, X, Y)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_validity_mask_excludes_slots():
    """Invalid slots: excluded from the denominator; Y=0 kills the numerator
    (exact casadiL2NW.m:18-25 semantics)."""
    q = 8
    rng = np.random.default_rng(1)
    X = rng.standard_normal((q, 3)) * 0.1
    Y = rng.standard_normal((q, 4)) * 0.01
    valid = np.array([1, 1, 1, 0, 0, 0, 0, 0], float)
    Ym = Y * valid[:, None]
    window = DataWindow(jnp.asarray(X), jnp.asarray(Ym), jnp.asarray(valid), jnp.asarray(3, jnp.int32))
    ours = np.asarray(nw_estimate(jnp.zeros(3), window))
    ref = _reference_nw(np.zeros(3), X[:3].T, Y[:3].T)
    np.testing.assert_allclose(ours, ref, atol=1e-12)


def test_ring_buffer_window_semantics():
    """push() reproduces update_data.m's moving window as a point set."""
    q = 4
    w = init_window(q, seed_zero_point=True)
    pts = [(np.full(3, i, float), np.full(4, 10.0 + i)) for i in range(1, 7)]
    for x, y in pts:
        w = push(w, jnp.asarray(x), jnp.asarray(y))
    # after 6 pushes into q=4 (slot0 seeded): window holds the LAST 4 points
    got = sorted(float(v[0]) for v in np.asarray(w.X))
    assert got == [3.0, 4.0, 5.0, 6.0]
    assert float(jnp.sum(w.valid)) == q


def test_learned_model_beats_nominal_open_loop():
    """learning_model_test.m protocol: 300 steps under prestabilized feedback
    with c=0; one-step prediction error of learned vs nominal model."""
    Ad, Bd, C, _ = mgcm_dlti()
    from lbmpc_tpu.synthesis import mat_ocp

    ocp = mat_ocp(Ad, Bd, C)
    A = jnp.asarray(Ad)
    B = jnp.asarray(Bd)
    Ks = jnp.asarray(ocp.Ks)
    x_wp = jnp.asarray(MGCM_EQ_X)
    u_wp = MGCM_EQ_U

    steps = 300
    q = 100

    def run(x0):
        def body(carry, _):
            x, win = carry
            dx = x - x_wp
            du = Ks @ dx
            u = du + u_wp
            x1 = rk23_step(x, u[0], 0.01)
            dx1_true = x1 - x_wp
            pred_nom = A @ dx + B @ du
            pred_learned = learned_step(dx, du, A, B, win)
            xi_new, y_new = observe_residual(dx, du, dx1_true, A, B)
            win = push(win, xi_new, y_new)
            e_nom = jnp.sum((pred_nom - dx1_true) ** 2)
            e_lrn = jnp.sum((pred_learned - dx1_true) ** 2)
            return (x1, win), (e_nom, e_lrn)

        (_, _), (e_nom, e_lrn) = jax.lax.scan(
            body, (x0, init_window(q)), None, length=steps
        )
        return e_nom, e_lrn

    x0 = x_wp + jnp.asarray([-0.35, -0.4, 0.0, 0.0])
    e_nom, e_lrn = jax.jit(run)(x0)
    e_nom = np.asarray(e_nom)
    e_lrn = np.asarray(e_lrn)
    # after warmup the oracle must reduce the one-step prediction error
    assert e_lrn[50:].sum() < 0.5 * e_nom[50:].sum()


def test_pretrained_window_from_golden_train_data(golden):
    """Pretraining path (ref: train_data.mat 7x500, used by the q500_pretrained
    golden): window built from stacked arrays gives finite, nonzero estimates."""
    from lbmpc_tpu.oracle import window_from_arrays

    data = golden("train_data")  # (7, 500): rows 0-2 X, rows 3-6 Y
    w = window_from_arrays(data[:3], data[3:7], q=500)
    assert int(w.count) == 500
    g = nw_estimate(jnp.asarray([-0.1, -0.1, 0.05]), w)
    assert np.isfinite(np.asarray(g)).all()
    assert np.abs(np.asarray(g)).max() > 0


def test_make_xi_layout():
    dx = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    du = jnp.asarray([5.0])
    np.testing.assert_allclose(np.asarray(make_xi(dx, du)), [1.0, 2.0, 5.0])


def test_nw_estimate_and_jac_matches_jacfwd():
    """Closed-form NW Jacobian (hot-path derivative) == autodiff, f64."""
    import jax

    from lbmpc_tpu.oracle import nw_estimate, nw_estimate_and_jac, init_window

    rng = np.random.default_rng(3)
    q = 40
    win = init_window(q)
    win = type(win)(
        X=jnp.asarray(0.3 * rng.standard_normal((q, 3))),
        Y=jnp.asarray(0.01 * rng.standard_normal((q, 4))),
        valid=jnp.asarray((rng.random(q) > 0.3).astype(float)),
        count=jnp.asarray(q, jnp.int32),
    )
    for _ in range(5):
        xi = jnp.asarray(0.4 * rng.standard_normal(3))
        y, J = nw_estimate_and_jac(xi, win)
        y_ref = nw_estimate(xi, win)
        J_ref = jax.jacfwd(lambda v: nw_estimate(v, win))(xi)
        np.testing.assert_allclose(np.asarray(y), np.asarray(y_ref), atol=1e-13)
        np.testing.assert_allclose(np.asarray(J), np.asarray(J_ref), atol=1e-11)
    # stacked-query batching matches per-query
    xis = jnp.asarray(0.4 * rng.standard_normal((7, 3)))
    yb, Jb = nw_estimate_and_jac(xis, win)
    for i in range(7):
        yi, Ji = nw_estimate_and_jac(xis[i], win)
        np.testing.assert_allclose(np.asarray(yb[i]), np.asarray(yi), atol=1e-13)
        np.testing.assert_allclose(np.asarray(Jb[i]), np.asarray(Ji), atol=1e-13)


def test_push_batched_lockstep_equals_vmapped():
    """push_batched (r4 fleet fix: the per-lane scatter cost 78% of the
    fleet closed-loop step; lockstep cohorts take one shared-index write)
    == vmap(push) bit-for-bit through >2 ring wraps, and falls back to the
    scatter path exactly when counts diverge."""
    import jax

    from lbmpc_tpu.oracle import init_window, push, push_batched

    rng = np.random.default_rng(0)
    B, q = 16, 7
    win0 = init_window(q)
    wins = jax.tree.map(lambda a: jnp.broadcast_to(a, (B,) + a.shape), win0)
    wins_v = wins
    for step in range(2 * q + 3):
        xi = jnp.asarray(rng.standard_normal((B, 3)))
        y = jnp.asarray(rng.standard_normal((B, 4)))
        wins = push_batched(wins, xi, y)
        wins_v = jax.vmap(push)(wins_v, xi, y)
        for f in ("X", "Y", "valid", "count"):
            assert np.array_equal(np.asarray(getattr(wins, f)),
                                  np.asarray(getattr(wins_v, f))), (step, f)
    cnt = jnp.arange(B, dtype=jnp.int32) % q
    wins_nu = type(win0)(X=wins.X, Y=wins.Y, valid=wins.valid, count=cnt)
    xi = jnp.asarray(rng.standard_normal((B, 3)))
    y = jnp.asarray(rng.standard_normal((B, 4)))
    out = push_batched(wins_nu, xi, y)
    ref = jax.vmap(push)(wins_nu, xi, y)
    for f in ("X", "Y", "valid", "count"):
        assert np.array_equal(np.asarray(getattr(out, f)),
                              np.asarray(getattr(ref, f))), f
