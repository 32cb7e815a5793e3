"""Native polylp engine: build, correctness vs scipy, and full-pipeline parity."""

import os
import time

import numpy as np
import pytest
import scipy.optimize

from lbmpc_tpu.sets import native
from lbmpc_tpu.sets.polytope import Polytope, box


@pytest.fixture(scope="module")
def lib():
    if not native.available():
        pytest.skip("no C++ toolchain for native polylp")
    return native.get_lib()


def test_native_support_matches_scipy(lib):
    rng = np.random.default_rng(0)
    n = 5
    F = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((12, n))])
    h = np.concatenate([np.full(2 * n, 2.0), rng.uniform(0.5, 2.0, 12)])
    for seed in range(8):
        c = np.random.default_rng(seed).standard_normal(n)
        ref = scipy.optimize.linprog(-c, A_ub=F, b_ub=h, bounds=(None, None), method="highs")
        got = native.support(c, F, h)
        assert abs(got - (-ref.fun)) < 1e-7


def test_native_unbounded_direction(lib):
    # max x1 subject only to x1 >= -1: unbounded
    F = np.array([[-1.0, 0.0]])
    h = np.array([1.0])
    assert native.support(np.array([1.0, 0.0]), F, h) == np.inf


def test_native_min_hrep(lib):
    p = box([-1, -1], [1, 1])
    F = np.vstack([p.F, [[0.5, 0.5], [1.0, 0.0]]])
    h = np.concatenate([p.h, [5.0, 2.0]])
    keep = native.min_hrep_mask(F, h)
    assert keep[:4].all()
    assert not keep[4:].any()


def test_native_batch(lib):
    rng = np.random.default_rng(1)
    n = 4
    F = np.vstack([np.eye(n), -np.eye(n)])
    h = np.ones(2 * n)
    C = rng.standard_normal((32, n))
    vals = native.support_batch(C, F, h)
    np.testing.assert_allclose(vals, np.abs(C).sum(axis=1), atol=1e-8)


def test_pipeline_native_equals_scipy(lib, monkeypatch):
    """The robust terminal-set pipeline gives identical results either way."""
    from lbmpc_tpu.models.mgcm import mgcm_dlti
    from lbmpc_tpu.sets.terminal import get_cons_poly
    from lbmpc_tpu.synthesis import mat_ocp

    Ad, Bd, C, _ = mgcm_dlti()
    ocp = mat_ocp(Ad, Bd, C)
    kw = dict(
        x_min=[0.0, 1.1875, 0.1547, -20.0], x_max=[1.0, 2.1875, 2.1547, 20.0],
        u_min=0.1547, u_max=2.1547, state_uncert=[0.02, 5e-4, 0.0, 0.0],
        x_wp=[0.5, 1.6875, 1.1547, 0.0], u_wp=1.1547,
        A=Ad, B=Bd, Q=np.eye(4), R=np.eye(1),
        LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
    )
    cs_native = get_cons_poly(**kw)
    monkeypatch.setenv("LBMPC_TPU_NO_NATIVE", "1")
    cs_scipy = get_cons_poly(**kw)
    assert Polytope(cs_native.F_w_N, cs_native.h_w_N).set_equals(
        Polytope(cs_scipy.F_w_N, cs_scipy.h_w_N), tol=1e-8
    )


def test_native_vertex_enumeration_box(lib):
    """Unit cube in R^3: exactly the 8 corners."""
    b = box(-np.ones(3), np.ones(3))
    V = native.vertices(b.F, b.h)
    assert V is not None and V.shape == (8, 3)
    got = set(map(tuple, np.round(V, 9)))
    want = {tuple(v) for v in np.array(np.meshgrid(*[[-1.0, 1.0]] * 3)).T.reshape(-1, 3)}
    assert got == want


def test_native_vertices_match_scipy_random(lib):
    """Random bounded polytopes: native vertex set == qhull vertex set."""
    rng = np.random.default_rng(1)
    for trial in range(5):
        n = 3
        F = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((8, n))])
        h = np.concatenate([np.full(2 * n, 1.5), rng.uniform(0.8, 2.0, 8)])
        p = Polytope(F, h)
        Vn = native.vertices(F, h)
        assert Vn is not None
        os.environ["LBMPC_TPU_NO_NATIVE"] = "1"
        try:
            Vs = p.vertices()
        finally:
            del os.environ["LBMPC_TPU_NO_NATIVE"]
        assert Vn.shape[0] == Vs.shape[0]
        # match rows up to ordering
        d = np.linalg.norm(Vn[:, None, :] - Vs[None, :, :], axis=2)
        assert d.min(axis=1).max() < 1e-6


def test_from_vertices_dual_matches_qhull(lib):
    """Native polar-dual facet enumeration == scipy ConvexHull H-rep."""
    from lbmpc_tpu.sets.polytope import from_vertices

    rng = np.random.default_rng(2)
    pts = rng.standard_normal((30, 3))
    p_native = from_vertices(pts)
    os.environ["LBMPC_TPU_NO_NATIVE"] = "1"
    try:
        p_scipy = from_vertices(pts)
        assert p_native.set_equals(p_scipy, tol=1e-6)
    finally:
        del os.environ["LBMPC_TPU_NO_NATIVE"]


def test_native_vertices_budget_fallback(lib):
    """Past the native combination budget the wrapper signals fallback."""
    rng = np.random.default_rng(3)
    n = 8
    F = np.vstack([np.eye(n), -np.eye(n), rng.standard_normal((200, n))])
    h = np.concatenate([np.full(2 * n, 1.0), rng.uniform(1.0, 3.0, 200)])
    assert native.vertices(F, h) is None  # C(216, 8) >> budget


def test_minkowski_sum_uses_native_path(lib):
    """reach_set-style Minkowski sum runs through the native V-rep path."""
    a = box(-np.ones(2), np.ones(2))
    c = box(-0.5 * np.ones(2), 0.5 * np.ones(2))
    s = a.minkowski_sum(c)
    want = box(-1.5 * np.ones(2), 1.5 * np.ones(2))
    assert s.set_equals(want, tol=1e-7)
