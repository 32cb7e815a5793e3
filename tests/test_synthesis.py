"""Parity tests for the synthesis layer vs examples/DSS_NMPC.m:7-100 dumps."""

import numpy as np

from lbmpc_tpu.models.mgcm import mgcm_dlti
from lbmpc_tpu.synthesis import dare, dlqr, mat_ocp, place_poles

KSTABIL_REF = np.array(
    [-3.0741871369407554, 2.095780244087992, 0.11943623665943426, -0.0089468886920762662]
)
KLQR_REF = np.array(
    [-0.61996164940946863, 0.53059361681332351, 0.5500538162518267, -0.076844345601266642]
)
P_REF = np.array(
    [
        [2379.7532879963537, -1408.5263693397237, 586.83440559833582, 2.5445279697916892],
        [-1408.5263693397237, 1020.3569574199943, -486.63684023020357, -2.145155287025557],
        [586.83440559833582, -486.63684023020357, 376.28936931980752, 1.7124257706711175],
        [2.5445279697916892, -2.145155287025557, 1.7124257706711175, 1.0127918290408704],
    ]
)
LAMBDA_REF = np.array(
    [0.44830453337943682, 0.50434260005186637, 0.17255257580298672, 5.0821515202301767e-15]
)
PSI_REF = 0.17255257580298697


def test_mat_ocp_parity():
    Ad, Bd, C, _ = mgcm_dlti()
    ocp = mat_ocp(Ad, Bd, C)
    np.testing.assert_allclose(ocp.Ks.ravel(), KSTABIL_REF, atol=1e-10)
    np.testing.assert_allclose(ocp.Klqr.ravel(), KLQR_REF, atol=1e-10)
    np.testing.assert_allclose(ocp.P, P_REF, rtol=1e-10)
    np.testing.assert_allclose(ocp.LAMBDA.ravel(), LAMBDA_REF, atol=1e-12)
    np.testing.assert_allclose(ocp.PSI.ravel(), [PSI_REF], atol=1e-12)
    np.testing.assert_allclose(ocp.LAMBDA_0, 0.0, atol=1e-12)
    np.testing.assert_allclose(ocp.PSI_0, 0.0, atol=1e-12)


def test_place_poles_eigenvalues():
    Ad, Bd, _, _ = mgcm_dlti()
    K = place_poles(Ad, Bd, (0.75, 0.78, 0.98, 0.99))
    eig = np.sort(np.linalg.eigvals(Ad - Bd @ K).real)
    np.testing.assert_allclose(eig, [0.75, 0.78, 0.98, 0.99], atol=1e-9)


def test_dare_residual():
    Ad, Bd, _, _ = mgcm_dlti()
    Q = np.eye(4)
    R = np.eye(1)
    X = dare(Ad, Bd, Q, R)
    # DARE residual: A'XA - X - A'XB (B'XB+R)^-1 B'XA + Q = 0
    res = (
        Ad.T @ X @ Ad
        - X
        - Ad.T @ X @ Bd @ np.linalg.solve(Bd.T @ X @ Bd + R, Bd.T @ X @ Ad)
        + Q
    )
    assert np.abs(res).max() < 1e-8


def test_dlqr_stabilizes():
    Ad, Bd, _, _ = mgcm_dlti()
    K = dlqr(Ad, Bd, np.eye(4), np.eye(1))
    assert np.abs(np.linalg.eigvals(Ad - Bd @ K)).max() < 1.0
