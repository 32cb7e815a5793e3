"""Moore-Greitzer Compressor Model (MGCM): continuous ODE, integrators, DLTI.

TPU-native re-design of the reference plant layer:
  - continuous dynamics  (ref: matlab/LBMPC/models/trueModel.m:20-42)
  - fixed-step RK4       (ref: examples/DMS_LBMPC_casadi.m:337-344 `dynamic`)
  - adaptive RK23 (Bogacki-Shampine pair, the algorithm behind MATLAB `ode23`,
    ref: models/trueModel.m:14-17) implemented with `lax.while_loop` so it jits
    and vmaps; used by the fmincon-family closed loops.
  - exact discretization Ad = expm(A*Ts), Bd = (Ad - I) A^-1 B around the
    equilibrium (ref: functions/mgcmDLTI.m:24-41), done with jnp so it can run
    on device, but typically invoked once at config time.

All functions are pure, statically shaped, and vmap/jit friendly. States are
(..., 4) arrays, inputs (..., 1) or scalar — batch dimensions broadcast.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

# Physical constants (ref: models/trueModel.m:32-35)
WN2 = 1000.0          # wn^2, wn = sqrt(1000) resonant frequency
TWO_ZETA_WN = float(2.0 * (1.0 / np.sqrt(2.0)) * np.sqrt(1000.0))  # 2*zeta*wn = sqrt(2000); python float so f32 batches don't promote
BETA2 = 1.0           # beta^2
X2_C = 0.0            # pressure constant

# Equilibrium / working point (ref: functions/mgcmDLTI.m:27-30, examples/DMS_LBMPC_casadi.m:76-77)
MGCM_EQ_X = np.array([0.5, 1.6875, 1.1547, 0.0])
MGCM_EQ_U = 1.1547

TS = 0.01  # sampling time (ref: functions/mgcmDLTI.m:37)


def mgcm_ode(x: jax.Array, u: jax.Array) -> jax.Array:
    """Continuous-time MGCM dynamics f(x, u).

    x[...,0] mass flow, x[...,1] pressure rise, x[...,2] throttle opening,
    x[...,3] throttle opening rate; scalar input u (throttle command).
    Ref: models/trueModel.m:36-41.
    """
    x1, x2, x3, x4 = x[..., 0], x[..., 1], x[..., 2], x[..., 3]
    u = jnp.asarray(u)
    if u.ndim == x.ndim:  # (..., 1) input layout
        u = u[..., 0]
    f1 = -x2 + X2_C + 1.0 + 3.0 * (x1 / 2.0) - (x1**3) / 2.0
    f2 = (x1 + 1.0 - x3 * jnp.sqrt(x2)) / BETA2
    f3 = x4
    f4 = -WN2 * x3 - TWO_ZETA_WN * x4 + WN2 * u
    return jnp.stack([f1, f2, f3, f4], axis=-1)


def rk4_step(x: jax.Array, u: jax.Array, dt: float, substeps: int = 1,
             ode=None) -> jax.Array:
    """Classic RK4 over one sample period with `substeps` sub-intervals.

    With substeps=1 this reproduces the reference CasADi-family plant exactly
    (ref: examples/DMS_LBMPC_casadi.m:337-344). Larger substeps give a
    high-accuracy integrator for validation.
    """
    h = dt / substeps
    f = mgcm_ode if ode is None else ode

    def body(x, _):
        k1 = f(x, u)
        k2 = f(x + h / 2.0 * k1, u)
        k3 = f(x + h / 2.0 * k2, u)
        k4 = f(x + h * k3, u)
        return x + h / 6.0 * (k1 + 2.0 * k2 + 2.0 * k3 + k4), None

    if substeps == 1:
        return body(x, None)[0]
    x, _ = jax.lax.scan(body, x, None, length=substeps)
    return x


# Bogacki-Shampine 3(2) coefficients — the pair used by MATLAB ode23.
_BS_A2 = 0.5
_BS_A3 = 0.75
# 3rd-order solution weights
_BS_B = np.array([2.0 / 9.0, 1.0 / 3.0, 4.0 / 9.0, 0.0])
# error weights E = b3 - b2hat
_BS_E = np.array([-5.0 / 72.0, 1.0 / 12.0, 1.0 / 9.0, -1.0 / 8.0])


def rk23_step(
    x: jax.Array,
    u: jax.Array,
    dt: float,
    rtol: float = 1e-3,
    atol: float = 1e-6,
    max_steps: int = 64,
    ode=None,
) -> jax.Array:
    """Integrate the MGCM ODE over [0, dt] with an adaptive Bogacki-Shampine
    RK23 scheme — a jit/vmap-compatible equivalent of MATLAB `ode23` as used by
    the fmincon-family plant step (ref: models/trueModel.m:14-17, default
    RelTol=1e-3, AbsTol=1e-6).

    Implemented as a `lax.while_loop` with FSAL reuse and MATLAB-style error
    control: err = h * ||E.k / max(max(|y|,|ynew|), threshold)||_inf. Single
    trajectory only in the error norm — under vmap each lane adapts its own
    step sequence (lanes run lock-step but with per-lane h; masked updates).
    """
    fode = mgcm_ode if ode is None else ode
    threshold = atol / rtol
    # MATLAB ode23 defaults hmax = 0.1*(tf - t0); this is what actually bounds
    # the local error for the short Ts=0.01 plant steps the reference takes.
    hmax = 0.1 * dt

    def err_norm(k_stack, h, y, ynew):
        e = h * jnp.einsum("s,...sn->...n", jnp.asarray(_BS_E, x.dtype), k_stack)
        scale = jnp.maximum(jnp.maximum(jnp.abs(y), jnp.abs(ynew)), threshold)
        return jnp.max(jnp.abs(e / scale), axis=-1)

    f0 = fode(x, u)
    # MATLAB-style initial step selection (ode23: hmax clip, rh heuristic)
    scale0 = jnp.maximum(jnp.abs(x), threshold)
    rh = jnp.max(jnp.abs(f0 / scale0), axis=-1) / (0.8 * rtol ** (1.0 / 3.0))
    h0 = jnp.minimum(jnp.asarray(hmax, x.dtype), 1.0 / jnp.maximum(rh, 1e-30))

    def cond(carry):
        t, y, f, h, i = carry
        return jnp.logical_and(jnp.any(t < dt * (1 - 1e-12)), i < max_steps)

    def body(carry):
        t, y, f, h, i = carry
        active = t < dt * (1 - 1e-12)
        h_eff = jnp.minimum(h, dt - t)
        he = h_eff[..., None] if y.ndim > 1 else h_eff
        k1 = f
        k2 = fode(y + he * _BS_A2 * k1, u)
        k3 = fode(y + he * _BS_A3 * k2, u)
        # python-float weights: keep the carry dtype (f32 batches must not
        # promote to f64 under jax_enable_x64)
        ynew = y + he * (
            float(_BS_B[0]) * k1 + float(_BS_B[1]) * k2 + float(_BS_B[2]) * k3
        )
        k4 = fode(ynew, u)
        k_stack = jnp.stack([k1, k2, k3, k4], axis=-2)
        err = err_norm(k_stack, h_eff[..., None] if y.ndim > 1 else h_eff, y, ynew)
        accept = err <= rtol
        do = jnp.logical_and(active, accept)
        dm = do[..., None] if y.ndim > 1 else do
        y = jnp.where(dm, ynew, y)
        f = jnp.where(dm, k4, f)  # FSAL
        t = jnp.where(do, t + h_eff, t)
        # step-size update (MATLAB ode23 controller)
        grow = h_eff * jnp.minimum(
            5.0, 0.8 * (rtol / jnp.maximum(err, 1e-30)) ** (1.0 / 3.0)
        )
        shrink = h_eff * jnp.maximum(
            0.1, 0.8 * (rtol / jnp.maximum(err, 1e-30)) ** (1.0 / 3.0)
        )
        h_new = jnp.minimum(jnp.where(accept, grow, shrink), hmax)
        h = jnp.where(active, h_new, h)
        return t, y, f, h, i + 1

    t0 = jnp.zeros(x.shape[:-1], x.dtype)
    _, y, _, _, _ = jax.lax.while_loop(cond, body, (t0, x, f0, h0, 0))
    return y


@functools.lru_cache(maxsize=None)
def mgcm_dlti(ts: float = TS) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact DLTI discretization of the MGCM linearized at the equilibrium.

    Returns (Ad, Bd, C, D) as float64 numpy arrays. Re-derives analytically what
    the reference computes with the Symbolic Toolbox (ref: functions/mgcmDLTI.m:
    Jacobian at [0.5, 1.6875, 1.1547, 0], Ad=expm(A*Ts), Bd=(Ad-I)A^-1 B).
    Parity target: the 15-digit constants in models/nominalModel.m:14-21.
    """
    import scipy.linalg

    x1, x2, x3, _x4 = MGCM_EQ_X
    # Analytic Jacobian of mgcm_ode at the equilibrium.
    A = np.array(
        [
            [1.5 - 1.5 * x1**2, -1.0, 0.0, 0.0],
            [1.0, -x3 / (2.0 * np.sqrt(x2)), -np.sqrt(x2), 0.0],
            [0.0, 0.0, 0.0, 1.0],
            [0.0, 0.0, -WN2, -TWO_ZETA_WN],
        ]
    )
    B = np.array([[0.0], [0.0], [0.0], [WN2]])
    Ad = scipy.linalg.expm(A * ts)
    Bd = np.linalg.solve(A, (Ad - np.eye(4)) @ B)
    C = np.eye(4)
    D = np.zeros((4, 1))
    return Ad, Bd, C, D


def nominal_step(x: jax.Array, u: jax.Array, Ad: jax.Array, Bd: jax.Array) -> jax.Array:
    """One step of the nominal DLTI model x+ = Ad x + Bd u (delta coordinates).

    Ref: models/nominalModel.m:28. Batched: x (..., n), u (..., m).
    """
    return jnp.einsum("ij,...j->...i", Ad, x) + jnp.einsum("ij,...j->...i", Bd, u)


# ---------------------------------------------------------------------------
# 2-state Moore-Greitzer model (BASELINE config 1)
#
# The classic surge-dynamics reduction of the MGCM: keep mass flow x1 and
# pressure rise x2 (models/trueModel.m:36-38) and take the throttle opening as
# the DIRECT control input, dropping the second-order throttle actuator
# (trueModel.m:39-41, states x3/x4). Same compressor characteristic, same
# operating point; u_eq equals the 4-state equilibrium throttle opening.
# ---------------------------------------------------------------------------

MG2_EQ_X = np.array([0.5, 1.6875])
MG2_EQ_U = MGCM_EQ_U  # 1.1547 = throttle opening at the operating point


def mg2_ode(x: jax.Array, u: jax.Array) -> jax.Array:
    """Continuous-time 2-state Moore-Greitzer dynamics f(x, u).

    x[...,0] mass flow, x[...,1] pressure rise; scalar input u = throttle
    opening (the 4-state model's x3, ref: models/trueModel.m:36-38).
    """
    x1, x2 = x[..., 0], x[..., 1]
    u = jnp.asarray(u)
    if u.ndim == x.ndim:
        u = u[..., 0]
    f1 = -x2 + X2_C + 1.0 + 3.0 * (x1 / 2.0) - (x1**3) / 2.0
    f2 = (x1 + 1.0 - u * jnp.sqrt(x2)) / BETA2
    return jnp.stack([f1, f2], axis=-1)


@functools.lru_cache(maxsize=None)
def mg2_dlti(ts: float = TS) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Exact DLTI discretization of the 2-state model at its equilibrium.

    Same derivation recipe as mgcm_dlti (analytic Jacobian + expm, ref:
    functions/mgcmDLTI.m:24-39) applied to the reduced dynamics.
    """
    import scipy.linalg

    x1, x2 = MG2_EQ_X
    A = np.array(
        [
            [1.5 - 1.5 * x1**2, -1.0],
            [1.0, -MG2_EQ_U / (2.0 * np.sqrt(x2))],
        ]
    )
    B = np.array([[0.0], [-np.sqrt(x2)]])
    Ad = scipy.linalg.expm(A * ts)
    Bd = np.linalg.solve(A, (Ad - np.eye(2)) @ B)
    C = np.eye(2)
    D = np.zeros((2, 1))
    return Ad, Bd, C, D
