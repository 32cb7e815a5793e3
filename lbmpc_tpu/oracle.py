"""Nadaraya-Watson model-error oracle + fixed-shape data windows.

The LBMPC learning layer (ref: functions/oracleL2NW.m, functions/casadiL2NW.m,
utilities/update_data.m, utilities/get_data.m), re-designed for TPU:

  - the estimate is one masked matmul chain over a statically shaped window —
    the validity-flag layout of casadiL2NW.m:2 generalized to struct-of-arrays
    (X (q, d_in), Y (q, d_out), valid (q,)) so it jits, vmaps over scenarios,
    and rides the MXU when evaluated for all N horizon stages at once;
  - the moving window (ref: update_data.m:3-10 shift-append) becomes a ring
    buffer via `lax.dynamic_update_slice` — same point set, O(1) update, no
    copies. NW weights are permutation-invariant, so ring order ≡ shift order.

Semantics notes (kept bit-compatible with the reference):
  - kernel value exp(-||X_i - xi||^2 / bw^2), bw=0.5, ridge lambda=0.001
    (ref: oracleL2NW.m:9-10,26-30);
  - weights = kval_i / (lambda + sum_j valid_j * kval_j). The numerator is NOT
    masked in casadiL2NW.m:18-25 — invalid columns contribute zero only
    because their Y is zero; we keep Y rows of invalid slots at zero so the
    masked and unmasked numerator coincide;
  - the fmincon family's initial zero observation (data.X=zeros(3,1),
    ref: LBMPC_RunExample.m:78-80) is reproduced by marking slot 0 valid with
    X=0, Y=0 at init (exactly what DMS_LBMPC_casadi.m:160-161 does).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DataWindow(NamedTuple):
    """Fixed-shape oracle observation window (one scenario; vmap for batches)."""

    X: jax.Array       # (q, d_in)  regressors  xi = [dx1, dx2, du]
    Y: jax.Array       # (q, d_out) targets     model-error observations
    valid: jax.Array   # (q,) 0/1 flags
    count: jax.Array   # scalar int32 — total points ever inserted


def init_window(q: int, d_in: int = 3, d_out: int = 4, dtype=jnp.float64,
                seed_zero_point: bool = True) -> DataWindow:
    """Empty window; optionally seed slot 0 as a valid (0, 0) observation
    (both reference families start that way — see module docstring)."""
    X = jnp.zeros((q, d_in), dtype)
    Y = jnp.zeros((q, d_out), dtype)
    valid = jnp.zeros((q,), dtype).at[0].set(1.0 if seed_zero_point else 0.0)
    count = jnp.asarray(1 if seed_zero_point else 0, jnp.int32)
    return DataWindow(X, Y, valid, count)


def window_from_arrays(X, Y, q: int | None = None, dtype=jnp.float64) -> DataWindow:
    """Build a (pre-trained) window from stacked observations.

    Accepts X (k, d_in), Y (k, d_out) — e.g. the reference's train_data.mat
    (7 x 500: rows 1-3 = X, rows 4-7 = Y, ref: hybrid_LBMPC_casadi.m
    pretraining and DMS_tLBMPC_q500_pretrained golden). If k > q the most
    recent q points are kept; if k < q the remainder stays invalid.
    """
    import numpy as np

    X = np.asarray(X, float)
    Y = np.asarray(Y, float)
    if X.shape[0] < X.shape[1] and X.shape[0] in (3,):  # row-layout input
        X = X.T
        Y = Y.T
    k = X.shape[0]
    if q is None:
        q = k
    keep = min(k, q)
    Xw = np.zeros((q, X.shape[1]))
    Yw = np.zeros((q, Y.shape[1]))
    valid = np.zeros(q)
    Xw[:keep] = X[-keep:]
    Yw[:keep] = Y[-keep:]
    valid[:keep] = 1.0
    return DataWindow(
        X=jnp.asarray(Xw, dtype), Y=jnp.asarray(Yw, dtype),
        valid=jnp.asarray(valid, dtype), count=jnp.asarray(keep, jnp.int32),
    )


def push(window: DataWindow, x_new: jax.Array, y_new: jax.Array) -> DataWindow:
    """Insert one observation, overwriting the oldest once the window is full.

    Ring-buffer equivalent of update_data.m:3-10 / get_data.m:3-10.
    """
    q = window.X.shape[0]
    idx = window.count % q
    zero = jnp.zeros((), idx.dtype)
    X = jax.lax.dynamic_update_slice(window.X, x_new[None, :], (idx, zero))
    Y = jax.lax.dynamic_update_slice(window.Y, y_new[None, :], (idx, zero))
    valid = window.valid.at[idx].set(1.0)
    return DataWindow(X, Y, valid, window.count + 1)


def push_batched(window: DataWindow, x_new: jax.Array,
                 y_new: jax.Array) -> DataWindow:
    """Batched push with a lockstep fast path (r4 fleet phase budget:
    vmap(push)'s per-lane dynamic_update_slice lowers to a SCATTER over the
    cohort — measured 40.9 ms of the 52.3 ms fleet step at chunk 8192, 78%
    of the whole closed-loop cost). Fleet cohorts advance in lockstep, so
    every lane's ring index is equal and ONE shared-index slab write
    replaces the scatter; a lax.cond falls back to the scatter when counts
    diverge (e.g. hand-built heterogeneous windows), keeping semantics
    exactly those of vmap(push)."""
    c0 = window.count[0]
    uniform = jnp.all(window.count == c0)
    q = window.X.shape[1]

    def lock(w):
        idx = c0 % q
        z = jnp.zeros((), idx.dtype)
        X = jax.lax.dynamic_update_slice(w.X, x_new[:, None, :], (z, idx, z))
        Y = jax.lax.dynamic_update_slice(w.Y, y_new[:, None, :], (z, idx, z))
        valid = jax.lax.dynamic_update_slice(
            w.valid, jnp.ones_like(w.valid[:, :1]), (z, idx))
        return DataWindow(X, Y, valid, w.count + 1)

    return jax.lax.cond(uniform, lock,
                        lambda w: jax.vmap(push)(w, x_new, y_new), window)


def nw_estimate(
    xi: jax.Array,
    window: DataWindow,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
) -> jax.Array:
    """g(xi) = sum_i Y_i k(X_i, xi) / (ridge + sum_j valid_j k(X_j, xi)).

    xi may be a single (d_in,) query or a stacked (..., d_in) batch; the
    window is shared. Batched queries use one (..., q) x (q, d_out) matmul.
    """
    X, Y, valid = window.X, window.Y, window.valid
    sq = jnp.sum((xi[..., None, :] - X) ** 2, axis=-1)          # (..., q)
    kval = jnp.exp(-sq / (bandwidth * bandwidth))
    denom = ridge + jnp.sum(kval * valid, axis=-1, keepdims=True)
    weights = (kval * valid) / denom                             # (..., q)
    return weights @ Y                                           # (..., d_out)


def nw_estimate_and_jac(
    xi: jax.Array,
    window: DataWindow,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
) -> tuple[jax.Array, jax.Array]:
    """NW value AND its xi-Jacobian from one shared kernel evaluation.

    With w_i(xi) = v_i k_i / D, D = ridge + sum_j v_j k_j and
    k_i = exp(-||X_i - xi||^2 / bw^2):

        d yhat / d xi = (2 / bw^2) [ sum_i w_i Y_i (X_i - xi)^T
                                     - yhat (sum_j w_j (X_j - xi))^T ]

    Closed form shares kval/weights with the value, so value+Jacobian costs
    ~one forward pass plus a (q, d_out, d_in) contraction — vs d_in (or worse,
    the SQP's nz) tangent passes under jacfwd, each re-doing the q kernel
    exps. This is the hot-path derivative for the hand-derived Gauss-Newton
    Jacobian in controllers/sqp_fused.py (ROADMAP perf item 2).

    Returns (yhat (..., d_out), J (..., d_out, d_in)).
    """
    X, Y, valid = window.X, window.Y, window.valid
    diff = X - xi[..., None, :]                                  # (..., q, d_in)
    sq = jnp.sum(diff * diff, axis=-1)                           # (..., q)
    kval = jnp.exp(-sq / (bandwidth * bandwidth))
    denom = ridge + jnp.sum(kval * valid, axis=-1, keepdims=True)
    weights = (kval * valid) / denom                             # (..., q)
    yhat = weights @ Y                                           # (..., d_out)
    # sum_i w_i Y_i (X_i - xi)^T  and  sum_j w_j (X_j - xi)
    T1 = jnp.einsum("...q,qo,...qi->...oi", weights, Y, diff)
    s1 = jnp.einsum("...q,...qi->...i", weights, diff)
    J = (2.0 / (bandwidth * bandwidth)) * (
        T1 - yhat[..., :, None] * s1[..., None, :])
    return yhat, J


def make_xi(dx: jax.Array, du: jax.Array) -> jax.Array:
    """Regressor xi = [dx1; dx2; du] (ref: oracleL2NW.m:2 `ksi=[x(1:2);u]`)."""
    return jnp.concatenate([dx[..., :2], du], axis=-1)


def learned_step(
    dx: jax.Array,
    du: jax.Array,
    A: jax.Array,
    B: jax.Array,
    window: DataWindow,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
) -> jax.Array:
    """Learned model x+ = A dx + B du + g([dx1, dx2, du]) in delta coordinates.

    Ref: models/learnedModel.m:25, DMS_LBMPC_casadi.m:321-333.
    """
    lin = jnp.einsum("ij,...j->...i", A, dx) + jnp.einsum("ij,...j->...i", B, du)
    return lin + nw_estimate(make_xi(dx, du), window, bandwidth, ridge)


def observe_residual(
    dx_k: jax.Array,
    du_k: jax.Array,
    dx_k1_true: jax.Array,
    A: jax.Array,
    B: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Data-acquisition pair (X, Y): regressor and true-vs-nominal residual.

    Ref: functions/ocpLBMPC.m:14-15, DMS_LBMPC_casadi.m:204-206.
    """
    x_new = make_xi(dx_k, du_k)
    y_new = dx_k1_true - (
        jnp.einsum("ij,...j->...i", A, dx_k) + jnp.einsum("ij,...j->...i", B, du_k)
    )
    return x_new, y_new
