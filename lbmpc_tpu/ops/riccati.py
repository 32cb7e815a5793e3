"""Riccati machinery: jittable DARE, finite-horizon LQ via scan, and a
parallel (associative-scan) Riccati factorization.

Three roles:
  1. `dare_doubling` — on-device DARE (structure-preserving doubling), the
     jittable counterpart of synthesis.dare (MATLAB `dare`,
     ref: functions/matOCP.m:30).
  2. `lqr_backward` — the sequential Riccati recursion over horizon stages:
     the O(N)-depth factorization of the block-banded LQ KKT system that
     direct multiple shooting induces (ref: the lifted DMS NLPs,
     examples/DMS_LBMPC_casadi.m:122-129, which IPOPT hands to a generic
     sparse LU — here the structure is explicit).
  3. `lqr_parallel` — the same factorization with O(log N) depth via
     `jax.lax.associative_scan` over value-function elements
     (Sarkka & Garcia-Fernandez-style parallel LQT; see PAPERS.md parallel
     Riccati references). This is the horizon-stage analog of sequence
     parallelism: for long horizons the scan parallelizes across the VPU/MXU
     instead of serializing N small solves.

All solve:  min sum_{k=0}^{N-1} [1/2 x'Q x + 1/2 u'R u + q'x + r'u]
                 + 1/2 x_N' P x_N + p' x_N
            s.t. x_{k+1} = A x_k + B u_k + c_k,   x_0 given.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=("iters",))
def dare_doubling(A, B, Q, R, iters: int = 30):
    """Solve A'XA - X - A'XB(B'XB+R)^-1 B'XA + Q = 0 by the structure-
    preserving doubling algorithm (quadratic convergence, fixed iterations)."""
    n = A.shape[0]
    I = jnp.eye(n, dtype=A.dtype)
    G = B @ jnp.linalg.solve(R, B.T)

    def body(i, state):
        Ak, Gk, Hk = state
        W = I + Gk @ Hk
        Winv_A = jnp.linalg.solve(W, Ak)
        A1 = Ak @ Winv_A
        G1 = Gk + Ak @ Gk @ jnp.linalg.solve(W.T, Ak.T)
        H1 = Hk + Winv_A.T @ Hk @ Ak
        return A1, G1, H1

    _, _, Hf = jax.lax.fori_loop(0, iters, body, (A, G, Q))
    return Hf


class LQSolution(NamedTuple):
    X: jax.Array       # (N+1, n) optimal states
    U: jax.Array       # (N, m) optimal inputs
    K: jax.Array       # (N, m, n) feedback gains
    k_ff: jax.Array    # (N, m) feedforward terms
    V: jax.Array       # (N+1, n, n) value Hessians (Riccati matrices)


def _stack(A, N):
    return jnp.broadcast_to(A, (N,) + A.shape)


def lqr_backward(A, B, Q, R, P, x0, q=None, r=None, c=None, p=None) -> LQSolution:
    """Sequential Riccati factorization + forward rollout (lax.scan twice).

    A (n,n), B (n,m) time-invariant; Q/R stage costs (optionally stage-varying
    (N, n, n)/(N, m, m)); P terminal; optional affine terms q (N,n), r (N,m),
    c (N,n) dynamics offsets, p (n,) terminal linear cost.
    """
    n, m = B.shape
    dtype = A.dtype
    N = q.shape[0] if q is not None else c.shape[0]
    q = jnp.zeros((N, n), dtype) if q is None else q
    r = jnp.zeros((N, m), dtype) if r is None else r
    c = jnp.zeros((N, n), dtype) if c is None else c
    p = jnp.zeros((n,), dtype) if p is None else p
    Qs = _stack(Q, N) if Q.ndim == 2 else Q
    Rs = _stack(R, N) if R.ndim == 2 else R

    def backward(carry, inp):
        V, v = carry
        Qk, qk, Rk, rk, ck = inp
        BtV = B.T @ V
        S = Rk + BtV @ B
        K = -jnp.linalg.solve(S, BtV @ A)
        kf = -jnp.linalg.solve(S, B.T @ (V @ ck + v) + rk)
        Acl = A + B @ K
        # V_k = Q + K'RK + Acl'V Acl ;  v_k = q + K'(r + R kf) + Acl'(V(B kf + c) + v)
        V1 = Qk + K.T @ Rk @ K + Acl.T @ V @ Acl
        v1 = qk + K.T @ (rk + Rk @ kf) + Acl.T @ (V @ (B @ kf + ck) + v)
        return (V1, v1), (K, kf, V)

    (V0, v0), (Ks, kfs, Vs) = jax.lax.scan(
        backward, (P, p), (Qs[::-1], q[::-1], Rs[::-1], r[::-1], c[::-1])
    )
    Ks = Ks[::-1]
    kfs = kfs[::-1]
    # scan emits the pre-update carry: [V_N, V_{N-1}, ..., V_1]; prepend the
    # final carry V_0 after reversal to get [V_0 .. V_N]
    Vs = jnp.concatenate([V0[None], Vs[::-1]], axis=0)

    def forward(x, inp):
        K, kf, ck = inp
        u = K @ x + kf
        x1 = A @ x + B @ u + ck
        return x1, (x, u)

    xN, (X, U) = jax.lax.scan(forward, x0, (Ks, kfs, c))
    X = jnp.concatenate([X, xN[None]], axis=0)
    return LQSolution(X=X, U=U, K=Ks, k_ff=kfs, V=Vs)


# ---------------- parallel (associative-scan) Riccati ----------------
#
# Value-function elements (Sarkka & Garcia-Fernandez 2021): the conditional
# value function between stages i<j is parameterized as
#   V_{i->j}(x_i, x_j) = const + 1/2 x_i'J x_i + eta'x_i ... with the dual
# representation (A, b, C, eta, J); composition is associative:
#   (A1,b1,C1,e1,J1) * (A2,b2,C2,e2,J2):
#     D = (I + C1 J2)^-1
#     A = A2 D A1
#     b = A2 D (b1 + C1 e2) + b2
#     C = A2 D C1 A2' + C2
#     e = A1' (I - J2 D' C1')... (standard form below)
#     J = A1' J2 D A1 + J1


def _combine(later, earlier):
    """Associative combination of value elements; elem = (A, b, C, eta, J).

    Called by `associative_scan` over the time-REVERSED element array, so the
    first argument is the already-combined LATER block (index j in the
    Sarkka/Garcia-Fernandez formulas) and the second is the EARLIER element
    (index i). Arrays carry leading batch dims."""
    Aj, bj, Cj, ej, Jj = later
    Ai, bi, Ci, ei, Ji = earlier
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)
    M = I + Ci @ Jj                      # (I + C_i J_j)
    A = Aj @ jnp.linalg.solve(M, Ai)
    b = (Aj @ jnp.linalg.solve(M, bi[..., None] + Ci @ ej[..., None]))[..., 0] + bj
    C = Aj @ jnp.linalg.solve(M, Ci) @ jnp.swapaxes(Aj, -1, -2) + Cj
    Mt = I + Jj @ Ci                     # (I + J_j C_i)
    e = (jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(Mt, ej[..., None] - Jj @ bi[..., None]))[..., 0] + ei
    J = jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(Mt, Jj) @ Ai + Ji
    return (A, b, C, e, J)


def lqr_parallel(A, B, Q, R, P, x0, q=None, r=None, c=None, p=None) -> LQSolution:
    """Parallel Riccati: O(log N) depth via associative_scan over stages.

    Produces the same (K, k_ff, V) as `lqr_backward` (up to roundoff) — the
    performance variant with identical math to diff against (SURVEY.md §7.4.5).
    Q and R may be stage-varying ((N, n, n) / (N, m, m)) — the form the sparse
    IPM's barrier-modified weights take (ops/sparse_ipm.py).
    """
    n, m = B.shape
    dtype = A.dtype
    N = q.shape[0] if q is not None else c.shape[0]
    q = jnp.zeros((N, n), dtype) if q is None else q
    r = jnp.zeros((N, m), dtype) if r is None else r
    c = jnp.zeros((N, n), dtype) if c is None else c
    p = jnp.zeros((n,), dtype) if p is None else p
    Qs = _stack(Q, N) if Q.ndim == 2 else Q
    Rs = _stack(R, N) if R.ndim == 2 else R

    Rinv = jnp.linalg.inv(Rs)                       # (N, m, m)
    # stage elements: A_k = A, b_k = c_k - B R_k^-1 r_k, C_k = B R_k^-1 B',
    # eta_k = -q_k, J_k = Q_k  (value-function dual parametrization)
    Ae = _stack(A, N)
    be = c - jnp.einsum("ij,njk,nk->ni", B, Rinv, r)
    Ce = jnp.einsum("ij,njk,lk->nil", B, Rinv, B)
    ee = -q
    Je = Qs
    # terminal element encodes V_N = 1/2 x'Px + p'x
    At = jnp.zeros((1, n, n), dtype)
    bt = jnp.zeros((1, n), dtype)
    Ct = jnp.zeros((1, n, n), dtype)
    et = -p[None]
    Jt = P[None]

    elems = (
        jnp.concatenate([Ae, At]),
        jnp.concatenate([be, bt]),
        jnp.concatenate([Ce, Ct]),
        jnp.concatenate([ee, et]),
        jnp.concatenate([Je, Jt]),
    )
    # reverse scan: suffix compositions give value functions at each stage
    rev = jax.tree.map(lambda a: a[::-1], elems)
    scanned = jax.lax.associative_scan(_combine, rev)
    _, _, _, etas, Js = jax.tree.map(lambda a: a[::-1], scanned)
    # V_k = J from the suffix element at k; linear term v_k = -eta
    Vs = Js
    vs = -etas

    def gains(Vv):
        V1, v1, qk, rk, ck, Rk = Vv
        BtV = B.T @ V1
        S = Rk + BtV @ B
        K = -jnp.linalg.solve(S, BtV @ A)
        kf = -jnp.linalg.solve(S, B.T @ (V1 @ ck + v1) + rk)
        return K, kf

    Ks, kfs = jax.vmap(gains)((Vs[1:], vs[1:], q, r, c, Rs))

    def forward(x, inp):
        K, kf, ck = inp
        u = K @ x + kf
        x1 = A @ x + B @ u + ck
        return x1, (x, u)

    xN, (X, U) = jax.lax.scan(forward, x0, (Ks, kfs, c))
    X = jnp.concatenate([X, xN[None]], axis=0)
    return LQSolution(X=X, U=U, K=Ks, k_ff=kfs, V=Vs)
