"""Stage-sharded Riccati sweeps over a device mesh ("SP").

The stage-form solvers (ops/sparse_gn.py, ops/sparse_ipm.py) factor every IPM
Newton system by Riccati sweeps whose depth is the horizon N — the MPC analog
of sequence length. This module shards the HORIZON STAGES across a mesh axis
and runs the sweep as a distributed linear recurrence (the north-star's
"per-stage KKT block reductions and residual norms computed via ICI
collectives" — BASELINE.json; SURVEY.md §2.3 "Stage-parallel KKT
factorization" row; VERDICT r3 item 4):

  1. each device folds its local stage block of value-function elements
     (Sarkka & Garcia-Fernandez parametrization, ops/riccati.py:117-150)
     into one composite — local lax.associative_scan, no communication;
  2. the D block composites are exchanged with ONE all_gather over the mesh
     axis (tiny: 3 (nw, nw) + 2 (nw, K) arrays per device) and every device
     folds the composites of LATER blocks plus the terminal element into its
     carry-in — O(D) small combines, replicated;
  3. local suffix elements compose with the carry-in to give every stage's
     value function (V_k, v_k); gains are stage-local algebra;
  4. the forward rollout is the same pattern on affine maps (compose local
     block, all_gather, fold earlier blocks, roll locally).

Cross terms (the prestabilizer's x-u coupling in sparse_gn's stage Hessians)
are eliminated by completion of squares BEFORE building elements
(c = v - R^-1 S' w), which leaves the standard element algebra intact; gains
and rollout use the ORIGINAL (A, B, S, R), so results match
ops/sparse_gn._riccati_cross exactly (up to roundoff — equality pinned in
tests/test_riccati_sharded.py and the N=300 gate in tests/test_sparse_gn.py).

Linear terms carry a trailing RHS axis K, so one sweep serves the stage-form
IPM's nth theta-coupling columns + the predictor (and the corrector in a
second sweep) — the sharded analog of the round-3 factor/solve split.

Reference semantics being scaled: the lifted DMS stage structure of
examples/DMS_LBMPC_casadi.m:122-130 (the reference hands it to IPOPT/MUMPS,
single-threaded; here the stages ride a jax.sharding Mesh axis).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map


def stage_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """1-D mesh with axis 'stage' for horizon-stage sharding."""
    if devices is None:
        devices = jax.devices()[: n_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("stage",))


def _combine(later, earlier):
    """Associative combination of value elements (A, b, C, e, J); b/e carry a
    trailing RHS axis K. `later` is the already-combined suffix block, per
    the value-function composition of ops/riccati.py:132-150."""
    Aj, bj, Cj, ej, Jj = later
    Ai, bi, Ci, ei, Ji = earlier
    n = Ai.shape[-1]
    I = jnp.eye(n, dtype=Ai.dtype)
    M = I + Ci @ Jj
    A = Aj @ jnp.linalg.solve(M, Ai)
    b = Aj @ jnp.linalg.solve(M, bi + Ci @ ej) + bj
    C = Aj @ jnp.linalg.solve(M, Ci) @ jnp.swapaxes(Aj, -1, -2) + Cj
    Mt = I + Jj @ Ci
    e = jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(Mt, ej - Jj @ bi) + ei
    J = jnp.swapaxes(Ai, -1, -2) @ jnp.linalg.solve(Mt, Jj) @ Ai + Ji
    return (A, b, C, e, J)


def _identity_elem(n, K, dtype):
    return (jnp.eye(n, dtype=dtype), jnp.zeros((n, K), dtype),
            jnp.zeros((n, n), dtype), jnp.zeros((n, K), dtype),
            jnp.zeros((n, n), dtype))


def lqr_cross_sharded(mesh: Mesh, As, Bs, Qs, Ss, Rs, qs, rs, PN, pN):
    """Distributed-prefix LQ solve with cross terms and stage-varying
    dynamics, semantics of ops/sparse_gn._riccati_cross with multi-RHS
    linear terms:

      min sum_k 1/2 w'Q_k w + w'S_k c + 1/2 c'R_k c + q_k'w + r_k'c
          + 1/2 w_N'PN w_N + pN'w_N,   w_{k+1} = A_k w + B_k c,  w_0 = 0

    As/Bs/Qs/Ss/Rs: (N, ...) stage arrays sharded (or shardable) over the
    mesh 'stage' axis; qs (N, nw, K), rs (N, m, K), pN (nw, K) carry K
    right-hand sides. Returns (W (N+1, nw, K), C (N, m, K)) fully gathered.
    N not divisible by the mesh axis size is padded with identity stages
    (A=I, B=0, Q=S=q=0, R=I) whose value elements are the identity — exact.
    """
    N, nw = As.shape[0], As.shape[-1]
    m = Bs.shape[-1]
    K = qs.shape[-1]
    dtype = As.dtype
    D = mesh.shape["stage"]
    pad = (-N) % D
    if pad:
        zpad = lambda a, fill: jnp.concatenate(
            [a, jnp.broadcast_to(fill, (pad,) + a.shape[1:])])
        As_p = zpad(As, jnp.eye(nw, dtype=dtype))
        Bs_p = zpad(Bs, jnp.zeros((nw, m), dtype))
        Qs_p = zpad(Qs, jnp.zeros((nw, nw), dtype))
        Ss_p = zpad(Ss, jnp.zeros((nw, m), dtype))
        Rs_p = zpad(Rs, jnp.eye(m, dtype=dtype))
        qs_p = zpad(qs, jnp.zeros((nw, K), dtype))
        rs_p = zpad(rs, jnp.zeros((m, K), dtype))
        W, C = lqr_cross_sharded(mesh, As_p, Bs_p, Qs_p, Ss_p, Rs_p,
                                 qs_p, rs_p, PN, pN)
        # padded stages propagate w unchanged -> W[N..Np] all equal w_N
        return jnp.concatenate([W[:N], W[-1:]], axis=0), C[:N]

    @functools.partial(
        shard_map, mesh=mesh,
        in_specs=(P("stage"),) * 7 + (P(), P()),
        out_specs=(P("stage"), P()),
        check_vma=False)
    def sweep(As, Bs, Qs, Ss, Rs, qs, rs, PN, pN):
        idx = jax.lax.axis_index("stage")
        # ---- cross-term elimination (c = v - R^-1 S' w) ----
        Rinv = jnp.linalg.inv(Rs)
        SRi = Ss @ Rinv                       # (L, nw, m)
        At = As - jnp.einsum("kim,kmj->kij", Bs @ Rinv,
                             jnp.swapaxes(Ss, -1, -2))
        Qt = Qs - SRi @ jnp.swapaxes(Ss, -1, -2)
        qt = qs - SRi @ rs                    # (L, nw, K)
        # ---- stage elements ----
        Ce = jnp.einsum("kim,kmn,kjn->kij", Bs, Rinv, Bs)
        be = -jnp.einsum("kim,kmn,knr->kir", Bs, Rinv, rs)
        elems = (At, be, Ce, -qt, Qt)
        # ---- 1. local suffix scan (reverse the local block) ----
        rev = jax.tree.map(lambda a: a[::-1], elems)
        suf_rev = jax.lax.associative_scan(_combine, rev)
        suf = jax.tree.map(lambda a: a[::-1], suf_rev)   # suf[k] = [k..end]
        block = jax.tree.map(lambda a: a[0], suf)        # whole-block composite
        # ---- 2. exchange block composites, fold later blocks + terminal ----
        gathered = jax.tree.map(
            lambda a: jax.lax.all_gather(a, "stage"), block)   # (D, ...)
        term = (jnp.zeros((nw, nw), dtype), jnp.zeros((nw, K), dtype),
                jnp.zeros((nw, nw), dtype), -pN, PN)
        carry = term
        for j in range(D - 1, -1, -1):
            comp_j = jax.tree.map(lambda a: a[j], gathered)
            cand = _combine(carry, comp_j)
            carry = jax.tree.map(
                lambda c_new, c_old: jnp.where(j > idx, c_new, c_old),
                cand, carry)
        # ---- 3. per-stage value functions at k+1 (gains use V_{k+1}) ----
        # suffix(k+1): shift local suffixes left, identity at the block end
        ident = _identity_elem(nw, K, dtype)
        suf_shift = jax.tree.map(
            lambda a, i: jnp.concatenate([a[1:], i[None]]), suf, ident)
        full = jax.vmap(lambda e: _combine(carry, e))(suf_shift)
        Vs = full[4]                       # (L, nw, nw)
        vs = -full[3]                      # (L, nw, K)
        # gains with ORIGINAL (A, B, S, R)
        BtV = jnp.swapaxes(Bs, -1, -2) @ Vs
        Sw = Rs + BtV @ Bs
        Kg = -jnp.linalg.solve(Sw, jnp.swapaxes(Ss, -1, -2) + BtV @ As)
        kf = -jnp.linalg.solve(
            Sw, jnp.swapaxes(Bs, -1, -2) @ vs + rs)      # (L, m, K)
        # ---- 4. forward rollout as distributed affine recurrence ----
        Acl = As + Bs @ Kg
        ts = Bs @ kf                                      # (L, nw, K)

        def compose_aff(carry, inp):
            Mc, tc = carry
            Mk, tk = inp
            return (Mk @ Mc, Mk @ tc + tk), None

        (Mb, tb), _ = jax.lax.scan(compose_aff,
                                   (jnp.eye(nw, dtype=dtype),
                                    jnp.zeros((nw, K), dtype)), (Acl, ts))
        Mg = jax.lax.all_gather(Mb, "stage")
        tg = jax.lax.all_gather(tb, "stage")
        w_in = jnp.zeros((nw, K), dtype)                  # w_0 = 0
        wN = jnp.zeros((nw, K), dtype)
        for j in range(D):
            w_in = jnp.where(j < idx, Mg[j] @ w_in + tg[j], w_in)
            wN = Mg[j] @ wN + tg[j]    # full fold = final state w_N

        def roll(w, inp):
            Kk, kfk, Ak, Bk = inp
            c = Kk @ w + kfk
            return Ak @ w + Bk @ c, (w, c)

        _, (Wl, Cl) = jax.lax.scan(roll, w_in, (Kg, kf, As, Bs))
        return jnp.concatenate([Wl, Cl], axis=1), wN

    WC, wN = sweep(As, Bs, Qs, Ss, Rs, qs, rs, PN, pN)
    W = jnp.concatenate([WC[:, :nw, :], wN[None]], axis=0)
    C = WC[:, nw:, :]
    return W, C
