"""Fused Pallas IPM: the entire Mehrotra predictor-corrector loop in VMEM.

The XLA-composed IPM (ops/ipm.py) runs each tiny step as its own fused op,
bouncing (B, nz)/(B, mI) intermediates through HBM between micro-kernels —
measured HBM-bound on TPU v5e. This kernel keeps all state for a TILE of
problems resident in VMEM across every iteration:

  - batch-in-lanes layout: vectors are (rows, TILE) with the problem index in
    the 128-wide lane dimension, so per-problem scalar recurrences (Cholesky
    columns, triangular solves, step-length minima) are full-width VPU ops;
  - matrices live in a 2-D block layout (nz, nz*TILE): column j of problem t
    sits at [:, j*TILE + t]. Column extraction is a static 2-D slice, row
    extraction is a reshape, and the Cholesky rank-1 update is a broadcasted
    2-D multiply — no 3-D ops, no scatter (Mosaic lowers all of it);
  - the KKT normal matrices for all TILE problems come from nz small MXU
    matmuls: column block j of M is G' (d * G[:, j]) — same FLOPs as the
    single (nz^2, mI) "W" operand formulation but without its 2 MB VMEM
    residency (the 16 MB scoped limit is tight at mI ~ 800, tile 128);
  - padding: nz to sublane multiples (identity diagonal), mI to lane multiples
    (h = +BIG rows never activate).

Shared (H, G) across the batch — exactly the MPC setting, where every scenario
solves the same-structure QP with different (g, h).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BIG = 1e6


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_BUDGET = 60 << 20  # grant ceiling (~2x headroom under 128M physical)


def _qp_vmem_grant(nz_p: int, mD_p: int, mS_p: int, T: int,
                   warm_io: int = 0) -> int:
    """vmem_limit_bytes for the packed-H Mehrotra kernel, 0 when the default
    16M scoped policy suffices. Per-lane element model FIT on two exact
    Mosaic stack-OOM reports (r5): the DMS shape (nz_p=104, T=128,
    mD_p=1024) needed 47.12M and the fmincon shape at tile 512 (nz_p=24,
    mD_p=256) 16.74M -> need/lane ~= 6.8 n2 + 18 mQ + 4 nz_p (the n2 term
    covers the H double buffer + the column lists live across the
    factorization; the mQ term the ~9 double-buffered constraint-space
    vectors). The model deliberately OVER-estimates after the r5 live-set
    shrink (H loads deferred through a getter, Jacobi scaling folded into
    the chol first-touch) — a high limit is safe, a low one is an OOM.
    Grant = need + 6M (the ops/pallas_chol._vlim_raise mechanism), capped
    by the 60M budget. The production fmincon shape (nz_p=24, T=256)
    models at 8.8M -> grant 0, unchanged behavior."""
    n2 = nz_p * nz_p
    mQ = mD_p + mS_p
    # warm_io counts enabled warm-state directions (in, out) — each adds two
    # double-buffered (mQ, T) blocks (s and z)
    need = int((6.8 * n2 + 4 * nz_p + (18 + 4 * warm_io) * mQ) * T * 4) \
        + (2 * nz_p * mD_p + mS_p * 128) * 4
    if need <= (14 << 20):
        return 0
    grant = need + (6 << 20)
    if grant > _VMEM_BUDGET:
        raise ValueError(
            f"pallas IPM kernel scoped-VMEM need {need / 2**20:.1f}M "
            f"(nz_p={nz_p}, tile={T}) exceeds the {_VMEM_BUDGET >> 20}M "
            "grant budget; use the XLA-composed backend at this shape")
    return grant


def analyze_constraint_rows(G: np.ndarray) -> dict:
    """Host-side constraint-row analysis shared by the packed-H kernel
    builder and the roofline FLOP model.

    - Dominant 2-column-support group (>= 64 rows sharing one {ca, cb}
      support — e.g. the 616-row terminal block touching only {c_0, theta})
      leaves the MXU operands entirely: its G' diag(d) G contribution is a
      2x2 corner from three VPU sublane reductions (r4 split-G).
    - Remaining dense rows sorted by max-nonzero column (r5 causal-suffix):
      column j of G' diag(d) G only receives rows whose support reaches j
      (support ⊆ [0, maxcol]), and after the sort those rows form a SUFFIX
      — the per-column KKT matmul contracts over rows [lo128[j]:] instead
      of all of them (128-aligned for Mosaic lane slicing). Exact math: the
      skipped rows are structural zeros in column j. Measured structure:
      DMS N=100 keeps 0.56 of the dense MACs (the reference's casadi stack
      exposes the causality — state row k touches controls 0..k-1 only,
      DMS_LBMPC_casadi.m:252-315).
    """
    Gn = np.asarray(G, np.float32)
    mI, nz = Gn.shape
    supports = [np.nonzero(Gn[i])[0] for i in range(mI)]
    groups: dict = {}
    for i, s in enumerate(supports):
        if len(s) <= 2 and len(s) > 0:
            key = (int(s[0]), int(s[-1]))
            groups.setdefault(key, []).append(i)
    best = max(groups.items(), key=lambda kv: len(kv[1]), default=None)
    if best is not None and len(best[1]) >= 64 and best[0][0] != best[0][1]:
        (ca, cb), sp_rows = best
        sp_rows = list(sp_rows)
    else:
        ca = cb = 0
        sp_rows = []
    d_rows = [i for i in range(mI) if i not in set(sp_rows)]
    maxc = {i: (int(supports[i][-1]) if len(supports[i]) else 0)
            for i in d_rows}
    d_rows = sorted(d_rows, key=lambda i: maxc[i])
    mD, mS = len(d_rows), len(sp_rows)
    mD_p = _round_up(max(mD, 1), 128)
    mS_p = _round_up(mS, 128) if mS else 0
    maxc_sorted = np.asarray([maxc[i] for i in d_rows], np.int64)
    lo128 = [int(np.searchsorted(maxc_sorted, j)) // 128 * 128
             for j in range(nz)]
    return dict(ca=ca, cb=cb, sp_rows=sp_rows, d_rows=d_rows, mD=mD, mS=mS,
                mD_p=mD_p, mS_p=mS_p, lo128=lo128)


def assembly_mac_ratio(G: np.ndarray) -> float:
    """Actual/dense MAC ratio of the packed-H kernel's per-iteration KKT
    assembly: the kernel contracts nz_p x (mD_p - lo128[j]) per real column
    (padded columns skip the matmul; split-group rows cost 3 VPU reductions,
    counted as 9 mS FLOP-equivalents). Feeds the bench roofline so the
    analytic MFU is not flattered by MACs the kernel no longer executes."""
    r = analyze_constraint_rows(G)
    mI, nz = np.asarray(G).shape
    nz_p = _round_up(nz, 8)
    dense = 2.0 * mI * nz * nz
    actual = sum(2.0 * nz_p * (r["mD_p"] - lo) for lo in r["lo128"]) \
        + 9.0 * r["mS"]
    return float(actual / dense)


def build_pallas_qp_solver_h(
    G: np.ndarray,
    iters: int = 16,
    tile: int = 256,
    tau: float = 0.995,
    d_cap: float = 1e6,
    interpret: bool = False,
    mcols_bf16: bool = False,
    warm_in: bool = False,
    warm_out: bool = False,
    warm_eps: float = 1e-5,
):
    """Per-problem-Hessian full-IPM kernel: the whole Mehrotra loop in VMEM.

    The SQP's QP subproblems carry a different Gauss-Newton Hessian per lane
    (H_b = 2 J'J), which the shared-H kernel below cannot serve; this variant
    streams a packed H block per tile and keeps everything else resident.
    Semantics mirror ops/ipm_fused.build_fused_qp_solver exactly — d_cap,
    1e-6 ridge, symmetric Jacobi equilibration of every KKT normal matrix,
    tau, and the convergence test — so lane-level convergence behavior
    matches the validated XLA-composed path (differences are op-ordering
    roundoff only; equality tested in tests/test_pallas_ipm.py). No Farkas
    certificates (the SQP hot path consumes x and mu only; use the XLA
    backend when infeasibility detection is needed).

    r4 split-G (VERDICT item 2 / speed-of-light): constraint rows sharing a
    2-column support — the 616-row terminal block + tightened rows touch
    only {c_0, theta} (controllers/condensed.py) — leave the MXU operands
    entirely: their G' diag(d) G contribution is a 2x2 corner computed by
    three VPU sublane reductions, and every per-iteration matmul contracts
    over the ~4x smaller dense remainder. Same math (summation order only).

    mcols_bf16: cast the KKT-assembly matmul operands to bfloat16 with f32
    accumulation (one MXU pass instead of f32-HIGHEST's six). Gated by the
    accuracy audit — see scripts/accuracy_audit.py results in bench.py.

    Returns raw(H_b (B, nz, nz) f32, g (B, nz) f32, h (B, mI) f32)
    -> (x (B, nz), mu (B,)); unjitted and context-free for embedding in an
    outer jitted scan (the caller owns matmul precision, like
    ipm_fused.raw_with_H).

    warm_out appends the final interior state to the return — an opaque
    tuple of kernel-layout (rows, Bp) f32 arrays ((s_d, z_d[, s_sp, z_sp]))
    — and warm_in accepts it as `warm=` on raw/raw_packed, flooring every
    entry at warm_eps (strict interiority) and re-masking padded rows
    (r5 IPM-iteration-cut lever, docs/ROADMAP.md #1): in the SQP, GN iter 0
    accepts alpha=1 on 100% of lanes (scripts/alpha_stats.py), so the next
    QP's constraint rhs is h2 = h1 - G d1 = s1 — the previous QP's final
    slack IS an exactly primal-feasible start at x = 0, and the dual z1
    carries the (barely changing) active set. A warm-started Mehrotra then
    needs far fewer iterations than the cold 8 of the r3-adopted (16, 8)
    schedule; measured on-chip in scripts/bench_pallas_sqp.py mode "warm".
    """
    nz = G.shape[1]
    mI = G.shape[0]
    nz_p = _round_up(nz, 8)
    T = tile

    rowan = analyze_constraint_rows(G)
    ca, cb = rowan["ca"], rowan["cb"]
    sp_rows, d_rows = rowan["sp_rows"], rowan["d_rows"]
    mD, mS = rowan["mD"], rowan["mS"]
    mD_p, mS_p = rowan["mD_p"], rowan["mS_p"]
    lo128 = rowan["lo128"]
    Gn = np.asarray(G, np.float32)
    perm = np.asarray(d_rows + sp_rows, np.int64)

    Gp = np.zeros((mD_p, nz_p), np.float32)
    Gp[:mD, :nz] = Gn[d_rows]
    GT = Gp.T.copy()
    Gp_j = jnp.asarray(Gp)
    GT_j = jnp.asarray(GT)
    if mS:
        SP = np.zeros((mS_p, 128), np.float32)
        SP[:mS, 0] = Gn[sp_rows, ca]
        SP[:mS, 1] = Gn[sp_rows, cb]
        SP_j = jnp.asarray(SP)

    def mxu(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def mxu_m(a, b):
        if not mcols_bf16:
            return mxu(a, b)
        return jax.lax.dot_general(
            a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    def kernel(H_ref, g_ref, h_ref, GT_ref, G_ref, *rest):
        with jax.enable_x64(False):
            _kernel_body(H_ref, g_ref, h_ref, GT_ref, G_ref, *rest)

    def _kernel_body(H_ref, g_ref, h_ref, GT_ref, G_ref, *rest):
        # constraint-space state lives SPLIT: dense rows (MXU operands) and
        # the 2-column sparse block (VPU broadcasts/reductions) never meet in
        # one array — no in-kernel concat (Mosaic relayout trap, r3 notes)
        # ref order: inputs (SP, hs | warm s0/z0 dense | warm s0/z0 sparse),
        # outputs (x, mu | warm s/z dense | warm s/z sparse), scratch
        rest = list(rest)
        if mS:
            SP_ref, hs_ref = rest[:2]
            del rest[:2]
            ga = SP_ref[:, 0:1]
            gb = SP_ref[:, 1:2]
            hs = hs_ref[:]
            rows_s = jax.lax.broadcasted_iota(jnp.int32, (mS_p, 1), 0)
            act_s = jnp.where(rows_s < jnp.int32(mS), 1.0,
                              0.0).astype(jnp.float32)
        if warm_in:
            s0d_ref, z0d_ref = rest[:2]
            del rest[:2]
            if mS:
                s0s_ref, z0s_ref = rest[:2]
                del rest[:2]
        x_out, mu_out = rest[:2]
        del rest[:2]
        if warm_out:
            sd_out, zd_out = rest[:2]
            del rest[:2]
            if mS:
                ss_out, zs_out = rest[:2]
                del rest[:2]
        if mS:
            x_s, s_s, z_s, ss_s, zs_s = rest
        else:
            x_s, s_s, z_s = rest
        g = g_ref[:]
        h = h_ref[:]
        GTm = GT_ref[:]
        Gm = G_ref[:]
        # lazy H column getter (r5 live-set shrink): the H block is VMEM-
        # resident as an input block; re-slicing the ref at each use keeps
        # at most one column materialized instead of a full nz_p-column list
        Hcol = lambda j: H_ref[:, j * T:(j + 1) * T]

        rows_n = jax.lax.broadcasted_iota(jnp.int32, (nz_p, 1), 0)
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (mD_p, 1), 0)
        act = jnp.where(rows_m < jnp.int32(mD), 1.0, 0.0).astype(jnp.float32)

        x_s[:] = jnp.zeros((nz_p, T), jnp.float32)
        if warm_in:
            # floored previous-QP interior state; padded rows: z = 0 forever
            s_s[:] = jnp.maximum(s0d_ref[:], jnp.float32(warm_eps))
            z_s[:] = jnp.maximum(z0d_ref[:], jnp.float32(warm_eps)) * act
            if mS:
                ss_s[:] = jnp.maximum(s0s_ref[:], jnp.float32(warm_eps))
                zs_s[:] = jnp.maximum(z0s_ref[:],
                                      jnp.float32(warm_eps)) * act_s
        else:
            s_s[:] = jnp.maximum(h, 1.0)
            z_s[:] = jnp.broadcast_to(act, (mD_p, T))
            if mS:
                ss_s[:] = jnp.maximum(hs, 1.0)
                zs_s[:] = jnp.broadcast_to(act_s, (mS_p, T))

        def Hx(x):
            acc = Hcol(0) * x[0:1, :]
            for j in range(1, nz_p):
                acc = acc + Hcol(j) * x[j:j + 1, :]
            return acc

        def Gmul_sp(x):
            return ga * x[ca:ca + 1, :] + gb * x[cb:cb + 1, :]

        def GT_sp_add(acc, vs):
            """acc += sparse-block rows' contribution to G' v."""
            ra = jnp.sum(ga * vs, axis=0, keepdims=True)
            rb = jnp.sum(gb * vs, axis=0, keepdims=True)
            return (acc + jnp.where(rows_n == ca, ra, 0.0)
                    + jnp.where(rows_n == cb, rb, 0.0))

        def chol_cols(Mcols, sc=None):
            """Left-looking Cholesky; sc folds the Jacobi equilibration into
            each column's FIRST touch (bit-identical to pre-scaling the
            whole list — scaling happens before any use of the column — but
            Mcols[j] dies as Ls[j] is born, halving peak column liveness;
            r5 live-set shrink)."""
            Ls = []
            for j in range(nz_p):
                acc = Mcols[j]
                if sc is not None:
                    acc = acc * sc * sc[j:j + 1, :]
                for k in range(j):
                    acc = acc - Ls[k][j:j + 1, :] * Ls[k]
                djj = jnp.sqrt(jnp.maximum(acc[j:j + 1, :], 1e-30))
                Ls.append(jnp.where(rows_n >= j, acc / djj, 0.0))
            return Ls

        def tri_lower(Ls, b):
            y = jnp.zeros_like(b)
            for j in range(nz_p):
                yj = b[j:j + 1, :] / Ls[j][j:j + 1, :]
                y = y + jnp.where(rows_n == j, yj, 0.0)
                b = b - jnp.where(rows_n > j, Ls[j] * yj, 0.0)
            return y

        def tri_upper_t(Ls, y):
            # reduction form (r4): x_j = (y_j - dot(col_j, x_partial)) / L_jj
            # — one masked sublane reduce replaces the O(nz_p) inner loop
            # (rows < j of Ls[j] and unset x rows are exactly zero)
            x = jnp.zeros_like(y)
            for idx in range(nz_p):
                j = nz_p - 1 - idx
                dotj = jnp.sum(Ls[j] * x, axis=0, keepdims=True)
                xj = (y[j:j + 1, :] - dotj) / Ls[j][j:j + 1, :]
                x = x + jnp.where(rows_n == j, xj, 0.0)
            return x

        def body(it, _):
            x = x_s[:]
            s = s_s[:]
            z = z_s[:]
            if mS:
                s2 = ss_s[:]
                z2 = zs_s[:]
            rd = Hx(x) + g + mxu(GTm, z)
            if mS:
                rd = GT_sp_add(rd, z2)
            Gx = mxu(Gm, x)
            rp = (Gx + s - h) * act
            s_safe = jnp.maximum(s, 1e-25)
            d = jnp.minimum(z / s_safe, d_cap) * act
            if mS:
                Gx2 = Gmul_sp(x)
                rp2 = (Gx2 + s2 - hs) * act_s
                s2_safe = jnp.maximum(s2, 1e-25)
                d2 = jnp.minimum(z2 / s2_safe, d_cap) * act_s
                saa = jnp.sum(d2 * ga * ga, axis=0, keepdims=True)
                sab = jnp.sum(d2 * ga * gb, axis=0, keepdims=True)
                sbb = jnp.sum(d2 * gb * gb, axis=0, keepdims=True)

            # KKT normal matrix per column + ridge, then Jacobi equilibration
            # (ipm_fused `scale=True`: unit diagonal restores the digits the
            # d-weighted diagonal's dynamic range costs in f32). Causal
            # suffix: column j contracts over dense rows [lo128[j]:] only
            # (the rest are structural zeros — see the builder note); padded
            # columns (j >= nz) have zero G columns and skip the matmul.
            Mcols = []
            for j in range(nz_p):
                if j >= nz:
                    Mj = Hcol(j)
                else:
                    lo = lo128[j]
                    Mj = mxu_m(GTm[:, lo:],
                               d[lo:, :] * Gm[lo:, j:j + 1]) + Hcol(j)
                Mj = Mj + jnp.where(rows_n == j, 1e-6, 0.0)
                if mS and j == ca:
                    Mj = (Mj + jnp.where(rows_n == ca, saa, 0.0)
                          + jnp.where(rows_n == cb, sab, 0.0))
                elif mS and j == cb:
                    Mj = (Mj + jnp.where(rows_n == ca, sab, 0.0)
                          + jnp.where(rows_n == cb, sbb, 0.0))
                Mcols.append(Mj)
            dg = jnp.zeros((nz_p, T), jnp.float32)
            for j in range(nz_p):
                dg = dg + jnp.where(rows_n == j, Mcols[j][j:j + 1, :], 0.0)
            sc = jax.lax.rsqrt(jnp.maximum(dg, 1e-30))
            Ls = chol_cols(Mcols, sc)

            def kkt(rc, rc2):
                t = (d * rp - rc / s_safe) * act
                rhs = rd + mxu(GTm, t)
                if mS:
                    t2 = (d2 * rp2 - rc2 / s2_safe) * act_s
                    rhs = GT_sp_add(rhs, t2)
                dx = tri_upper_t(Ls, tri_lower(Ls, -rhs * sc)) * sc
                Gdx = mxu(Gm, dx)
                dz = (d * (rp + Gdx) - rc / s_safe) * act
                ds = (-rp - Gdx) * act
                if mS:
                    Gdx2 = Gmul_sp(dx)
                    dz2 = (d2 * (rp2 + Gdx2) - rc2 / s2_safe) * act_s
                    ds2 = (-rp2 - Gdx2) * act_s
                else:
                    dz2 = ds2 = None
                return dx, ds, dz, ds2, dz2

            def ratio_min(v, dv):
                ratio = jnp.where(dv < 0.0, -v / jnp.where(dv < 0.0, dv, -1.0),
                                  BIG)
                return jnp.min(ratio, axis=0, keepdims=True)

            def steplen(v, dv, v2, dv2, t_):
                r = ratio_min(v, dv)
                if mS:
                    r = jnp.minimum(r, ratio_min(v2, dv2))
                return jnp.minimum(1.0, t_ * r)

            def dot_sz(a, b, a2, b2):
                acc = jnp.sum(a * b * act, axis=0, keepdims=True)
                if mS:
                    acc = acc + jnp.sum(a2 * b2 * act_s, axis=0, keepdims=True)
                return acc / float(mI)

            if not mS:
                s2 = z2 = None
            mu = dot_sz(s, z, s2, z2)
            rc_aff = s * z * act
            rc2_aff = s2 * z2 * act_s if mS else None
            dxa, dsa, dza, ds2a, dz2a = kkt(rc_aff, rc2_aff)
            ap = steplen(s, dsa, s2, ds2a, 1.0)
            ad = steplen(z, dza, z2, dz2a, 1.0)
            mu_aff = dot_sz(s + ap * dsa, z + ad * dza,
                            s2 + ap * ds2a if mS else None,
                            z2 + ad * dz2a if mS else None)
            sigma = (mu_aff / jnp.maximum(mu, 1e-25)) ** 3
            rc = (s * z + dsa * dza - sigma * mu) * act
            rc2 = ((s2 * z2 + ds2a * dz2a - sigma * mu) * act_s
                   if mS else None)
            dx, ds, dz, ds2, dz2 = kkt(rc, rc2)
            ap = steplen(s, ds, s2, ds2, tau)
            ad = steplen(z, dz, z2, dz2, tau)
            x_s[:] = x + ap * dx
            s_s[:] = s + ap * ds
            z_s[:] = z + ad * dz
            if mS:
                ss_s[:] = s2 + ap * ds2
                zs_s[:] = z2 + ad * dz2
            return 0

        jax.lax.fori_loop(0, iters, body, 0)
        x_out[:] = x_s[:]
        mu_fin = jnp.sum(s_s[:] * z_s[:] * act, axis=0, keepdims=True)
        if mS:
            mu_fin = mu_fin + jnp.sum(ss_s[:] * zs_s[:] * act_s, axis=0,
                                      keepdims=True)
        mu_out[:] = mu_fin / float(mI)
        if warm_out:
            sd_out[:] = s_s[:]
            zd_out[:] = z_s[:]
            if mS:
                ss_out[:] = ss_s[:]
                zs_out[:] = zs_s[:]

    def raw(H_b: jax.Array, g: jax.Array, h: jax.Array, warm=None):
        with jax.enable_x64(False):
            B = g.shape[0]
            pad = (-B) % T
            if pad:
                g = jnp.concatenate(
                    [g, jnp.zeros((pad, nz), jnp.float32)])
                h = jnp.concatenate(
                    [h, jnp.ones((pad, mI), jnp.float32)])
                eye_pad = jnp.broadcast_to(
                    jnp.eye(nz, dtype=jnp.float32)[None], (pad, nz, nz))
                H_b = jnp.concatenate([H_b.astype(jnp.float32), eye_pad])
            Bp = B + pad
            # pack H: [tile, i, j*T + t] = H[tile*T + t, i, j], pad diag = 1
            Hp = jnp.zeros((Bp, nz_p, nz_p), jnp.float32)
            Hp = Hp.at[:, :nz, :nz].set(H_b.astype(jnp.float32))
            di = jnp.arange(nz, nz_p)
            Hp = Hp.at[:, di, di].set(1.0)
            # 2D packed layout: [i, tile*(nz_p*T) + j*T + t] = H[tile*T+t, i, j]
            Hpk = (Hp.transpose(1, 2, 0)
                   .reshape(nz_p, nz_p, Bp // T, T)
                   .transpose(0, 2, 1, 3)
                   .reshape(nz_p, (Bp // T) * nz_p * T))
            g_t = jnp.zeros((nz_p, Bp), jnp.float32).at[:nz, :].set(
                g.astype(jnp.float32).T)
            outs = _call_packed(Hpk, g_t, _split_h(h, Bp, h.shape[0]), Bp,
                                warm=warm)
            return _finish(outs, B)

    def _finish(outs, B):
        x_t, mu_t = outs[0], outs[1]
        if warm_out:
            return x_t[:nz, :B].T, mu_t[0, :B], tuple(outs[2:])
        return x_t[:nz, :B].T, mu_t[0, :B]

    d_rows_np = np.asarray(d_rows, np.int64)
    sp_rows_np = np.asarray(sp_rows, np.int64)

    def _split_h(h, Bp, B):
        """Permute h into the (dense, sparse) row layout; pad rows BIG."""
        h32 = h.astype(jnp.float32)
        h_d = jnp.full((mD_p, Bp), BIG, jnp.float32).at[:mD, :B].set(
            h32[:, d_rows_np].T)
        if not mS:
            return (h_d,)
        h_sp = jnp.full((mS_p, Bp), BIG, jnp.float32).at[:mS, :B].set(
            h32[:, sp_rows_np].T)
        return (h_d, h_sp)

    _warm_rows = [mD_p, mD_p] + ([mS_p, mS_p] if mS else [])

    def _call_packed(Hpk, g_t, h_parts, Bp, warm=None):
        lane = lambda rows: pl.BlockSpec((rows, T), lambda i: (0, i),
                                         memory_space=pltpu.VMEM)
        const = lambda r, c: pl.BlockSpec((r, c), lambda i: (0, 0),
                                          memory_space=pltpu.VMEM)
        in_specs = [
            pl.BlockSpec((nz_p, nz_p * T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            lane(nz_p), lane(mD_p), const(nz_p, mD_p), const(mD_p, nz_p),
        ]
        operands = [Hpk, g_t, h_parts[0], GT_j, Gp_j]
        scratch = [pltpu.VMEM((nz_p, T), jnp.float32),
                   pltpu.VMEM((mD_p, T), jnp.float32),
                   pltpu.VMEM((mD_p, T), jnp.float32)]
        if mS:
            in_specs += [const(mS_p, 128), lane(mS_p)]
            operands += [SP_j, h_parts[1]]
            scratch += [pltpu.VMEM((mS_p, T), jnp.float32),
                        pltpu.VMEM((mS_p, T), jnp.float32)]
        if warm_in:
            assert warm is not None and len(warm) == len(_warm_rows), \
                "warm_in solver needs the previous QP's warm-state tuple"
            for arr, rows in zip(warm, _warm_rows):
                assert arr.shape == (rows, Bp), (arr.shape, rows, Bp)
                in_specs.append(lane(rows))
                operands.append(arr)
        out_specs = [lane(nz_p), lane(1)]
        out_shape = [
            jax.ShapeDtypeStruct((nz_p, Bp), jnp.float32),
            jax.ShapeDtypeStruct((1, Bp), jnp.float32),
        ]
        if warm_out:
            for rows in _warm_rows:
                out_specs.append(lane(rows))
                out_shape.append(jax.ShapeDtypeStruct((rows, Bp),
                                                      jnp.float32))
        vlim = _qp_vmem_grant(nz_p, mD_p, mS_p, T,
                              warm_io=int(warm_in) + int(warm_out))
        outs = pl.pallas_call(
            kernel,
            grid=(Bp // T,),
            compiler_params=(pltpu.CompilerParams(vmem_limit_bytes=vlim)
                             if vlim else None),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            scratch_shapes=scratch,
            interpret=interpret,
        )(*operands)
        return outs

    def raw_packed(H_pk: jax.Array, g: jax.Array, h: jax.Array, warm=None):
        """Like raw(), but H arrives already in the packed 2D per-tile
        layout ((nz_p, tiles*nz_p*T)) that ops/pallas_gn's kernel emits —
        the two kernels hand off with zero XLA-side repacking. When the
        batch is not a tile multiple (e.g. the compacted repair's K lanes),
        g/h are padded to the H_pk lane count; the GN kernel's padded lanes
        carry the benign PD constant Hessian, and padded h rows never
        activate."""
        with jax.enable_x64(False):
            B = g.shape[0]
            Bp = (H_pk.shape[1] // (nz_p * T)) * T
            assert Bp >= B and Bp % T == 0, (B, Bp, T)
            g_t = jnp.zeros((nz_p, Bp), jnp.float32).at[:nz, :B].set(
                g.astype(jnp.float32).T)
            outs = _call_packed(H_pk, g_t, _split_h(h, Bp, B), Bp, warm=warm)
            return _finish(outs, B)

    def cold_state(h: jax.Array, Bp: int | None = None):
        """Kernel-layout warm-state tuple equal to the cold initialization
        (s = max(h, 1) in the split/permuted row layout, z = 1 on active
        rows): feeding it to a warm_in solver reproduces the cold solver
        bit-exactly (the warm path computes max(s, eps) and
        max(z, eps) * act, both identities here). Lets a receding-horizon
        loop carry ONE warm-capable QP variant with a well-defined step-0
        state instead of tracing separate cold/warm branches."""
        with jax.enable_x64(False):
            B = h.shape[0]
            Bp = Bp or B + ((-B) % T)
            parts = _split_h(h, Bp, B)
            st = [jnp.maximum(parts[0], 1.0),
                  jnp.where(jnp.arange(mD_p)[:, None] < mD, 1.0, 0.0)
                  * jnp.ones((mD_p, Bp), jnp.float32)]
            if mS:
                st += [jnp.maximum(parts[1], 1.0),
                       jnp.where(jnp.arange(mS_p)[:, None] < mS, 1.0, 0.0)
                       * jnp.ones((mS_p, Bp), jnp.float32)]
            return tuple(st)

    raw.raw_packed = raw_packed
    raw.cold_state = cold_state
    return raw


def build_pallas_qp_solver(
    H: np.ndarray,
    G: np.ndarray,
    iters: int = 20,
    tile: int = 128,
    tau: float = 0.995,
    interpret: bool = False,
):
    """Returns solve(g (B, nz), h (B, mI)) -> (x (B, nz), converged (B,)).

    H (nz, nz) and G (mI, nz) are fixed at build time (shared by the batch);
    per-problem data is (g, h). float32 compute, HIGHEST matmul precision.
    """
    nz = H.shape[0]
    mI = G.shape[0]
    nz_p = _round_up(nz, 8)
    mI_p = _round_up(mI, 128)
    n2 = nz_p * nz_p

    Hp = np.zeros((nz_p, nz_p), np.float32)
    Hp[:nz, :nz] = H
    for i in range(nz, nz_p):
        Hp[i, i] = 1.0
    Gp = np.zeros((mI_p, nz_p), np.float32)
    Gp[:mI, :nz] = G
    GT = Gp.T.copy()

    def mxu(a, b):
        return jax.lax.dot_general(
            a, b, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )

    def kernel(g_ref, h_ref, GT_ref, G_ref, H_ref,
               x_out, conv_out, x_s, s_s, z_s):
        T = tile
        g = g_ref[:]
        h = h_ref[:]
        GTm = GT_ref[:]
        Gm = G_ref[:]
        Hm = H_ref[:]

        rows_n = jax.lax.broadcasted_iota(jnp.int32, (nz_p, 1), 0)
        rows_m = jax.lax.broadcasted_iota(jnp.int32, (mI_p, 1), 0)
        act = jnp.where(rows_m < jnp.int32(mI), 1.0, 0.0).astype(jnp.float32)

        x_s[:] = jnp.zeros((nz_p, T), jnp.float32)
        s_s[:] = jnp.maximum(h, 1.0)
        z_s[:] = jnp.ones((mI_p, T), jnp.float32)

        # ---- small dense algebra on a static LIST of (nz_p, T) columns ----
        # Left-looking formulations: every step is a static slice + broadcast
        # (no concats, no reshapes — those force cross-lane relayouts that
        # dominated the first on-chip version's runtime).

        def chol_cols(Mcols):
            """Left-looking Cholesky; Mcols/result are lists of (nz_p, T)."""
            Ls = []
            for j in range(nz_p):
                acc = Mcols[j]
                for k in range(j):
                    coef = Ls[k][j : j + 1, :]                  # L[j, k] per lane
                    acc = acc - coef * Ls[k]
                djj = jnp.sqrt(jnp.maximum(acc[j : j + 1, :], 1e-30))
                Ls.append(jnp.where(rows_n >= j, acc / djj, 0.0))
            return Ls

        def tri_lower(Ls, b):
            """Solve L y = b given column list; y as (nz_p, T) via masked adds."""
            y = jnp.zeros_like(b)
            for j in range(nz_p):
                yj = b[j : j + 1, :] / Ls[j][j : j + 1, :]
                y = y + jnp.where(rows_n == j, yj, 0.0)
                b = b - jnp.where(rows_n > j, Ls[j] * yj, 0.0)
            return y

        def tri_upper_t(Ls, y):
            """Solve L^T x = y: x_j = (y_j - sum_{k>j} L[k,j] x_k) / L[j,j];
            L[k, j] is a row slice of column j — still column-local."""
            xs = [None] * nz_p
            for idx in range(nz_p):
                j = nz_p - 1 - idx
                acc = y[j : j + 1, :]
                for k in range(j + 1, nz_p):
                    acc = acc - Ls[j][k : k + 1, :] * xs[k]
                xs[j] = acc / Ls[j][j : j + 1, :]
            x = jnp.zeros_like(y)
            for j in range(nz_p):
                x = x + jnp.where(rows_n == j, xs[j], 0.0)
            return x

        def body(it, _):
            x = x_s[:]
            s = s_s[:]
            z = z_s[:]
            rd = mxu(Hm, x) + g + mxu(GTm, z)
            Gx = mxu(Gm, x)
            rp = Gx + s - h
            s_safe = jnp.maximum(s, 1e-25)
            d = jnp.minimum(z / s_safe, 1e7)
            # M column j = G' (d * G[:, j]) + H[:, j] + reg e_j —
            # nz_p small matmuls; columns stay a static list (no big operand)
            Mcols = []
            for j in range(nz_p):
                gcol = Gm[:, j : j + 1]                          # (mI_p, 1)
                rhs_j = d * gcol                                 # (mI_p, T)
                Mj = mxu(GTm, rhs_j) + Hm[:, j : j + 1]
                Mj = Mj + jnp.where(rows_n == j, 1e-6, 0.0)
                Mcols.append(Mj)
            Ls = chol_cols(Mcols)

            def kkt(rc):
                t = d * rp - rc / s_safe
                rhs = -(rd + mxu(GTm, t))
                dx = tri_upper_t(Ls, tri_lower(Ls, rhs))
                Gdx = mxu(Gm, dx)
                dz = d * (rp + Gdx) - rc / s_safe
                ds = -rp - Gdx
                return dx, ds, dz

            def steplen(v, dv, t_):
                ratio = jnp.where(dv < 0.0, -v / jnp.where(dv < 0.0, dv, -1.0), BIG)
                return jnp.minimum(1.0, t_ * jnp.min(ratio, axis=0, keepdims=True))

            mu = jnp.sum(s * z * act, axis=0, keepdims=True) / float(mI)
            dxa, dsa, dza = kkt(s * z)
            ap = steplen(s, dsa, 1.0)
            ad = steplen(z, dza, 1.0)
            mu_aff = jnp.sum((s + ap * dsa) * (z + ad * dza) * act,
                             axis=0, keepdims=True) / float(mI)
            sigma = (mu_aff / jnp.maximum(mu, 1e-25)) ** 3
            rc = s * z + dsa * dza - sigma * mu
            dx, ds, dz = kkt(rc)
            ap = steplen(s, ds, tau)
            ad = steplen(z, dz, tau)
            x_s[:] = x + ap * dx
            s_s[:] = s + ap * ds
            z_s[:] = z + ad * dz
            return 0

        jax.lax.fori_loop(0, iters, body, 0)
        x = x_s[:]
        s = s_s[:]
        z = z_s[:]
        x_out[:] = x
        rp = mxu(Gm, x) + s - h
        mu = jnp.sum(s * z * act, axis=0, keepdims=True) / float(mI)
        ok = jnp.logical_and(
            mu < 2e-4 * (1.0 + mu * float(mI)),
            jnp.max(jnp.abs(rp) * act, axis=0, keepdims=True) < 2e-3,
        )
        conv_out[:] = jnp.where(ok, 1.0, 0.0).astype(jnp.float32)

    def solve(g: jax.Array, h: jax.Array):
        # the kernel is pure f32/i32; a global jax_enable_x64 would let weak
        # 64-bit scalars leak into Mosaic (which hard-checks bitwidth <= 32)
        with jax.enable_x64(False):
            return _solve_inner(np.asarray(g, np.float32), np.asarray(h, np.float32))

    @jax.jit
    def _solve_inner(g: jax.Array, h: jax.Array):
        B = g.shape[0]
        assert B % tile == 0, f"batch {B} must be a multiple of tile {tile}"
        g_t = jnp.zeros((nz_p, B), jnp.float32).at[:nz, :].set(g.T.astype(jnp.float32))
        h_t = jnp.full((mI_p, B), BIG, jnp.float32).at[:mI, :].set(h.T.astype(jnp.float32))
        x_t, conv = pl.pallas_call(
            kernel,
            grid=(B // tile,),
            in_specs=[
                pl.BlockSpec((nz_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((mI_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((nz_p, mI_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((mI_p, nz_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((nz_p, nz_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((nz_p, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile), lambda i: (0, i), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((nz_p, B), jnp.float32),
                jax.ShapeDtypeStruct((1, B), jnp.float32),
            ],
            scratch_shapes=[
                pltpu.VMEM((nz_p, tile), jnp.float32),
                pltpu.VMEM((mI_p, tile), jnp.float32),
                pltpu.VMEM((mI_p, tile), jnp.float32),
            ],
            interpret=interpret,
        )(g_t, h_t, jnp.asarray(GT), jnp.asarray(Gp), jnp.asarray(Hp))
        return x_t[:nz, :].T, conv[0, :] > 0.5

    return solve
