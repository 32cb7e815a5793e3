"""Batch-level LBMPC SQP with the hybrid fused QP backend.

The vmapped SQP (controllers/sqp.py) dispatches every micro-op of every
iteration separately; this variant runs the whole Gauss-Newton loop at batch
level so the QP subproblems go through ops/ipm_fused (one MXU matmul for all
KKT matrices + Pallas factor/solve), and the rollout/Jacobian/line-search
phases are large batched XLA ops.

Same math as make_lbmpc_solver (learned-rollout Gauss-Newton cost, constant
nominal constraint stack, l1-merit Armijo ladder); float32.

Accuracy note (on-chip sweep, batch 2048 — scripts/sweep_fused_conv.py): with
the default d_cap=1e6 + Jacobi equilibration, 99.3% of lanes converge and the
worst lane sits 1.1e-2 in c0 from the vmapped backend (the historical
catastrophic 0.2-class mu-stall outliers were conditioning-driven and are gone
— see ops/ipm_fused.build_fused_qp_solver docstring). The returned `converged`
mask flags the residual mu-stalls; make_lbmpc_solver_hybrid re-solves flagged
lanes on the vmapped path when a 100%-converged batch is required.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbmpc_tpu.controllers.condensed import CondensedQP
from lbmpc_tpu.controllers.lbmpc import LBMPCWeights, make_residual_and_jac
from lbmpc_tpu.ops.ipm_fused import build_fused_qp_solver

_ALPHAS = (1.0, 0.5, 0.25, 0.125, 0.0625)


def make_lbmpc_solver_fused(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    family: str = "fmincon",
    delta: float = 0.01,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
    dx_ref: np.ndarray | None = None,
    sqp_iters: int = 3,
    ipm_iters: int = 20,
    tile: int = 512,
    rho: float = 1e4,
    interpret: bool = False,
    scale: bool = True,
    jac_mode: str = "manual",
    d_cap: float = 1e6,
    qp_kernel: str = "xla",
    alphas: tuple = _ALPHAS,
    qp_warm: bool = False,
    warm_eps: float = 1e-5,
):
    """Returns solve_batch(dx0 (B,n), windows (batched DataWindow), z_ws (B,nz))
    -> (z (B,nz), converged (B,)). float32 throughput path.

    jac_mode="manual" (default) uses the hand-derived Gauss-Newton Jacobian:
    the residual is linear in the rollout trajectory, so J comes from one
    sensitivity-propagation scan (S_{k+1} = A S_k + B du/dz + Jg dxi/dz, with
    the oracle Jacobian Jg in closed form — oracle.nw_estimate_and_jac)
    instead of nz jacfwd tangent passes each re-evaluating the q-point NW
    kernel. Same values to f32 roundoff; "jacfwd" keeps the autodiff path.

    qp_kernel="pallas" routes the QP subproblems through the full-Pallas
    Mehrotra kernel (ops/pallas_ipm.build_pallas_qp_solver_h — the entire
    IPM loop in one kernel launch, all state in VMEM) instead of the
    XLA-composed iteration with Pallas factor/solve (ops/ipm_fused).
    Identical semantics (same d_cap/ridge/equilibration/tau); tile is the
    Pallas lane-tile in both cases. qp_kernel="pallas_full" additionally
    moves the residual/Jacobian scan and the GN normal terms into
    ops/pallas_gn's kernel (phase budget: they cost 3.5 ms/step in XLA,
    nearly all op-issue overhead), handing the packed H straight to the QP
    kernel — two launches per GN iteration, no XLA-side J/H materialization
    (m=1; fmincon and casadi/DMS families).

    qp_warm=True (pallas/pallas_full only) threads the Mehrotra kernel's
    final interior (s, z) from each QP into the next as its starting point
    (ops/pallas_ipm warm_in/warm_out; r5 iteration-cut lever): GN iter 0
    accepts alpha=1 on 100% of lanes, so QP2's rhs h2 = h1 - G d1 equals
    QP1's final slack — an exactly primal-feasible start whose dual carries
    the active set. Pair with a shortened tail schedule, e.g. ipm_iters=
    (16, 4); measured in scripts/bench_pallas_sqp.py mode "warm"."""
    f32 = jnp.float32
    Gd = jnp.asarray(qp.G, f32)
    h0d = jnp.asarray(qp.h0, f32)
    Hpd = jnp.asarray(qp.Hp, f32)
    gn_cache: dict = {}
    import os as _os

    # Tile knobs (defaults = the r3-measured sweet spots at the N=20 shape;
    # the kernels now raise their own scoped-VMEM grants, so larger tiles
    # are A/B-able). The pallas_full GN->QP handoff is tile-blocked packed
    # H, so BOTH kernels must share one lane tile there — r5 measured: a
    # GN-512/QP-256 mismatch silently deinterleaves H (conv 0.0).
    _gn_cap = int(_os.environ.get("LBMPC_GN_TILE", "256"))
    _mono_cap = int(_os.environ.get("LBMPC_MONO_TILE", "128"))
    _qp_cap = int(_os.environ.get("LBMPC_QP_TILE", "256"))
    _pf_tile = min(tile, _gn_cap, _qp_cap)

    if qp_kernel in ("pallas_full", "pallas_mono"):
        if family not in ("fmincon", "casadi") or qp.m != 1:
            raise ValueError(f"qp_kernel={qp_kernel!r} covers the m=1 "
                             "fmincon/casadi configurations")

        def gn_raw_for(q_win: int, iters: int | None = None):
            # the GN kernel's BlockSpecs need the static window size; build
            # lazily at trace time (cached per (q, iters)).
            # ensure_compile_time_eval: the builder creates constant arrays,
            # and a build that happens under an active trace would cache
            # TRACERS, poisoning every later trace of the same solver
            # (caught by the sharded re-trace in dryrun stage 2).
            # iters != None = the mono kernel (GN + in-kernel Mehrotra loop,
            # one launch per GN iteration).
            key = (q_win, iters)
            if key not in gn_cache:
                from lbmpc_tpu.ops.pallas_gn import build_pallas_gn_kernel

                t_cap = _pf_tile if iters is None else min(tile, _mono_cap)
                with jax.ensure_compile_time_eval():
                    gn_cache[key] = build_pallas_gn_kernel(
                        qp, A, B, Ks, w, delta=delta, bandwidth=bandwidth,
                        ridge=ridge, dx_ref=dx_ref, q=q_win,
                        tile=t_cap, interpret=interpret, family=family,
                        ipm=(None if iters is None
                             else dict(iters=iters, d_cap=d_cap)))
            return gn_cache[key]

    # ipm_iters: int, or a per-GN-iteration tuple (like `alphas`) — e.g.
    # (16, 10) spends the full budget on the cold first QP and less on the
    # warm second
    ipm_sched = (tuple(ipm_iters) if isinstance(ipm_iters, (tuple, list))
                 else (int(ipm_iters),) * sqp_iters)
    if len(ipm_sched) < sqp_iters:
        ipm_sched = ipm_sched + (ipm_sched[-1],) * (sqp_iters - len(ipm_sched))

    if qp_kernel in ("pallas", "pallas_full"):
        import os

        from lbmpc_tpu.ops.pallas_ipm import build_pallas_qp_solver_h

        # LBMPC_MCOLS_BF16=1: KKT-assembly matmuls in bf16 with f32
        # accumulation (1 MXU pass vs f32-HIGHEST's 6) — A/B knob, gated on
        # the accuracy audit before any promotion
        # "pallas" (XLA GN) has no packed handoff -> QP tile independent;
        # "pallas_full" shares _pf_tile with the GN kernel (see knob note)
        _qp_tile = min(tile, _qp_cap) if qp_kernel == "pallas" else _pf_tile

        # per-position kernel variants: with qp_warm, QP i>0 consumes the
        # previous QP's interior state and QP i<last produces one
        def _wio(it_idx):
            return (bool(qp_warm) and it_idx > 0,
                    bool(qp_warm) and it_idx < sqp_iters - 1)

        _keys = {(ipm_sched[i],) + _wio(i) for i in range(sqp_iters)}
        if qp_warm:
            # receding-horizon loop mode (raw_qpwarm): every QP position is
            # warm-in AND warm-out so the interior state can be carried
            # across time steps (kernel compiles happen only if traced)
            _keys |= {(ipm_sched[i], True, True) for i in range(sqp_iters)}
        pallas_raws = {
            (it, win, wout): build_pallas_qp_solver_h(
                qp.G, iters=it, tile=_qp_tile, d_cap=d_cap,
                interpret=interpret,
                mcols_bf16=os.environ.get("LBMPC_MCOLS_BF16") == "1",
                warm_in=win, warm_out=wout, warm_eps=warm_eps)
            for (it, win, wout) in _keys}

        def _qp_call(it_idx, hb, warm_state, Hb=None, H_pk=None, gb=None,
                     loop=False):
            """Dispatch QP it_idx through its variant; returns
            (d, mu, warm_state_out)."""
            win, wout = (True, True) if loop else _wio(it_idx)
            slv = pallas_raws[(ipm_sched[it_idx], win, wout)]
            fn = slv.raw_packed if H_pk is not None else slv
            args = ((H_pk, gb, hb) if H_pk is not None else (Hb, gb, hb))
            kw2 = {"warm": warm_state} if win else {}
            out = fn(*args, **kw2)
            if wout:
                return out[0], out[1], out[2]
            return out[0], out[1], None
    else:
        fused_by_iters = {
            it: build_fused_qp_solver(None, qp.G, iters=it, tile=tile,
                                      interpret=interpret, scale=scale,
                                      d_cap=d_cap)
            for it in set(ipm_sched)}
    residual_single, res_jac_single = make_residual_and_jac(
        qp, A, B, Ks, w, family=family, delta=delta, bandwidth=bandwidth,
        ridge=ridge, dx_ref=dx_ref, dtype=f32)

    res_b = jax.vmap(residual_single, in_axes=(0, 0, 0))
    if jac_mode == "manual":
        resjac_b = jax.vmap(res_jac_single, in_axes=(0, 0, 0))
    else:
        jac_b = jax.vmap(jax.jacfwd(residual_single), in_axes=(0, 0, 0))
        resjac_b = lambda z, dx0, wins: (res_b(z, dx0, wins),
                                         jac_b(z, dx0, wins))

    @jax.jit
    def solve_batch(dx0, windows, z_ws):
        # no enable_x64(False): the fused QP's f64 refinement residual needs
        # real f64 (everything else is explicitly f32)
        with jax.default_matmul_precision("highest"):
            return _solve(dx0.astype(f32),
                          jax.tree.map(lambda a: a.astype(f32)
                                       if a.dtype != jnp.int32 else a, windows),
                          z_ws.astype(f32))

    def _solve(dx0, windows, z, qp_state=None):
        # qp_state != None => receding-horizon loop mode: every QP consumes
        # AND produces the kernel's interior (s, z) state, and the final
        # state is returned for the next time step's solve (use
        # init_qp_state for step 0 — cold-identical). pallas kernels only.
        loop = qp_state is not None
        if loop and qp_kernel not in ("pallas", "pallas_full"):
            raise ValueError("qp_state loop mode needs a pallas QP kernel")
        h = h0d[None, :] + dx0 @ Hpd.T

        def cost(zb):
            e = res_b(zb, dx0, windows)
            return jnp.sum(e * e, axis=1)

        def merit(zb):
            viol = jnp.sum(jnp.maximum(zb @ Gd.T - h, 0.0), axis=1)
            return cost(zb) + rho * viol, viol

        # NOTE (measured, 2026-08-21): batching the 6 merit evaluations into
        # one 6x-tiled rollout REGRESSES the headline 9.6 -> 12.6 ms/step:
        # inside one XLA program the sequential rollouts already pipeline
        # (no per-op dispatch to save), and the 6x window tiling only adds
        # HBM traffic. Keep the straightforward sequential ladder.
        # `alphas` may be a flat candidate tuple (same ladder every GN
        # iteration) or a tuple of per-iteration tuples — measured on-chip
        # (scripts/alpha_stats.py, bench distribution): GN iter 0 accepts
        # alpha=1 on 100.000% of lanes, so its ladder can be a single
        # guarded evaluation; iter 1 keeps fallbacks for its 13% tail.
        per_gn = isinstance(alphas[0], (tuple, list))
        mu_last = jnp.zeros((dx0.shape[0],), f32)
        warm_state = qp_state
        for it in range(sqp_iters):
            sched = tuple(alphas[min(it, len(alphas) - 1)]) if per_gn \
                else tuple(alphas)
            if qp_kernel == "pallas_mono":
                # ONE launch per GN iteration: GN phase + Mehrotra loop
                # fused (g rides along for the ladder's dirderiv)
                e, d, mu_last, gb = gn_raw_for(windows.X.shape[-2],
                                               ipm_sched[it])(
                    z, dx0, windows)
            elif qp_kernel == "pallas_full":
                e, H_pk, gb = gn_raw_for(windows.X.shape[-2])(
                    z, dx0, windows)
                d, mu_last, warm_state = _qp_call(
                    it, h - z @ Gd.T, warm_state, H_pk=H_pk, gb=gb,
                    loop=loop)
            else:
                e, J = resjac_b(z, dx0, windows)           # (B, ne), (B, ne, nz)
                Hb = 2.0 * jnp.einsum("bei,bej->bij", J, J, precision=jax.lax.Precision.HIGHEST)
                Hb = Hb + 1e-6 * jnp.eye(Hb.shape[-1], dtype=f32)[None]
                gb = 2.0 * jnp.einsum("bei,be->bi", J, e, precision=jax.lax.Precision.HIGHEST)
                if qp_kernel == "pallas":
                    d, mu_last, warm_state = _qp_call(
                        it, h - z @ Gd.T, warm_state, Hb=Hb, gb=gb,
                        loop=loop)
                else:
                    sub = fused_by_iters[ipm_sched[it]].raw_with_H(
                        Hb, gb, h - z @ Gd.T)
                    d = sub.x
                    mu_last = sub.mu
            # merit at the current iterate reuses the residual the Jacobian
            # pass just computed — identical value, one rollout saved per GN
            v0 = jnp.sum(jnp.maximum(z @ Gd.T - h, 0.0), axis=1)
            m0 = jnp.sum(e * e, axis=1) + rho * v0
            dirderiv = jnp.sum(gb * d, axis=1) - rho * v0
            # fixed Armijo ladder, batched; if every alpha is rejected (e.g. a
            # diverged f32 QP direction, possibly NaN), take NO step — a NaN
            # merit compares false everywhere, so the lane would otherwise
            # step blindly by the smallest alpha and poison itself
            accepted = jnp.zeros_like(m0, bool)
            alpha_sel = jnp.zeros_like(m0)
            for a in sched:
                m_a, _ = merit(z + a * d)
                ok = jnp.logical_and(~accepted, m_a <= m0 + 1e-4 * a * dirderiv)
                alpha_sel = jnp.where(ok, a, alpha_sel)
                accepted = jnp.logical_or(accepted, ok)
            d = jnp.where(jnp.isfinite(d), d, 0.0)
            z = z + alpha_sel[:, None] * d
        # Controller-level convergence, NOT the last QP's complementarity
        # flag: the Pallas-factored f32 subproblems can stall at mu ~ 5e-4 on
        # a few % of lanes while their SQP iterates sit within 4e-5 of the
        # f64 optimum (audited against the vmapped f64 SQP on the bench
        # distribution — the "unconverged" lanes were the MORE accurate
        # ones). A usable control = feasible, finite, sane final subproblem.
        h_scale = 1.0 + jnp.max(jnp.abs(h), axis=1)
        viol = jnp.max(z @ Gd.T - h, axis=1)
        conv = jnp.logical_and(
            jnp.logical_and(viol <= 2e-3 * h_scale,
                            jnp.all(jnp.isfinite(z), axis=1)),
            mu_last < 1e-2,
        )
        if loop:
            return z, conv, warm_state
        return z, conv

    # context-free entry for embedding in an outer jitted scan (see
    # runtime/closed_loop.run_closed_loop_batched); caller owns f32 casting
    # and matmul precision
    solve_batch.raw = _solve
    if qp_warm and qp_kernel in ("pallas", "pallas_full"):
        # receding-horizon warm chain: raw_qpwarm threads the Mehrotra
        # kernel's interior state ACROSS solves — (z, conv, qp_state) =
        # raw_qpwarm(dx0, windows, z_ws, qp_state); seed step 0 with
        # init_qp_state (bit-identical to a cold start, so no separate
        # cold-step branch is traced in the loop)
        solve_batch.raw_qpwarm = _solve
        _any_warm = next(iter(pallas_raws.values()))

        def init_qp_state(dx0, z_ws):
            dx0 = dx0.astype(f32)
            z_ws = z_ws.astype(f32)
            h = h0d[None, :] + dx0 @ Hpd.T
            return _any_warm.cold_state(h - z_ws @ Gd.T)

        solve_batch.init_qp_state = init_qp_state
    solve_batch._res_b = res_b            # test hooks: batched residual and
    solve_batch._resjac_b = resjac_b      # residual+Jacobian (jac_mode path)
    solve_batch._pf_tile = _pf_tile       # shared pallas_full handoff tile
    solve_batch._gn_raw_for = (gn_raw_for
                               if qp_kernel in ("pallas_full", "pallas_mono")
                               else None)
    return solve_batch


def make_lbmpc_solver_hybrid(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    family: str = "fmincon",
    delta: float = 0.01,
    bandwidth: float = 0.5,
    ridge: float = 0.001,
    dx_ref: np.ndarray | None = None,
    sqp_iters: int = 3,
    ipm_iters: int = 20,
    tile: int = 512,
    rho: float = 1e4,
    interpret: bool = False,
    scale: bool = True,
    repair_frac: float = 1.0 / 16.0,
    repair_ipm_iters: int = 30,
    repair_sqp_iters: int | None = None,
    repair_warm: str = "ws",
    qp_kernel: str = "xla",
    alphas: tuple = _ALPHAS,
    repair_backend: str = "vmapped",
    qp_warm: bool = False,
):
    """Fused batch SQP + fixed-shape vmapped repair of flagged lanes.

    ROADMAP item 1(b): the fused backend is ~1.5x faster per solve but a few
    percent of lanes can land away from the optimum (flagged by `converged`).
    This wrapper re-solves the worst K = ceil(B * repair_frac) lanes with the
    vmapped f32 SQP (controllers/lbmpc.py) *inside the same jit*: top_k over
    the flagged mask gathers a fixed-size sub-batch (shape-static, so the
    whole thing stays one traced program), the vmapped path solves it, and
    results scatter back only where a lane was actually flagged. If more than
    K lanes are flagged the extras keep their fused result (and stay
    flagged). Repair cost ~ repair_frac * vmapped cost.

    repair_warm="fused" seeds the repair at the fused iterate instead of the
    original warm start: flagged lanes are mu-stalls whose z is typically
    already near the optimum (see make_lbmpc_solver_fused docstring), so a
    reduced repair budget (repair_sqp_iters=1-2) then suffices — the
    headline-bench configuration (scripts/sweep_repair.py measured the
    cost/convergence frontier).

    Returns solve_batch(dx0, windows, z_ws) -> (z, converged) like the fused
    factory, plus .raw for embedding in an outer jitted scan.
    """
    from lbmpc_tpu.controllers.lbmpc import make_lbmpc_solver

    fused = make_lbmpc_solver_fused(
        qp, A, B, Ks, w, family=family, delta=delta, bandwidth=bandwidth,
        ridge=ridge, dx_ref=dx_ref, sqp_iters=sqp_iters, ipm_iters=ipm_iters,
        tile=tile, rho=rho, interpret=interpret, scale=scale,
        qp_kernel=qp_kernel, alphas=alphas, qp_warm=qp_warm)
    if repair_backend == "fused":
        # repair through the batch-level machinery at the compacted size:
        # the vmapped per-problem repair costs ~1.4 ms of pure sequential op
        # depth regardless of K; a K-lane fused pass (same kernels, deeper
        # budget, fresh IPM state from the warm-seeded GN relinearization)
        # costs a fraction. Falls back conceptually to the same math.
        _rep_cache: dict = {}

        def _rep_for(K):
            # lazily built at trace time -> constants must be concrete
            # (see gn_raw_for's ensure_compile_time_eval note)
            if K not in _rep_cache:
                with jax.ensure_compile_time_eval():
                    _rep_cache[K] = make_lbmpc_solver_fused(
                        qp, A, B, Ks, w, family=family, delta=delta,
                        bandwidth=bandwidth, ridge=ridge, dx_ref=dx_ref,
                        sqp_iters=repair_sqp_iters or sqp_iters,
                        ipm_iters=repair_ipm_iters, tile=K, rho=rho,
                        interpret=interpret, scale=scale, qp_kernel=qp_kernel,
                        alphas=(1.0, 0.5, 0.25))
            return _rep_cache[K]

        def vm_b(dxs, wins, zs):
            return _rep_for(dxs.shape[0]).raw(dxs, wins, zs)
    else:
        vm = make_lbmpc_solver(
            qp, A, B, Ks, w, family=family, delta=delta, bandwidth=bandwidth,
            ridge=ridge, dx_ref=dx_ref,
            sqp_iters=repair_sqp_iters or sqp_iters,
            ipm_iters=repair_ipm_iters, dtype=jnp.float32)
        vm_b = jax.vmap(vm, in_axes=(0, 0, 0))
    f32 = jnp.float32

    def _repair(z, conv, dx0, windows, z_ws):
        Bsz = dx0.shape[0]
        K = max(1, min(Bsz, int(round(Bsz * repair_frac))))
        flagged = ~conv
        # top_k over the 0/1 flagged mask lists every flagged lane first;
        # converged lanes fill the remaining slots and are masked out by
        # `take` below, so their repair solves are computed-and-discarded
        # (fixed shapes beat data-dependent gathers under jit)
        _, idx = jax.lax.top_k(flagged.astype(f32), K)
        take = flagged[idx]
        sub_w = jax.tree.map(lambda a: a[idx], windows)
        if repair_warm == "fused":
            z_seed = jnp.where(jnp.isfinite(z[idx]), z[idx], z_ws[idx])
        else:
            z_seed = z_ws[idx]
        z_r, conv_r = vm_b(dx0[idx], sub_w, z_seed)
        z_r = jnp.where(jnp.isfinite(z_r), z_r, 0.0)
        z = z.at[idx].set(jnp.where(take[:, None], z_r, z[idx]))
        conv = conv.at[idx].set(jnp.where(take, conv_r, conv[idx]))
        return z, conv

    def _solve(dx0, windows, z_ws):
        z, conv = fused.raw(dx0, windows, z_ws)
        return _repair(z, conv, dx0, windows, z_ws)

    @jax.jit
    def solve_batch(dx0, windows, z_ws):
        with jax.default_matmul_precision("highest"):
            return _solve(
                dx0.astype(f32),
                jax.tree.map(lambda a: a.astype(f32)
                             if a.dtype != jnp.int32 else a, windows),
                z_ws.astype(f32))

    solve_batch.raw = _solve
    if hasattr(fused, "raw_qpwarm"):
        # cross-step warm chain with the per-step repair riding along (the
        # repair touches z/conv only; the carried interior state is the
        # fused path's — repaired lanes re-enter the chain at the next
        # step's relinearization)
        def _solve_qpwarm(dx0, windows, z_ws, qp_state):
            z, conv, qp_state = fused.raw_qpwarm(dx0, windows, z_ws,
                                                 qp_state)
            z, conv = _repair(z, conv, dx0, windows, z_ws)
            return z, conv, qp_state

        solve_batch.raw_qpwarm = _solve_qpwarm
        solve_batch.init_qp_state = fused.init_qp_state
    return solve_batch


def make_lbmpc_solver_fleet(
    qp: CondensedQP,
    A: np.ndarray,
    B: np.ndarray,
    Ks: np.ndarray,
    w: LBMPCWeights,
    sqp_iters: int = 2,
    ipm_iters: int = 16,
    repair_frac: float = 1.0 / 128.0,
    repair_sqp_iters: int = 1,
    repair_ipm_iters: int = 20,
    **kw,
):
    """Fused SQP over R independent batches + ONE deferred compacted repair.

    The per-step hybrid repair (make_lbmpc_solver_hybrid) pays the vmapped
    repair's sequential depth (~3.3 ms, K- and iteration-insensitive — pure
    op-dispatch depth of the N-stage Jacobian scan + IPM chain) once per
    batch. For a throughput workload of R independent batches per call the
    repair can instead be deferred: scan the fused solver over all R batches,
    gather the flagged lanes of the WHOLE call (top_k over R*B lanes) into
    one fixed-size buffer, run the vmapped repair once, and scatter back —
    the repair depth amortizes over R batches instead of one.

    Returns solve_many(dx0 (R,B,n), windows (R,B,...), z_ws (R,B,nz))
    -> (z (R,B,nz), converged (R,B)), jitted. Every solve in the call is
    final when the call returns (this is a solve service, not a closed loop —
    closed loops need the per-step hybrid instead).
    """
    from lbmpc_tpu.controllers.lbmpc import make_lbmpc_solver

    fused = make_lbmpc_solver_fused(
        qp, A, B, Ks, w, sqp_iters=sqp_iters, ipm_iters=ipm_iters, **kw)
    vm = make_lbmpc_solver(
        qp, A, B, Ks, w, sqp_iters=repair_sqp_iters,
        ipm_iters=repair_ipm_iters, dtype=jnp.float32,
        **{k: v for k, v in kw.items()
           if k in ("family", "delta", "bandwidth", "ridge", "dx_ref")})
    vm_b = jax.vmap(vm, in_axes=(0, 0, 0))
    f32 = jnp.float32

    def _solve_many(dx0, windows, z_ws):
        R, Bsz = dx0.shape[0], dx0.shape[1]
        total = R * Bsz

        def body(_, inp):
            d, w_, z = inp
            return None, fused.raw(d, w_, z)

        _, (z, conv) = jax.lax.scan(body, None, (dx0, windows, z_ws))
        zf = z.reshape(total, -1)
        convf = conv.reshape(total)
        dxf = dx0.reshape(total, -1)
        wsf = jax.tree.map(lambda a: a.reshape((total,) + a.shape[2:]), windows)
        z_wsf = z_ws.reshape(total, -1)
        K = max(1, min(total, int(round(total * repair_frac))))
        flagged = ~convf
        _, idx = jax.lax.top_k(flagged.astype(f32), K)
        take = flagged[idx]
        sub_w = jax.tree.map(lambda a: a[idx], wsf)
        z_seed = jnp.where(jnp.isfinite(zf[idx]), zf[idx], z_wsf[idx])
        z_r, conv_r = vm_b(dxf[idx], sub_w, z_seed)
        z_r = jnp.where(jnp.isfinite(z_r), z_r, 0.0)
        zf = zf.at[idx].set(jnp.where(take[:, None], z_r, zf[idx]))
        convf = convf.at[idx].set(jnp.where(take, conv_r, convf[idx]))
        return zf.reshape(z.shape), convf.reshape(conv.shape)

    @jax.jit
    def solve_many(dx0, windows, z_ws):
        with jax.default_matmul_precision("highest"):
            return _solve_many(
                dx0.astype(f32),
                jax.tree.map(lambda a: a.astype(f32)
                             if a.dtype != jnp.int32 else a, windows),
                z_ws.astype(f32))

    solve_many.raw = _solve_many
    return solve_many
