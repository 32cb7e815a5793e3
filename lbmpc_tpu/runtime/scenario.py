"""Scenario assembly: preset name -> ready-to-run jitted closed-loop episode.

The user-facing layer tying plant + synthesis + sets + controller + harness
together, replacing the copy-pasted setup blocks of the reference examples
(ref: examples/LBMPC_RunExample.m:10-107, DMS_LBMPC_casadi.m:13-160).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np

from lbmpc_tpu.config import ScenarioConfig, make_preset
from lbmpc_tpu.controllers.condensed import build_casadi_dms, build_fmincon_lmpc
from lbmpc_tpu.controllers.lbmpc import (
    LBMPCWeights,
    make_casadi_warm_start,
    make_lbmpc_solver,
)
from lbmpc_tpu.controllers.lmpc import make_lmpc_solver
from lbmpc_tpu.controllers.nmpc import make_nmpc_solver
from lbmpc_tpu.models.mgcm import mg2_dlti, mg2_ode, mgcm_dlti, rk23_step, rk4_step
from lbmpc_tpu.oracle import DataWindow, init_window
from lbmpc_tpu.runtime.closed_loop import ClosedLoopResult, run_closed_loop
from lbmpc_tpu.sets.terminal import ConstraintSet, get_cons, get_cons_poly
from lbmpc_tpu.synthesis import mat_ocp


@dataclasses.dataclass(frozen=True)
class Scenario:
    """Assembled scenario: matrices, constraint sets, solver and episode fns."""

    cfg: ScenarioConfig
    A: np.ndarray
    B: np.ndarray
    ocp: "object"          # OCPMatrices
    cs: ConstraintSet
    nz: int
    episode: "object"      # jitted (dx_init,) -> ClosedLoopResult
    episode_with_window: "object"  # (dx_init, window0) -> ClosedLoopResult
    solve: "object"        # raw per-step solver (dx, window, z_ws) -> (z, conv)
    episode_from: "object" = None  # (dx_init, window0, z0, steps=) -> result

    def run(self, dx_init=None) -> ClosedLoopResult:
        """Run one episode; default initial state follows the family's
        convention (fmincon: delta dx_init; casadi: absolute x_init)."""
        if dx_init is None:
            if self.cfg.family == "casadi":
                dx_init = np.asarray(self.cfg.x_init_abs) - np.asarray(self.cfg.plant.x_wp)
            else:
                dx_init = self.cfg.dx_init
        return self.episode(jnp.asarray(dx_init, jnp.float64))

    def run_batch(self, dx_inits) -> ClosedLoopResult:
        dx_inits = jnp.asarray(dx_inits)
        if getattr(self.cfg.solver, "qp_backend", "") == "sparse_parallel":
            # associative-scan Riccati memory guard: the batched scan's
            # per-level temporaries crashed the remote TPU worker at
            # batch 1024 x N=100 (= 102400 lane-stages; ROADMAP item 4
            # CAUTION / memory note 2026-08). Refuse configurations beyond
            # half that observed boundary instead of risking the worker.
            lane_stages = int(dx_inits.shape[0]) * self.cfg.ocp.N
            if lane_stages > 51200:
                raise ValueError(
                    f"sparse_parallel batch x N = {lane_stages} lane-stages "
                    "exceeds the validated VMEM/HBM envelope (51200; the "
                    "worker crashed at 102400). Use qp_backend='sparse' for "
                    "large batches — the associative scan is the "
                    "single-solve latency option.")
        return jax.vmap(self.episode)(dx_inits)


def build_scenario(name_or_cfg, ipm_iters: int | None = None) -> Scenario:
    cfg = name_or_cfg if isinstance(name_or_cfg, ScenarioConfig) else make_preset(name_or_cfg)
    qp_backend = getattr(cfg.solver, "qp_backend", "condensed")
    if qp_backend != "condensed":
        # reject silently-ignored configurations instead of running condensed
        # anyway (ADVICE r1): sparse serves LMPC QPs and LBMPC SQP
        # subproblems (ops/sparse_gn); NMPC stays condensed, and the
        # associative-scan variant stays LMPC-only (no cross-term support; it
        # also crashed the TPU worker at batch 1024 x N=100 — ROADMAP item 4
        # CAUTION — so it is gated to the dense-batch-free LMPC path).
        if cfg.controller == "nmpc" or (
                cfg.controller == "lbmpc" and qp_backend == "sparse_parallel"):
            raise ValueError(
                f"qp_backend={qp_backend!r} is not supported for "
                f"controller={cfg.controller!r}; sparse LBMPC uses "
                "qp_backend='sparse', NMPC uses 'condensed'")
        if cfg.solver.dtype == "mixed":
            raise ValueError(
                "dtype='mixed' (f32 IPM + f64 refinement) is a condensed-path "
                "feature; use dtype='float32' or 'float64' with sparse backends")
    p = cfg.plant
    mg2 = getattr(p, "model", "mgcm4") == "mg2"
    plant_ode = mg2_ode if mg2 else None  # None -> integrators default to mgcm_ode
    A, B, C, _ = (mg2_dlti if mg2 else mgcm_dlti)(p.ts)
    ocp = mat_ocp(A, B, C, poles=cfg.ocp.poles, T=cfg.ocp.T)
    common = dict(
        x_min=p.x_min, x_max=p.x_max, u_min=p.u_min, u_max=p.u_max,
        x_wp=p.x_wp, u_wp=p.u_wp,
    )
    if getattr(cfg.ocp, "robust_tube", False):
        from lbmpc_tpu.sets.terminal import get_cons_robust_ks

        cs = get_cons_robust_ks(
            **common,
            state_uncert=(p.tube_uncert if getattr(p, "tube_uncert", None)
                          else p.state_uncert),
            A=A, B=B, Ks=ocp.Ks,
            LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
        )
    elif cfg.ocp.tighten_first_step:
        cs = get_cons_poly(
            **common, state_uncert=p.state_uncert,
            A=A, B=B, Q=ocp.Q, R=ocp.R,
            LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
        )
    else:
        cs = get_cons(
            **common, A=A, B=B, K=ocp.Ks,
            LAMBDA=ocp.LAMBDA, PSI=ocp.PSI, LAMBDA_0=ocp.LAMBDA_0, PSI_0=ocp.PSI_0,
        )

    N = cfg.ocp.N
    iters_ipm = ipm_iters or cfg.solver.ipm_iters
    w = LBMPCWeights.make(ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI)
    # "mixed" keeps f64 arrays (the refinement stage needs them); the f32 IPM
    # stage casts internally (ops.ipm.solve_qp_mixed)
    dtype = jnp.float32 if cfg.solver.dtype == "float32" else jnp.float64
    mixed = cfg.solver.dtype == "mixed"

    if cfg.family == "fmincon":
        qp = build_fmincon_lmpc(
            A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI, cs, N,
            dx_ref=np.asarray(cfg.dx_ref),
            terminal_at=cfg.ocp.terminal_at,
            tighten_first_step=cfg.ocp.tighten_first_step,
        )
        plant = lambda x, u: rk23_step(x, u[0], p.ts, ode=plant_ode)
        warm = lambda z, dx_used, dx_next, window: z  # fmincon reuses opt_var
    elif cfg.family == "casadi_k":
        # explicit prestabilization split (DMS_tracking_LMPC_casadi_K.m):
        # casadi-family stage stacks over the prestabilized rollout; the
        # applied input is u = Ks dx + c like the fmincon family
        from lbmpc_tpu.controllers.condensed import build_casadi_dms_k

        qp = build_casadi_dms_k(
            A, B, ocp.Ks, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI,
            cs, N, delta=p.ts,
        )
        plant = lambda x, u: rk4_step(x, u[0], p.ts, substeps=1, ode=plant_ode)
        warm = lambda z, dx_used, dx_next, window: z
    else:
        qp = build_casadi_dms(
            A, B, ocp.Q, ocp.R, ocp.P, ocp.T, ocp.LAMBDA, ocp.PSI, cs, N,
            delta=p.ts,
            terminal_at=cfg.ocp.terminal_at,
            tighten_first_step=cfg.ocp.tighten_first_step,
        )
        plant = lambda x, u: rk4_step(x, u[0], p.ts, substeps=1, ode=plant_ode)
        warm = make_casadi_warm_start(qp, A, B, ocp.Ks)

    if cfg.controller == "lmpc":
        if qp_backend.startswith("sparse"):
            # Stage-form Riccati IPM (long-horizon path, ROADMAP perf item 4).
            # make_stage_qp encodes the casadi-family tracking OCP with the
            # terminal set at k=N and no first-step tightening.
            if (cfg.family != "casadi" or cfg.ocp.terminal_at != "last"
                    or cfg.ocp.tighten_first_step):
                raise ValueError(
                    "sparse QP backend supports casadi-family tracking LMPC "
                    "(terminal_at='last', tighten_first_step=False)")
            from lbmpc_tpu.ops.sparse_ipm import make_stage_qp, solve_sparse

            stage_qp = make_stage_qp(A, B, ocp.Q, ocp.R, ocp.P, ocp.T,
                                     ocp.LAMBDA, ocp.PSI, cs, N, delta=p.ts)
            if dtype == jnp.float32:
                stage_qp = jax.tree.map(
                    lambda x: x.astype(dtype)
                    if hasattr(x, "dtype") and jnp.issubdtype(x.dtype, jnp.floating)
                    else x, stage_qp)
            par = qp_backend == "sparse_parallel"

            def solve(dx, window, z_ws):
                sol = solve_sparse(stage_qp, dx.astype(dtype),
                                   iters=iters_ipm, parallel=par)
                z = jnp.concatenate([sol.U.ravel(), sol.theta])
                return z, sol.converged
        else:
            lin_solve = make_lmpc_solver(qp, ipm_iters=iters_ipm, dtype=dtype,
                                         mixed=mixed)

            def solve(dx, window, z_ws):
                z, sol = lin_solve(dx)
                return z, sol.converged

        # LMPC ignores the window, but the MX_LBMPC variant still collects
        # oracle data every step (config.collect_data; ref LBMPC_casadi.m)
        learn = getattr(cfg, "collect_data", False)
    elif cfg.controller == "lbmpc":
        if qp_backend == "sparse":
            from lbmpc_tpu.controllers.lbmpc import make_lbmpc_solver_sparse

            solve = make_lbmpc_solver_sparse(
                qp, A, B, ocp.Ks, w, cs,
                family=cfg.family, delta=p.ts,
                bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
                dx_ref=np.asarray(cfg.dx_ref),
                sqp_iters=cfg.solver.sqp_iters, ipm_iters=iters_ipm,
                terminal_at=cfg.ocp.terminal_at,
                tighten_first_step=cfg.ocp.tighten_first_step, dtype=dtype,
            )
        else:
            solve = make_lbmpc_solver(
                qp, A, B, ocp.Ks, w,
                family=cfg.family, delta=p.ts,
                bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
                dx_ref=np.asarray(cfg.dx_ref),
                sqp_iters=cfg.solver.sqp_iters, ipm_iters=iters_ipm, dtype=dtype,
                mixed=mixed,
            )
        learn = cfg.learn_online
    elif cfg.controller == "nmpc":
        regulation = getattr(cfg.ocp, "regulation", False)
        if regulation:
            from lbmpc_tpu.config import REG_P
            P_term = np.asarray(REG_P)
        else:
            P_term = None
        solve = make_nmpc_solver(
            cs, ocp.Ks, w, N, p.ts, np.asarray(p.x_wp), p.u_wp,
            family=cfg.family, dx_ref=np.asarray(cfg.dx_ref),
            sqp_iters=cfg.solver.sqp_iters, ipm_iters=iters_ipm,
            prediction=getattr(cfg.solver, "nmpc_prediction", "rk4"),
            AB=(A, B), regulation=regulation, P_term=P_term,
            ellipsoid_alpha=getattr(cfg.ocp, "ellipsoid_alpha", None),
        )
        learn = False
    else:
        raise ValueError(cfg.controller)

    Ks_eff = (ocp.Ks if cfg.family in ("fmincon", "casadi_k")
              else np.zeros_like(ocp.Ks))

    @functools.partial(jax.jit, static_argnames=("steps",))
    def episode_from(dx_init, window0, z0, steps=cfg.iterations):
        """Episode from an arbitrary carry (resume path — runtime/checkpoint)."""
        return run_closed_loop(
            solve, plant, warm,
            jnp.asarray(Ks_eff), jnp.asarray(A), jnp.asarray(B), jnp.asarray(ocp.LAMBDA),
            jnp.asarray(p.x_wp), jnp.asarray([p.u_wp]), dx_init,
            z0, window0,
            steps, learn=learn,
            log_post_state=(cfg.controller != "lbmpc"),
        )

    def episode_with_window(dx_init, window0):
        return episode_from(dx_init, window0, jnp.zeros(qp.nz))

    def episode(dx_init):
        return episode_with_window(
            dx_init, init_window(cfg.oracle.q, d_out=cfg.oracle.d_out))

    return Scenario(
        cfg=cfg, A=A, B=B, ocp=ocp, cs=cs, nz=qp.nz,
        episode=episode, episode_with_window=episode_with_window, solve=solve,
        episode_from=episode_from,
    )


def build_fleet_episode(name_or_cfg, ipm_iters=None,
                        sqp_iters: int | None = None,
                        interpret: bool | None = None,
                        backend: str = "fused",
                        repair_frac: float = 1.0 / 85.0,
                        qp_kernel: str = "xla",
                        alphas=None,
                        qp_warm: bool = False,
                        warm_chain: bool = False):
    """Batch-level LBMPC episode on the fused QP backend (f32 throughput path).

    Returns (scenario, run(dx_init (B, n)) -> batched ClosedLoopResult). The
    whole cohort advances through one jitted scan whose QP subproblems are the
    batch-level fused Mehrotra solver (ops/ipm_fused + Pallas factor/solve) —
    the fastest per-solve path on TPU (bench.py backend_impl="fused_sqp").
    backend="hybrid" adds the gather-compacted per-step repair (the headline
    bench configuration: conv 1.0 at ~4% step cost). fmincon-family LBMPC
    only.
    """
    cfg = name_or_cfg if isinstance(name_or_cfg, ScenarioConfig) else make_preset(name_or_cfg)
    if cfg.controller != "lbmpc" or cfg.family != "fmincon":
        raise ValueError("fused fleet episodes support fmincon-family LBMPC only")
    from lbmpc_tpu.controllers.sqp_fused import (make_lbmpc_solver_fused,
                                                 make_lbmpc_solver_hybrid)
    from lbmpc_tpu.models.mgcm import mg2_ode, rk23_step
    from lbmpc_tpu.runtime.closed_loop import run_closed_loop_batched

    # ipm_iters may be a per-GN tuple (the fused factory's schedule form);
    # the vmapped scenario solver only takes the flat int form
    sc = build_scenario(cfg, ipm_iters=(ipm_iters if isinstance(ipm_iters, int)
                                        else None))
    p = cfg.plant
    mg2 = getattr(p, "model", "mgcm4") == "mg2"
    plant_ode = mg2_ode if mg2 else None
    qp = (build_fmincon_lmpc(
        sc.A, sc.B, sc.ocp.Ks, sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
        sc.ocp.LAMBDA, sc.ocp.PSI, sc.cs, cfg.ocp.N,
        dx_ref=np.asarray(cfg.dx_ref), terminal_at=cfg.ocp.terminal_at,
        tighten_first_step=cfg.ocp.tighten_first_step,
    ))
    w = LBMPCWeights.make(sc.ocp.Q, sc.ocp.R, sc.ocp.P, sc.ocp.T,
                          sc.ocp.LAMBDA, sc.ocp.PSI)
    factory = (make_lbmpc_solver_hybrid if backend == "hybrid"
               else make_lbmpc_solver_fused)
    extra = (dict(repair_frac=repair_frac, repair_sqp_iters=1,
                  repair_ipm_iters=8, repair_warm="fused",
                  repair_backend=("fused" if qp_kernel == "pallas_full"
                                  else "vmapped"))
             if backend == "hybrid" else {})
    if qp_kernel != "xla":
        # round-3 kernels (ops/pallas_gn + ops/pallas_ipm); the bench
        # headline ladder rides along unless overridden
        extra.update(qp_kernel=qp_kernel, tile=256,
                     alphas=alphas or ((1.0,), (1.0, 0.5, 0.25)),
                     qp_warm=qp_warm)
    elif alphas is not None:
        extra.update(alphas=alphas)
    solve_batch = factory(
        qp, sc.A, sc.B, sc.ocp.Ks, w, family="fmincon", delta=p.ts,
        bandwidth=cfg.oracle.bandwidth, ridge=cfg.oracle.ridge,
        dx_ref=np.asarray(cfg.dx_ref),
        sqp_iters=sqp_iters or cfg.solver.sqp_iters,
        ipm_iters=ipm_iters or cfg.solver.ipm_iters,
        # Pallas kernels need interpret mode off-TPU
        interpret=(jax.default_backend() != "tpu") if interpret is None else interpret,
        **extra,
    )
    f32 = jnp.float32
    plant = lambda x, u: rk23_step(x, u[0], p.ts, ode=plant_ode)

    @jax.jit
    def run(dx_init):
        B0 = dx_init.shape[0]
        win0 = init_window(cfg.oracle.q, d_out=cfg.oracle.d_out, dtype=f32)
        windows0 = jax.tree.map(
            lambda a: jnp.broadcast_to(a, (B0,) + a.shape), win0)
        chain_kw = {}
        if warm_chain:
            if not (qp_warm and hasattr(solve_batch, "raw_qpwarm")):
                raise ValueError("warm_chain needs qp_warm=True and a "
                                 "pallas QP kernel")
            chain_kw = dict(qp_warm_solve=solve_batch.raw_qpwarm,
                            qp_init_state=solve_batch.init_qp_state)
        with jax.default_matmul_precision("highest"):
            return run_closed_loop_batched(
                solve_batch.raw, plant, lambda z, dxu, dxn, w_: z,
                jnp.asarray(np.atleast_2d(sc.ocp.Ks), f32), jnp.asarray(sc.A, f32),
                jnp.asarray(sc.B, f32), jnp.asarray(sc.ocp.LAMBDA, f32),
                jnp.asarray(p.x_wp, f32), jnp.asarray([p.u_wp], f32),
                dx_init.astype(f32), jnp.zeros((B0, qp.nz), f32), windows0,
                cfg.iterations, learn=cfg.learn_online, log_post_state=False,
                **chain_kw,
            )

    return sc, run
