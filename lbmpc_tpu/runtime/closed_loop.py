"""Closed-loop receding-horizon harness: `lax.scan` over steps, vmap over scenarios.

The TPU-native replacement for the reference's serial MPC loops
(ref: functions/ocpLBMPC.m:10-46, examples/DMS_LBMPC_casadi.m:163-234):
one jitted scan per episode; thousands of scenarios batch via `jax.vmap`;
multi-chip scaling shards the scenario axis (see lbmpc_tpu.runtime.sharding).

Step semantics (fmincon family, ref: ocpLBMPC.m):
  1. dx = x - x_wp
  2. z = solve OCP(dx, window, z_warmstart)
  3. u = Ks dx + c_0 + u_wp                  (ref: transitionTrue.m:11)
  4. x+ = plant(x, u)                        (ode23 / RK4 per config)
  5. window += (xi(dx, du), residual)        (ref: ocpLBMPC.m:14-19)
  6. log [dx; du]                            (ref: ocpLBMPC.m:40)
"""

from __future__ import annotations

import functools
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from lbmpc_tpu.oracle import DataWindow, observe_residual, push, push_batched


class ClosedLoopResult(NamedTuple):
    sys_history: jax.Array   # (iterations+1, n+m): [dx; du] incl. initial column
    art_history: jax.Array   # (iterations, m): artificial reference Lambda theta (1st state block row m)
    solver_converged: jax.Array  # (iterations,) bool
    final_window: DataWindow
    # resumable carry (runtime/checkpoint.py): post-episode plant state and
    # the next step's warm start — continuing from these reproduces the
    # uninterrupted episode exactly (test_runtime checkpoint-resume test)
    final_x: jax.Array = None        # (n,) absolute plant state after the last step
    final_z: jax.Array = None        # (nz,) warm start for the next solve


def run_closed_loop(
    solve_fn: Callable,       # (dx, window, z_ws) -> (z, converged)
    plant_step: Callable,     # (x_abs, u_abs) -> x_abs'
    warm_start_fn: Callable,  # (z, dx_used, dx_next, window) -> z_ws for next step
    Ks: jax.Array,
    A: jax.Array,
    B: jax.Array,
    Mtheta_x: jax.Array,      # LAMBDA (n, nth) — for artificial-reference logging
    x_wp: jax.Array,
    u_wp: jax.Array,
    dx_init: jax.Array,
    z0: jax.Array,
    window0: DataWindow,
    iterations: int,
    learn: bool = True,
    log_post_state: bool = True,
) -> ClosedLoopResult:
    n = x_wp.shape[-1]
    m = u_wp.shape[-1] if u_wp.ndim else 1
    u_wp = jnp.atleast_1d(u_wp)

    x0_abs = x_wp + dx_init

    def step(carry, _):
        x, window, z_ws = carry
        dx = x - x_wp
        z, converged = solve_fn(dx, window, z_ws)
        c0 = z[:m]
        du = Ks @ dx + c0
        u = du + u_wp
        x1 = plant_step(x, u)
        xi_new, y_new = observe_residual(dx, du, x1 - x_wp, A, B)
        window1 = jax.tree.map(
            lambda a, b: jnp.where(learn, a, b), push(window, xi_new, y_new), window
        ) if learn else window
        z_next = warm_start_fn(z, dx, x1 - x_wp, window1)
        theta = z[-Mtheta_x.shape[1]:]
        art = Mtheta_x @ theta
        # Logging convention differs between reference drivers: ocpLMPC/ocpNMPC
        # overwrite x before logging (post-step state, ocpLMPC.m:33-37) while
        # ocpLBMPC keeps the pre-step state (ocpLBMPC.m:37-40).
        logged_dx = x1 - x_wp if log_post_state else dx
        return (x1, window1, z_next), (jnp.concatenate([logged_dx, du]), art[:m], converged)

    (xf, wf, zf), (sysH, artH, conv) = jax.lax.scan(
        step, (x0_abs, window0, z0), None, length=iterations
    )
    first = jnp.concatenate([dx_init, jnp.zeros((m,), sysH.dtype)])[None, :]
    sysH = jnp.concatenate([first, sysH], axis=0)
    return ClosedLoopResult(sysH, artH, conv, wf, final_x=xf, final_z=zf)


def run_closed_loop_batched(
    solve_batch: Callable,    # (dx (B,n), windows, z_ws (B,nz)) -> (z (B,nz), conv (B,))
    plant_step: Callable,     # (x_abs, u_abs) -> x_abs' (single scenario; vmapped here)
    warm_start_fn: Callable,  # single-scenario warm start; vmapped here
    Ks: jax.Array,
    A: jax.Array,
    B: jax.Array,
    Mtheta_x: jax.Array,
    x_wp: jax.Array,
    u_wp: jax.Array,
    dx_init: jax.Array,       # (B, n)
    z0: jax.Array,            # (B, nz)
    window0: DataWindow,      # batched (leading axis B)
    iterations: int,
    learn: bool = True,
    log_post_state: bool = True,
    qp_warm_solve: Callable | None = None,
    qp_init_state: Callable | None = None,
) -> ClosedLoopResult:
    """Batch-level twin of run_closed_loop: the whole cohort advances through
    one scan with a BATCH-LEVEL solver (e.g. controllers/sqp_fused.py, whose
    QP subproblems run as one fused kernel per iteration instead of one
    dispatched micro-op per scenario). Same step semantics as run_closed_loop
    (ref: functions/ocpLBMPC.m:10-46); histories gain a leading batch axis.

    qp_warm_solve/qp_init_state (r5 cross-step warm chain): when given,
    the scan carry additionally threads the QP kernel's interior (s, z)
    state across time steps — qp_warm_solve(dx, window, z_ws, qp_state) ->
    (z, conv, qp_state') with qp_init_state(dx_init, z0) seeding step 0
    cold-identically (sqp_fused solve_batch.raw_qpwarm / init_qp_state).
    Receding-horizon steps then continue the previous step's IPM instead of
    re-centering from scratch, so a short warm schedule serves every step.
    The carried state is an intra-episode accelerator only: checkpoints
    (runtime/checkpoint.py) do not persist it, and a resume re-seeds it
    cold — the resumed solve is slightly more conservative, never less
    converged."""
    n = x_wp.shape[-1]
    m = u_wp.shape[-1] if u_wp.ndim else 1
    u_wp = jnp.atleast_1d(u_wp)
    nth = Mtheta_x.shape[1]

    plant_b = jax.vmap(plant_step)
    obs_b = jax.vmap(lambda dx, du, dx1: observe_residual(dx, du, dx1, A, B))
    # lockstep-aware push: cohorts advance together, so the per-lane scatter
    # collapses to one shared-index write (78% of the fleet step — oracle.py)
    push_b = push_batched
    warm_b = jax.vmap(warm_start_fn)

    x0_abs = x_wp[None, :] + dx_init
    chain = qp_warm_solve is not None

    def step(carry, _):
        if chain:
            x, window, z_ws, qps = carry
        else:
            x, window, z_ws = carry
        dx = x - x_wp[None, :]
        if chain:
            z, converged, qps = qp_warm_solve(dx, window, z_ws, qps)
        else:
            z, converged = solve_batch(dx, window, z_ws)
        c0 = z[:, :m]
        du = dx @ Ks.T + c0
        u = du + u_wp[None, :]
        x1 = plant_b(x, u)
        dx1 = x1 - x_wp[None, :]
        if learn:
            xi_new, y_new = obs_b(dx, du, dx1)
            window1 = push_b(window, xi_new, y_new)
        else:
            window1 = window
        z_next = warm_b(z, dx, dx1, window1)
        art = z[:, -nth:] @ Mtheta_x.T
        logged_dx = dx1 if log_post_state else dx
        carry_out = ((x1, window1, z_next, qps) if chain
                     else (x1, window1, z_next))
        return carry_out, (
            jnp.concatenate([logged_dx, du], axis=1), art[:, :m], converged)

    carry0 = ((x0_abs, window0, z0, qp_init_state(dx_init, z0)) if chain
              else (x0_abs, window0, z0))
    carry_f, (sysH, artH, conv) = jax.lax.scan(
        step, carry0, None, length=iterations
    )
    xf, wf, zf = carry_f[0], carry_f[1], carry_f[2]
    first = jnp.concatenate(
        [dx_init, jnp.zeros((dx_init.shape[0], m), sysH.dtype)], axis=1)[None]
    sysH = jnp.concatenate([first, sysH], axis=0)
    # scan stacks time first: (T, B, ...) -> (B, T, ...) to match
    # vmap(run_closed_loop)'s layout
    sysH = jnp.swapaxes(sysH, 0, 1)
    artH = jnp.swapaxes(artH, 0, 1)
    conv = jnp.swapaxes(conv, 0, 1)
    return ClosedLoopResult(sysH, artH, conv, wf, final_x=xf, final_z=zf)
