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

from lbmpc_tpu.oracle import DataWindow, observe_residual, push


class ClosedLoopResult(NamedTuple):
    sys_history: jax.Array   # (iterations+1, n+m): [dx; du] incl. initial column
    art_history: jax.Array   # (iterations, m): artificial reference Lambda theta (1st state block row m)
    solver_converged: jax.Array  # (iterations,) bool
    final_window: DataWindow


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

    (xf, wf, _), (sysH, artH, conv) = jax.lax.scan(
        step, (x0_abs, window0, z0), None, length=iterations
    )
    first = jnp.concatenate([dx_init, jnp.zeros((m,), sysH.dtype)])[None, :]
    sysH = jnp.concatenate([first, sysH], axis=0)
    return ClosedLoopResult(sysH, artH, conv, wf)
