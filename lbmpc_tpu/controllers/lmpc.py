"""Linear tracking MPC (LMPC): condensed QP + batched IPM solve.

Replaces the reference's fmincon-SQP loop over blackbox cost/constraint
closures (ref: functions/ocpLMPC.m:11-39) with one dense QP per step solved by
the jitted Mehrotra IPM. Exactly the same optimum — the reference problem IS
this QP, fmincon just never knew it.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from lbmpc_tpu.controllers.condensed import CondensedQP
from lbmpc_tpu.ops.ipm import IPMSolution, solve_qp, solve_qp_mixed


class QPDevice(NamedTuple):
    """CondensedQP pushed to device arrays (closed over by jitted solvers)."""

    H: jax.Array
    Gg: jax.Array
    g0: jax.Array
    G: jax.Array
    h0: jax.Array
    Hp: jax.Array

    @classmethod
    def from_condensed(cls, qp: CondensedQP, dtype=jnp.float64) -> "QPDevice":
        return cls(
            H=jnp.asarray(qp.H, dtype),
            Gg=jnp.asarray(qp.Gg, dtype),
            g0=jnp.asarray(qp.g0, dtype),
            G=jnp.asarray(qp.G, dtype),
            h0=jnp.asarray(qp.h0, dtype),
            Hp=jnp.asarray(qp.Hp, dtype),
        )


def make_lmpc_solver(qp: CondensedQP, ipm_iters: int = 30, dtype=jnp.float64,
                     mixed: bool = False):
    """Returns solve(dx) -> (z, IPMSolution); pure, jit/vmap-friendly.

    mixed=True routes the QP through solve_qp_mixed (f32 IPM + f64 refinement;
    requires dtype=float64 arrays for the refinement stage)."""
    dev = QPDevice.from_condensed(qp, jnp.float64 if mixed else dtype)

    def solve(dx: jax.Array) -> tuple[jax.Array, IPMSolution]:
        g = dev.Gg @ dx + dev.g0
        h = dev.h0 + dev.Hp @ dx
        if mixed:
            sol = solve_qp_mixed(dev.H, g, dev.G, h, f32_iters=ipm_iters)
        else:
            sol = solve_qp(dev.H, g, dev.G, h, iters=ipm_iters)
        return sol.x, sol

    return solve
