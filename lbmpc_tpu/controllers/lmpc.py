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
from lbmpc_tpu.ops.ipm import IPMSolution, solve_qp


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


def make_lmpc_solver(qp: CondensedQP, ipm_iters: int = 30, dtype=jnp.float64):
    """Returns solve(dx) -> (z, IPMSolution); pure, jit/vmap-friendly."""
    dev = QPDevice.from_condensed(qp, dtype)

    def solve(dx: jax.Array) -> tuple[jax.Array, IPMSolution]:
        g = dev.Gg @ dx + dev.g0
        h = dev.h0 + dev.Hp @ dx
        sol = solve_qp(dev.H, g, dev.G, h, iters=ipm_iters)
        return sol.x, sol

    return solve
