"""Closed-loop reproducibility-floor experiment (VERDICT r1 item 6).

Quantifies the parity noise floor the reference's own solver class carries:
perturb our solver budget (SQP iterations / IPM iterations), rerun the
closed loop, and measure the spread between our own runs in three windows —
pre-transient, active-set transient, post-transient re-lock. If the spread
between two of OUR runs at the transient matches the disagreement vs the
reference golden, the golden deviation is at the solver-class
reproducibility floor, not an accuracy deficit.

Ref context: the golden trajectories come from fmincon SQP
(functions/ocpLBMPC.m:27-31) with its own tolerance/iteration policy;
tests/test_parity.py documents the amplification mechanism (the control law
has discontinuous derivative at active-set switches, dominantly exciting the
fast throttle-rate state x4).

Usage: python scripts/noise_floor.py [PRESET] [STEPS]
Writes one JSON line per perturbed run. Measured results are recorded in
docs/NOISE_FLOOR.md.
"""

import json
import os
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))
os.environ["XLA_FLAGS"] = os.environ.get("XLA_FLAGS", "") + \
    " --xla_force_host_platform_device_count=8"
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import dataclasses

import numpy as np

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.scenario import build_scenario

# windows bracketing the active-set transient of the fmincon-family episodes
PRE, T0, T1, POST = 55, 55, 150, 150


def spread(a, b):
    err = np.abs(a - b)
    return {
        "pre": float(err[:, :PRE].max()),
        "transient_x4": float(err[3, T0:T1].max()),
        "transient_u": float(err[4, T0:T1].max()),
        "post": float(err[:, POST:].max()),
    }


def main(preset="LBMPC_N40", steps=300):
    grid = [(4, 25), (3, 25), (6, 25), (8, 40), (4, 40)]
    runs = {}
    for si, ii in grid:
        cfg = make_preset(preset, iterations=steps)
        cfg = dataclasses.replace(
            cfg, solver=dataclasses.replace(cfg.solver, sqp_iters=si, ipm_iters=ii))
        res = build_scenario(cfg).run()
        assert bool(res.solver_converged.all())
        runs[(si, ii)] = np.asarray(res.sys_history).T

    base = runs[grid[0]]
    for k in grid[1:]:
        print(json.dumps({"preset": preset, "vs": "self",
                          "perturb": {"sqp_iters": k[0], "ipm_iters": k[1]},
                          **spread(runs[k], base)}))

    gpath = f"tests/golden/{preset}.npz"
    if os.path.exists(gpath):
        g = dict(np.load(gpath))["sysH"][:, : steps + 1]
        print(json.dumps({"preset": preset, "vs": "golden",
                          **spread(base, g)}))


if __name__ == "__main__":
    main(*(sys.argv[1:2] or ["LBMPC_N40"]),
         *(int(a) for a in sys.argv[2:3]))
