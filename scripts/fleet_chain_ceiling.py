"""Probe the single-cohort HBM ceiling of the r5 warm-chain fleet path.

The chain carries the QP kernel's interior state (4 mI-row f32 arrays) in
the episode scan carry — ~26 KB/lane on top of the ~5.6 KB pallas_full
base — so the measured non-chain {2^20 OK, 2^21 OOM} bracket does not
transfer. This probes one cohort per process invocation (a wedged size
must not take the others down): OK / OOM per size.

Usage: python scripts/fleet_chain_ceiling.py <instances>
"""

import dataclasses
import json
import pathlib
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parent.parent))


def main():
    import jax

    jax.config.update("jax_enable_x64", True)
    jax.config.update(
        "jax_compilation_cache_dir",
        str(pathlib.Path(__file__).parent.parent / ".cache" / "jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from lbmpc_tpu.config import make_preset
    from lbmpc_tpu.runtime.scenario import build_fleet_episode

    FLB = int(sys.argv[1])
    fl_cfg = make_preset("LBMPC_N40", iterations=10)
    fl_cfg = dataclasses.replace(
        fl_cfg,
        ocp=dataclasses.replace(fl_cfg.ocp, N=20),
        solver=dataclasses.replace(fl_cfg.solver, dtype="float32",
                                   sqp_iters=2, ipm_iters=16),
        oracle=dataclasses.replace(fl_cfg.oracle, q=32))
    _, run_cohort = build_fleet_episode(
        fl_cfg, backend="hybrid", qp_kernel="pallas_full",
        repair_frac=1.0 / 85.0, ipm_iters=(4, 2), qp_warm=True,
        warm_chain=True)
    rng = np.random.default_rng(0)
    dx = jnp.asarray(np.array([-0.35, -0.4, 0.0, 0.0])
                     + rng.uniform(-0.02, 0.02, (FLB, 4)))
    try:
        res = run_cohort(dx)
        conv = float(np.mean(np.asarray(res.solver_converged)))
        print(json.dumps(dict(instances=FLB, ok=True, conv=round(conv, 5))),
              flush=True)
    except Exception as e:  # noqa: BLE001 — OOM classes vary by runtime
        print(json.dumps(dict(instances=FLB, ok=False,
                              error=repr(e)[:300])), flush=True)
        raise SystemExit(1)


if __name__ == "__main__":
    main()
