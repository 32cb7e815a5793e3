"""Coverage smoke: every preset builds and runs a short episode."""

import dataclasses

import numpy as np
import pytest

from lbmpc_tpu.config import make_preset
from lbmpc_tpu.runtime.scenario import build_scenario

ALL_PRESETS = (
    [f"LMPC_N{n}" for n in (20, 40, 50, 60, 80, 100)]
    + [f"LBMPC_N{n}" for n in (20, 40, 50, 60, 80, 100)]
    + [f"NMPC_N{n}" for n in (20, 40, 50)]
    + [f"DMS_LBMPC_q{q}" for q in (10, 50, 100, 200, 500)]
    + ["DMS_LMPC"]
)


def test_all_presets_resolve():
    for name in ALL_PRESETS:
        cfg = make_preset(name)
        assert cfg.name == name


@pytest.mark.parametrize(
    "name", ["LMPC_N20", "LBMPC_N20", "NMPC_N20", "DMS_LBMPC_q50", "DMS_LMPC"]
)
def test_preset_short_episode(name):
    """One representative per family runs 3 steps without NaNs."""
    cfg = make_preset(name, iterations=3)
    # shrink horizons/windows to keep the smoke fast
    cfg = dataclasses.replace(
        cfg,
        ocp=dataclasses.replace(cfg.ocp, N=min(cfg.ocp.N, 12)),
        oracle=dataclasses.replace(cfg.oracle, q=8),
        solver=dataclasses.replace(cfg.solver, sqp_iters=1, ipm_iters=12),
    )
    sc = build_scenario(cfg)
    res = sc.run()
    sysH = np.asarray(res.sys_history)
    assert sysH.shape[0] == 4
    assert np.isfinite(sysH).all()
