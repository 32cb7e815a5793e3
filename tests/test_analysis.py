"""Analysis-layer tests: response metrics + solve-stat protocol."""

import numpy as np

import jax.numpy as jnp

from lbmpc_tpu.analysis.metrics import response_info, settling_time
from lbmpc_tpu.analysis.solve_stats import SolveStats


def test_response_info_first_order_step():
    """Analytic first-order step response: known settling time and zero overshoot."""
    ts = 0.01
    tau = 0.1
    t = np.arange(0, 2.0, ts)
    x = 1.0 - np.exp(-t / tau)
    u = np.ones_like(t)
    ref = np.ones_like(t)
    info = response_info(jnp.asarray(x), jnp.asarray(u), jnp.asarray(ref), ts)
    # 2% settling of first-order system: t = tau * ln(50) ~ 0.391
    assert abs(float(info.settling_time) - tau * np.log(50)) < 0.02
    assert float(info.overshoot_pct) < 1e-9
    assert abs(float(info.ctrl_energy) - 2.0) < 0.02  # sum(1^2)*ts over 2s


def test_overshoot_detected():
    ts = 0.01
    t = np.arange(0, 1.0, ts)
    x = 1.0 - np.exp(-t / 0.1) * np.cos(20 * t)  # underdamped: peaks above 1
    ref = np.ones_like(t)
    info = response_info(jnp.asarray(x), jnp.asarray(x), jnp.asarray(ref), ts)
    assert float(info.overshoot_pct) > 5.0


def test_settling_batched():
    ts = 0.1
    x = jnp.asarray(np.stack([np.linspace(0, 1, 50), np.ones(50)]))
    ref_final = jnp.asarray([1.0, 1.0])
    st = settling_time(x, ref_final, ts)
    assert st.shape == (2,)
    assert float(st[1]) == 0.0
    assert float(st[0]) > 3.0


def test_solve_stats_protocol():
    rng = np.random.default_rng(0)
    samples = np.abs(rng.normal(0.115, 0.02, (5, 500)))  # the 5x500 protocol
    st = SolveStats.from_samples(samples)
    assert 110 < st.mean_ms < 120
    assert st.ci95_ms[0] < st.mean_ms < st.ci95_ms[1]
    assert st.violates_budget(10.0)  # reference misses its RT budget
    assert not st.violates_budget(1000.0)
