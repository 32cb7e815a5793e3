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


def _decaying_history(T=200, seed=0, n=4):
    rng = np.random.default_rng(seed)
    t = np.arange(T)[:, None]
    x = np.exp(-t / 40.0) * (0.3 + 0.1 * rng.standard_normal((1, n)))
    u = 1.0 + np.exp(-t / 30.0) * 0.2
    return np.concatenate([x, u[:, :1]], axis=1)  # (T, n+1)


def test_overlay_histories_structure():
    """Overlay figure: one subplot per channel, one line per labeled run
    (+ the dotted zero reference), as in the reference comparison scripts."""
    from lbmpc_tpu.analysis.compare import overlay_histories

    hists = {"LBMPC": _decaying_history(seed=0), "LMPC": _decaying_history(seed=1)}
    fig = overlay_histories(hists, ts=0.01, refs=np.zeros(5))
    assert len(fig.axes) == 5
    for ax in fig.axes:
        assert len(ax.lines) == 3  # 2 runs + reference line
    # channel-major (sysH-style) input must give the identical figure shape
    fig2 = overlay_histories({k: v.T for k, v in hists.items()}, ts=0.01)
    assert len(fig2.axes) == 5
    import matplotlib.pyplot as plt

    plt.close("all")


def test_comparison_and_sweep_tables():
    from lbmpc_tpu.analysis.compare import comparison_table, sweep_table

    hists = {"LBMPC": _decaying_history(seed=0), "LMPC": _decaying_history(seed=1)}
    table = comparison_table(hists, ts=0.01)
    assert set(table) == {"LBMPC", "LMPC"}
    for row in table.values():
        assert set(row) == {"settling_time", "overshoot_pct", "ctrl_error",
                            "ctrl_energy", "final_error"}
        assert row["ctrl_error"] > 0 and row["final_error"] < 0.01
    sweep = sweep_table({50: _decaying_history(seed=2), 80: _decaying_history(seed=3)})
    assert set(sweep) == {"50", "80"}


def test_solve_stats_figure():
    """solve_stats.m protocol figure: CI band + histogram render and agree
    with SolveStats on the same samples."""
    from lbmpc_tpu.analysis.compare import solve_stats_figure

    rng = np.random.default_rng(0)
    samples = np.abs(rng.normal(0.115, 0.02, (5, 500)))
    fig, stats = solve_stats_figure(samples)
    assert len(fig.axes) == 2
    assert 110 < stats.mean_ms < 120
    assert len(fig.axes[0].collections) == 1  # the CI95 fill_between band
    import matplotlib.pyplot as plt

    plt.close("all")


def test_plot_response_golden_render(tmp_path):
    """plotRESPONSE-style figure renders to disk and draws every channel."""
    from lbmpc_tpu.analysis.plots import plot_response

    h = _decaying_history()
    out = tmp_path / "resp.png"
    fig = plot_response(h, ts=0.01, save_path=str(out))
    assert out.exists() and out.stat().st_size > 4000
    import matplotlib.pyplot as plt

    plt.close("all")
