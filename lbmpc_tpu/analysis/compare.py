"""Trajectory comparison suite: the reference's overlay-plot scripts as code.

Re-designs the eight comparison scripts of the reference's analysis layer
(ref: saved_data+plots/compare.m:3-24, plot_all.m, LMPCvsLBMPC.m:4-60,
NMPCvsLBMPC.m, horizonsLBMPC.m:4-17, plots_LBMPC.m, valid_qplots_LBMPC.m,
validation_plots_LBMPC.m) as parameterized functions over labeled history
dicts instead of copy-pasted per-figure scripts. Each reference script is one
call:

  compare.m / plot_all.m / LMPCvsLBMPC.m / NMPCvsLBMPC.m
      -> overlay_histories({"LBMPC": h1, "LMPC": h2, "NMPC": h3}, ts)
  horizonsLBMPC.m / plots_LBMPC.m
      -> overlay_histories({f"N={N}": h for N, h in ...})  (horizon sweep)
  valid_qplots_LBMPC.m / validation_plots_LBMPC.m
      -> overlay_histories({f"q={q}": h ...})              (window sweep)
  the response_info tables those scripts print
      -> comparison_table(histories, ts)
  solve_stats.m:9-30 mean/CI95 + histfit figure
      -> solve_stats_figure(samples_s)

Histories are (T, n+m) arrays ([states; input] columns, the reference's sysH
layout transposed) or ClosedLoopResult-like objects with .x (T, n) and
.u (T, m).
"""

from __future__ import annotations

import numpy as np

from lbmpc_tpu.analysis.metrics import response_info
from lbmpc_tpu.analysis.solve_stats import SolveStats


def _as_history(h) -> np.ndarray:
    """Normalize a history to (T, channels) float array."""
    if hasattr(h, "x") and hasattr(h, "u"):
        x = np.asarray(h.x, float)
        u = np.asarray(h.u, float)
        if u.ndim == 1:
            u = u[:, None]
        T = min(x.shape[0], u.shape[0])
        return np.concatenate([x[:T], u[:T]], axis=1)
    a = np.asarray(h, float)
    if a.ndim != 2:
        raise ValueError(f"history must be 2-D, got shape {a.shape}")
    # reference stores channel-major sysH (n+m, T); accept either orientation
    if a.shape[0] < a.shape[1]:
        a = a.T
    return a


def overlay_histories(histories: dict, ts: float = 0.01, channel_labels=None,
                      refs=None, save_path=None):
    """Per-channel overlay of several labeled closed-loop histories.

    The generic form of the reference's comparison figures: one subplot per
    channel, one line per controller/config, dotted zero-reference line
    (ref: compare.m:8-23 subplot/plot loop, LMPCvsLBMPC.m:12-60,
    horizonsLBMPC.m:14-22).

    refs: optional (channels,) or (channels, T) reference values drawn dotted.
    Returns the matplotlib figure.
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    hs = {label: _as_history(h) for label, h in histories.items()}
    ch = max(h.shape[1] for h in hs.values())
    fig, axes = plt.subplots(ch, 1, figsize=(8, 2 * ch), sharex=True, squeeze=False)
    axes = axes[:, 0]
    styles = ["-", "-.", "--", ":", "-", "-."]
    for i in range(ch):
        ax = axes[i]
        for k, (label, h) in enumerate(hs.items()):
            if i >= h.shape[1]:
                continue
            t = ts * np.arange(h.shape[0])
            ax.plot(t, h[:, i], styles[k % len(styles)], lw=1.5, label=label)
        if refs is not None:
            r = np.asarray(refs, float)
            rline = np.full(h.shape[0], r[i]) if r.ndim == 1 else r[i]
            ax.plot(ts * np.arange(len(rline)), rline, ":", lw=1.0, color="k")
        ax.grid(True)
        ax.set_ylabel(
            channel_labels[i] if channel_labels
            else (f"x{i + 1}" if i < ch - 1 else "u")
        )
    axes[0].legend(loc="best", fontsize=8)
    axes[-1].set_xlabel("time [s]")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig


def comparison_table(histories: dict, ts: float = 0.01, channel: int = 0,
                     ref_value: float = 0.0) -> dict:
    """Response-metric table across labeled runs, for one output channel.

    The numbers the reference's comparison scripts eyeball from the overlay
    figures (and response_info.m computes): settling time, overshoot,
    cumulative tracking error, control energy, final error
    (ref: saved_data+plots/utilities/response_info.m:1-7 applied per
    controller in the LMPCvsLBMPC/NMPCvsLBMPC analyses).
    """
    out = {}
    for label, h in histories.items():
        a = _as_history(h)
        x = a[:, channel]
        u = a[:, -1]
        ref = np.full_like(x, ref_value)
        info = response_info(x, u, ref, ts)
        out[label] = {k: float(np.asarray(v)) for k, v in info._asdict().items()}
    return out


def sweep_table(histories_by_param: dict, ts: float = 0.01, channel: int = 0,
                ref_value: float = 0.0) -> dict:
    """Metric table for a parameter sweep (horizon N or window size q).

    Ref: horizonsLBMPC.m:4-7 (N in {50,60,80}), valid_qplots_LBMPC.m
    (q in {10,50,100,200,500}) — the sweeps the reference plots; here also
    quantified per sweep point.
    """
    return comparison_table(
        {str(k): v for k, v in histories_by_param.items()}, ts, channel, ref_value
    )


def solve_stats_figure(samples_s, save_path=None):
    """Mean solve time with 95% CI band over iterations + histogram/normal fit.

    Ref: saved_data+plots/solve_stats.m:9-30 (per-iteration mean across the 5
    runs with t-CI95 shading) and :106-116 (histfit). samples_s: (runs, iters)
    seconds. Returns (figure, SolveStats).
    """
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    import scipy.stats

    s = np.atleast_2d(np.asarray(samples_s, float)) * 1e3  # ms
    runs, iters = s.shape
    stats = SolveStats.from_samples(samples_s)

    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(11, 4))
    mean_t = s.mean(axis=0)
    ax1.plot(mean_t, lw=1.0, label="mean solve time")
    if runs > 1:
        sem = scipy.stats.sem(s, axis=0)
        tcrit = scipy.stats.t.ppf(0.975, runs - 1)
        ax1.fill_between(np.arange(iters), mean_t - tcrit * sem,
                         mean_t + tcrit * sem, alpha=0.3, label="95% CI")
    ax1.set_xlabel("MPC iteration")
    ax1.set_ylabel("solve time [ms]")
    ax1.grid(True)
    ax1.legend(fontsize=8)

    flat = s.ravel()
    ax2.hist(flat, bins=min(40, max(10, len(flat) // 25)), density=True,
             alpha=0.6)
    mu, sd = float(flat.mean()), float(flat.std())
    grid = np.linspace(flat.min(), flat.max(), 200)
    if sd > 0:
        ax2.plot(grid, scipy.stats.norm.pdf(grid, mu, sd), lw=1.5,
                 label="normal fit")
        ax2.legend(fontsize=8)
    ax2.set_xlabel("solve time [ms]")
    ax2.grid(True)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=120)
        plt.close(fig)
    return fig, stats
