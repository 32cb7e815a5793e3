"""Tracing / profiling: per-stage timers, the 5x500 protocol, jax profiler.

The reference's instrumentation is tic/toc around each solve accumulated into
solve_times arrays (ref: examples/DMS_LBMPC_casadi.m:168-190) analyzed by
solve_stats.m. Here: a structured stage timer for host-side phases, the same
5-runs x N-iterations measurement protocol against the batched device solvers,
and a thin wrapper over the JAX profiler for device traces.
"""

from __future__ import annotations

import collections
import contextlib
import time
from typing import Callable

import numpy as np

from lbmpc_tpu.analysis.solve_stats import SolveStats, measure_batched_solver


class StageTimer:
    """Accumulates wall time per named stage (host-side tic/toc)."""

    def __init__(self):
        self.totals: dict[str, float] = collections.defaultdict(float)
        self.counts: dict[str, int] = collections.defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.totals[name] += time.perf_counter() - t0
            self.counts[name] += 1

    def summary(self) -> dict[str, dict[str, float]]:
        return {
            k: {"total_s": self.totals[k], "count": self.counts[k],
                "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
            for k in self.totals
        }


def solve_time_protocol(
    fn: Callable, args, runs: int = 5, iters: int = 25
) -> tuple[SolveStats, np.ndarray]:
    """The reference's repeated-runs protocol (solve_stats.m: 5 x 500) applied
    to a batched device solver: `runs` independent measurement series of
    `iters` calls each; returns pooled stats + the (runs, iters) samples."""
    series = []
    for _ in range(runs):
        series.append(measure_batched_solver(fn, args, reps=iters, warmup=1))
    samples = np.stack(series)
    return SolveStats.from_samples(samples), samples


@contextlib.contextmanager
def device_trace(logdir: str):
    """JAX profiler trace (TensorBoard-compatible) around a code region."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
