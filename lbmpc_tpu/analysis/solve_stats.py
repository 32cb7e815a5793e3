"""Solve-time statistics: the reference's 5x500 measurement protocol.

Ref: saved_data+plots/solve_stats.m — 5 repeated runs of 500 MPC iterations,
mean solve time with 95% t-confidence intervals, histogram/normal fit. Here
the same analysis over wall-clock samples of batched device solves, plus the
throughput accounting the reference never needed (solves/s across a batch).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SolveStats:
    mean_ms: float
    median_ms: float
    p99_ms: float
    max_ms: float
    ci95_ms: tuple[float, float]
    n: int

    @classmethod
    def from_samples(cls, seconds: np.ndarray) -> "SolveStats":
        """seconds: (runs, iters) or flat array of per-solve wall times."""
        import scipy.stats

        s = np.asarray(seconds, float).ravel() * 1e3
        mean = float(np.mean(s))
        sem = scipy.stats.sem(s)
        lo, hi = scipy.stats.t.interval(0.95, len(s) - 1, loc=mean, scale=max(sem, 1e-12))
        return cls(
            mean_ms=mean,
            median_ms=float(np.median(s)),
            p99_ms=float(np.percentile(s, 99)),
            max_ms=float(np.max(s)),
            ci95_ms=(float(lo), float(hi)),
            n=len(s),
        )

    def violates_budget(self, budget_ms: float = 10.0) -> bool:
        """The reference's own real-time check: Ts = 10 ms per step
        (it misses this by 10-40x — BASELINE.md)."""
        return self.p99_ms > budget_ms


def measure_batched_solver(fn, args, reps: int = 25, warmup: int = 2) -> np.ndarray:
    """Wall-time samples for repeated calls of a jitted batched solver.

    NOTE (axon backend): jax.block_until_ready does not reliably block on the
    remote-TPU tunnel; completion is forced by a host transfer of one output
    element. Returns seconds per call, shape (reps,).
    """
    import time

    import numpy as np

    def force(out):
        leaf = out[0] if isinstance(out, tuple) else out
        np.asarray(leaf).ravel()[:1]

    for _ in range(warmup):
        force(fn(*args))
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        force(fn(*args))
        samples.append(time.perf_counter() - t0)
    return np.asarray(samples)
