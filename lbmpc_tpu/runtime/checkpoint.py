"""Checkpoint / resume for long scenario sweeps.

The reference's closest analogs: workspace .mat snapshots
(ref: examples/DSS_NMPC.m:1-5) and the cached terminal set
(ref: functions/getCONS.m:56-58). Here: versioned npz snapshots of the full
closed-loop carry state — plant states, oracle windows, warm starts, step
index — so a 100k-scenario sweep survives preemption mid-episode.

The format is dependency-free npz (single-host durability, like the
reference's .mat snapshots). For sharded fleets, `capture`/`resume` operate
on the addressable (host-local) shard: resume re-shards via
`shard_scenarios`, so a mesh-sharded cohort round-trips to f64 roundoff
(tests/test_runtime.py::test_sharded_fleet_checkpoint_resume).
"""

from __future__ import annotations

import dataclasses
import functools
import json
import pathlib
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

FORMAT_VERSION = 1


@dataclasses.dataclass
class EpisodeState:
    """Resumable mid-episode state (batched over scenarios)."""

    step: int
    x_abs: np.ndarray            # (B, n) plant states
    window_X: np.ndarray         # (B, q, d_in)
    window_Y: np.ndarray         # (B, q, d_out)
    window_valid: np.ndarray     # (B, q)
    window_count: np.ndarray     # (B,)
    z_warm: np.ndarray           # (B, nz)
    rng_key: np.ndarray | None = None


def save(path, state: EpisodeState, meta: dict[str, Any] | None = None) -> None:
    path = pathlib.Path(path)
    path.parent.mkdir(parents=True, exist_ok=True)
    np.savez_compressed(
        path,
        format_version=FORMAT_VERSION,
        step=state.step,
        x_abs=np.asarray(state.x_abs),
        window_X=np.asarray(state.window_X),
        window_Y=np.asarray(state.window_Y),
        window_valid=np.asarray(state.window_valid),
        window_count=np.asarray(state.window_count),
        z_warm=np.asarray(state.z_warm),
        rng_key=np.asarray(state.rng_key) if state.rng_key is not None else np.zeros(0),
        meta=json.dumps(meta or {}),
    )


def capture(result, step: int) -> EpisodeState:
    """EpisodeState from a finished (partial) episode's ClosedLoopResult.

    The result carries the exact resume tuple (final_x, final_window,
    final_z — runtime/closed_loop.py); `step` records how many steps the
    episode has advanced. Works for single and batched results alike.
    """
    w = result.final_window
    return EpisodeState(
        step=step,
        x_abs=np.asarray(result.final_x),
        window_X=np.asarray(w.X),
        window_Y=np.asarray(w.Y),
        window_valid=np.asarray(w.valid),
        window_count=np.asarray(w.count),
        z_warm=np.asarray(result.final_z),
    )


def resume(scenario, state: EpisodeState, steps: int, mesh=None):
    """Continue an episode from a checkpoint (VERDICT r1 item 9).

    Rebuilds the scan carry (plant state, oracle window, warm start) from
    `state` and runs `steps` further closed-loop steps through the
    scenario's jitted episode — interrupted-then-resumed is bit-identical to
    uninterrupted (tests/test_runtime.py). Batched checkpoints (leading
    scenario axis on x_abs, captured from run_batch / a fleet cohort) resume
    through a vmapped episode; pass `mesh` to re-shard the batch over a
    scenario mesh first (sharded fleet resume,
    tests/test_runtime.py::test_sharded_fleet_checkpoint_resume). The
    reference's closest analog is artifact reuse (term_set.mat,
    functions/getCONS.m:56-58); mid-episode resume has no reference
    counterpart.
    """
    from lbmpc_tpu.oracle import DataWindow

    x_wp = np.asarray(scenario.cfg.plant.x_wp)
    window = DataWindow(
        X=jnp.asarray(state.window_X),
        Y=jnp.asarray(state.window_Y),
        valid=jnp.asarray(state.window_valid),
        count=jnp.asarray(state.window_count),
    )
    dx = jnp.asarray(state.x_abs) - x_wp
    z = jnp.asarray(state.z_warm)
    batched = np.asarray(state.x_abs).ndim > 1
    if mesh is not None:
        from lbmpc_tpu.runtime.sharding import shard_scenarios

        if not batched:
            raise ValueError("mesh resume requires a batched checkpoint")
        dx, window, z = shard_scenarios(mesh, (dx, window, z))
    if batched:
        run = jax.vmap(functools.partial(scenario.episode_from, steps=steps))
        return run(dx, window, z)
    return scenario.episode_from(dx, window, z, steps=steps)


def load(path) -> tuple[EpisodeState, dict[str, Any]]:
    d = np.load(path, allow_pickle=False)
    ver = int(d["format_version"])
    if ver != FORMAT_VERSION:
        raise ValueError(f"checkpoint format {ver} != {FORMAT_VERSION}")
    rng = d["rng_key"]
    state = EpisodeState(
        step=int(d["step"]),
        x_abs=d["x_abs"],
        window_X=d["window_X"],
        window_Y=d["window_Y"],
        window_valid=d["window_valid"],
        window_count=d["window_count"],
        z_warm=d["z_warm"],
        rng_key=rng if rng.size else None,
    )
    return state, json.loads(str(d["meta"]))
