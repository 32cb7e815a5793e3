"""Step-response metrics: settling time, overshoot, tracking error, energy.

JAX/numpy re-implementations of the reference's analysis utilities
(ref: saved_data+plots/utilities/response_info.m, compute_ctrl_error.m,
compute_ctrl_energy.m, compute_overshoot.m, compute_ss_time.m). All are
vectorized over a leading batch axis so whole scenario sweeps aggregate on
device (psum across a mesh for global fleet statistics).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class ResponseInfo(NamedTuple):
    settling_time: jnp.ndarray   # time to stay within tol band of final value
    overshoot_pct: jnp.ndarray   # peak overshoot percentage
    ctrl_error: jnp.ndarray      # integral of squared tracking error
    ctrl_energy: jnp.ndarray     # integral of squared input
    final_error: jnp.ndarray     # |x - ref| at the end


def ctrl_error(x: jnp.ndarray, ref: jnp.ndarray, ts: float) -> jnp.ndarray:
    """Cumulative tracking error integral sum((x - ref)^2) * ts
    (ref: compute_ctrl_error.m:1-6)."""
    return jnp.sum((x - ref) ** 2, axis=-1) * ts


def ctrl_energy(u: jnp.ndarray, ts: float) -> jnp.ndarray:
    """Control energy integral sum(u^2) * ts (ref: compute_ctrl_energy.m:1-6)."""
    return jnp.sum(u**2, axis=-1) * ts


def overshoot_pct(x: jnp.ndarray, ref_final: jnp.ndarray) -> jnp.ndarray:
    """Peak overshoot percentage past the final reference
    (ref: compute_overshoot.m:1-3)."""
    x0 = x[..., 0]
    span = ref_final - x0
    span = jnp.where(jnp.abs(span) < 1e-12, 1e-12, span)
    peak = jnp.max((x - ref_final[..., None]) * jnp.sign(span)[..., None], axis=-1)
    return 100.0 * jnp.maximum(peak, 0.0) / jnp.abs(span)


def settling_time(
    x: jnp.ndarray, ref_final: jnp.ndarray, ts: float, tol: float = 0.02
) -> jnp.ndarray:
    """Time after which |x - ref| stays within tol * |x0 - ref| forever
    (ref: compute_ss_time.m:1-8, 2% band)."""
    x0 = x[..., 0]
    band = tol * jnp.maximum(jnp.abs(ref_final - x0), 1e-12)
    inside = jnp.abs(x - ref_final[..., None]) <= band[..., None]
    # last index where we were OUTSIDE the band
    T = x.shape[-1]
    idx = jnp.arange(T)
    last_out = jnp.max(jnp.where(~inside, idx, -1), axis=-1)
    return (last_out + 1) * ts


def response_info(
    x: jnp.ndarray, u: jnp.ndarray, ref: jnp.ndarray, ts: float
) -> ResponseInfo:
    """Full metric bundle for one output channel (batchable).

    x: (..., T) output trajectory; u: (..., T) input; ref: (..., T) reference.
    Ref: saved_data+plots/utilities/response_info.m:1-7.
    """
    ref_final = ref[..., -1]
    return ResponseInfo(
        settling_time=settling_time(x, ref_final, ts),
        overshoot_pct=overshoot_pct(x, ref_final),
        ctrl_error=ctrl_error(x, ref, ts),
        ctrl_energy=ctrl_energy(u, ts),
        final_error=jnp.abs(x[..., -1] - ref_final),
    )
