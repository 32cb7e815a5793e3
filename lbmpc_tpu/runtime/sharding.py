"""Multi-chip scaling: scenario-axis sharding over a device mesh.

The reference is a single-threaded MATLAB process (SURVEY.md §2.3: no
parallelism of any kind); the TPU-native scaling model is:

  - `vmap` over scenarios within a chip (batched IPM/SQP — MXU batching);
  - a 1-D (or 2-D host x chip) `jax.sharding.Mesh` over the scenario axis,
    with `NamedSharding(P("scenario"))` on every per-scenario array — XLA
    partitions the whole closed-loop scan without code changes;
  - cross-chip reductions (solve statistics, convergence votes, failure
    masks) via `shard_map` + `psum` riding ICI.

100k+ concurrent receding-horizon instances = (hosts x chips) * per-chip batch,
exactly BASELINE.json config 5.
"""

from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Join the jax distributed runtime for multi-host pods.

    On cloud TPU pods the arguments auto-detect from the environment; after
    this, `jax.devices()` spans every host and `scenario_mesh()` builds a
    global mesh whose scenario axis crosses DCN while each host's shard stays
    on its local chips (XLA routes the psum reductions hierarchically:
    ICI within a slice, DCN across slices).
    """
    import jax

    # must not touch the backend before initialize (jax.process_count()
    # would initialise XLA and make distributed init impossible — caught by
    # tests/test_multihost.py); the public probe does not
    if jax.distributed.is_initialized():
        return  # already initialized
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def scenario_mesh(n_devices: int | None = None, axis: str = "scenario") -> Mesh:
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def shard_scenarios(mesh: Mesh, tree, axis: str = "scenario"):
    """Place every array in `tree` with its leading axis sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))
    return jax.tree.map(put, tree)


def sharded_episode_runner(episode_fn: Callable, mesh: Mesh, axis: str = "scenario"):
    """jit a vmapped episode with scenario-sharded inputs/outputs.

    episode_fn: (dx_init,) -> ClosedLoopResult (single scenario).
    Returns runner(batch_dx) with batch dimension sharded across the mesh;
    XLA runs each shard's scan locally — zero cross-chip traffic in the loop,
    collectives only in the stats reduction below.
    """
    batched = jax.vmap(episode_fn)
    shard = NamedSharding(mesh, P(axis))

    @functools.partial(jax.jit, in_shardings=(shard,))
    def run(batch_dx):
        return batched(batch_dx)

    return run


def fleet_runner(episode_fn: Callable, mesh: Mesh, chunk: int,
                 axis: str = "scenario"):
    """Driver for very large fleets (BASELINE config 5: 100k+ concurrent
    receding-horizon instances): cohorts of `chunk` scenarios stay resident
    on the mesh while a jitted lax.scan sweeps the fleet through them, so
    arbitrary fleet sizes run at the device's peak batch without re-dispatch.

    episode_fn: (dx_init,) -> ClosedLoopResult (single scenario).
    Returns run(dx_all (F, n)) -> ClosedLoopResult with leading axis F;
    F must be a multiple of `chunk` (pad with copies if needed). The chunk
    axis is sharded over the mesh; on a multi-host mesh each host keeps its
    shard local and only the stats reductions cross DCN.
    """
    batched = jax.vmap(episode_fn)
    shard = NamedSharding(mesh, P(None, axis))

    @functools.partial(jax.jit, in_shardings=(shard,))
    def run(dx_chunks):
        def body(_, dx):
            return None, batched(dx)

        _, results = jax.lax.scan(body, None, dx_chunks)
        return results

    def run_fleet(dx_all):
        F, n = dx_all.shape
        if F % chunk:
            raise ValueError(f"fleet size {F} not a multiple of chunk {chunk}")
        res = run(dx_all.reshape(F // chunk, chunk, n))
        return jax.tree.map(lambda a: a.reshape((F,) + a.shape[2:]), res)

    return run_fleet


def estimate_fleet_budget(
    *,
    n: int,
    m: int,
    nth: int,
    N: int,
    q: int,
    iterations: int,
    fleet: int,
    d_in: int = 3,
    d_out: int = 4,
    history_bytes: int = 4,
    work_bytes: int = 4,
    hbm_bytes: int = 16 << 30,   # v5e: 16 GiB per chip
    safety: float = 2.5,
    mI: int | None = None,
    fused_kkt_copies: float = 33.0,
    backend: str = "fused_xla",
    warm_chain: bool = False,
) -> dict:
    """HBM budget model for fleet episodes (ROADMAP coverage item 6).

    Two resident terms on each chip:
      - fleet outputs: lax.scan stacks every cohort's ClosedLoopResult, so the
        WHOLE fleet's histories live in HBM at once —
        iterations * (n + 2m + 1) numbers per instance (sys/art/conv logs);
      - cohort working set: per-lane solver live set. For the XLA-composed
        fused backend (backend="fused_xla") it is dominated by the QP's
        per-lane KKT intermediates — the D-scaled constraint stack (mI x nz)
        and its XLA temporaries/double-buffers, `fused_kkt_copies` of them —
        plus the Gauss-Newton Jacobian (ne x nz), (nz x nz) factor buffers,
        and the oracle window. For the round-3 all-Pallas backend
        (backend="pallas_full") the KKT/Jacobian intermediates never leave
        VMEM; only the kernel I/O staging survives in HBM (packed H, e, g,
        h rows, window), ~6 buffered copies.

    `safety` covers fragmentation. Calibration (one real v5e chip, f32,
    N=20, mI=214):
      - fused_xla (2026-08-21 r2, q=32): the 131072-instance fleet runs at
        chunk 8192 and FAILS (TPU OOM-class error) at chunk 16384;
        fused_kkt_copies=33 places max_chunk exactly at the validated 8192
        (~600 KB/lane). A LONE cohort of 16384 fits (round-3 re-probe) —
        the boundary belongs to the full-fleet context, which this model
        describes.
      - pallas_full (r3 sweep + r4 ceiling probes, q=32): chunks {32768,
        65536, 131072, 262144, 524288, 1048576} ALL run — including the
        WHOLE fleet as one cohort at every size up to 2^20 — and 2097152
        fails with RESOURCE_EXHAUSTED (the first real OOM point for this
        backend). The 1.3 staging-copy factor places max_chunk exactly at
        the validated 2^20 and refuses 2^21 (measured per-lane footprint
        ~5.6 KB at this shape, not the r3 ~22 KB estimate).

    Returns dict with per_instance_out, per_lane_work (bytes), fleet_out,
    max_chunk (largest power of two whose cohort fits beside the outputs;
    0 if the outputs alone bust the budget) and fits (bool).
    """
    nz = N * m + nth
    ne = (N - 2) * (n + m) + n + n          # fmincon residual stack
    mI_guess = mI if mI is not None else 30 * N + 640
    per_instance_out = iterations * (n + 2 * m + 1) * history_bytes
    if backend == "pallas_full":
        # staging-copy factor 1.3: calibrated on the r4 measured bracket
        # {1048576 instances in ONE cohort OK, 2097152 RESOURCE_EXHAUSTED}
        # (fleet probes 2026-08-21, N=20/q=32/steps=10) — the model's
        # max_chunk lands exactly on the validated 2^20 and refuses 2^21
        per_lane_work = work_bytes * (
            1.3 * (nz * nz + mI_guess + ne)   # packed H + h + e staging
            + q * (d_in + d_out + 1)          # oracle window
            + 8 * nz                          # z/g/d vectors
        )
        if warm_chain:
            # r5 cross-step chain: the scan carry holds the QP kernel's
            # interior state (4 mI-row f32 arrays). MEASURED
            # (scripts/fleet_chain_ceiling.py, N=20/q=32/steps=10, chain
            # (4,2)): cohorts {2^18, 2^19, 2^20} all run at conv 1.0 and
            # 2^21 fails (the remote compile helper dies at that size; the
            # r4 non-chain probe recorded runtime RESOURCE_EXHAUSTED at
            # the same boundary) — the SAME bracket as the non-chain path.
            # XLA
            # donates the scan carry in place, so the naive "+4 mI arrays
            # double-buffered" (~26 KB/lane, which would have capped the
            # cohort at ~2^18) never becomes resident; only one carry copy
            # peaks during the in-place update, already inside the 1.3
            # staging factor's envelope. Small explicit term so chain
            # budgets stay conservative without moving max_chunk off the
            # measured 2^20.
            per_lane_work += work_bytes * 0.1 * mI_guess
    else:
        per_lane_work = work_bytes * (
            fused_kkt_copies * mI_guess * nz   # D-scaled stack + XLA temps
            + ne * nz                 # J
            + 4 * nz * nz             # Hb + M + L + equilibrated copy
            + 2 * mI_guess            # h rows + slack/dual vectors
            + q * (d_in + d_out + 1)  # oracle window
            + 4 * ne                  # residual + merit temporaries
        )
    fleet_out = fleet * per_instance_out
    avail = hbm_bytes / safety - fleet_out
    max_chunk = 0
    if avail > per_lane_work:
        max_chunk = 1 << int(np.floor(np.log2(avail / per_lane_work)))
    return dict(
        per_instance_out=per_instance_out,
        per_lane_work=per_lane_work,
        fleet_out=fleet_out,
        max_chunk=max_chunk,
        fits=max_chunk >= 1,
        # largest chunk empirically validated for this backend's calibration
        # config; model predictions beyond it are extrapolation. pallas_full:
        # r4 bracket {2^20 OK (one cohort, 691,852 closed-loop solves/s),
        # 2^21 RESOURCE_EXHAUSTED} — a real OOM boundary, not a non-failure
        validated_to=1048576 if backend == "pallas_full" else 8192,
    )


def global_solve_stats(mesh: Mesh, converged: jax.Array, axis: str = "scenario"):
    """Cross-chip reduction of per-scenario convergence flags via psum.

    Returns (n_converged, n_total) replicated on every device — the batched
    equivalent of the reference's per-run solve bookkeeping
    (ref: examples/DMS_LBMPC_casadi.m:186-190 solve_times collection).
    """
    from jax import shard_map

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=P(axis),
        out_specs=P(),
    )
    def reduce_stats(conv_local):
        n_conv = jax.lax.psum(jnp.sum(conv_local.astype(jnp.int32)), axis)
        n_tot = jax.lax.psum(jnp.asarray(conv_local.shape[0], jnp.int32), axis)
        return jnp.stack([n_conv, n_tot])

    out = reduce_stats(converged)
    return int(out[0]), int(out[1])
