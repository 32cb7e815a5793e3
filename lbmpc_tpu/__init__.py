"""lbmpc_tpu — a TPU-native learning-based MPC (LBMPC) engine.

A ground-up JAX/XLA/Pallas re-design of the capabilities of the reference
MATLAB codebase bevanda/Learning-Based-MPC (Moore-Greitzer compressor LBMPC):

- ``models``      — plant library: continuous MGCM ODE, RK4/RK23 integrators,
                    exact DLTI discretization (reference: matlab/LBMPC/models/).
- ``synthesis``   — OCP matrix factory: pole placement, DLQR, DARE, steady-state
                    null-space parametrization (reference: functions/matOCP.m).
- ``sets``        — polytopic set toolchain: H-rep ops, Pontryagin difference,
                    MPIS/mRPIS/ROA, terminal sets (reference: MPT3+linprog layer).
- ``ops``         — batched device kernels: dense Mehrotra IPM QP/LP, Riccati,
                    Nadaraya-Watson oracle matmuls, Pallas kernels.
- ``controllers`` — LMPC / LBMPC / NMPC receding-horizon controllers
                    (reference: functions/ocp*.m + examples/*casadi.m).
- ``runtime``     — closed-loop `lax.scan` harness, scenario batching via vmap,
                    multi-chip sharding via Mesh/shard_map, metrics, checkpoints.
- ``analysis``    — response metrics and solve-time statistics
                    (reference: saved_data+plots/).

Unlike the reference (single-threaded MATLAB + fmincon/IPOPT), everything in the
hot path is jit-compiled, statically shaped, batched over scenarios, and sharded
over TPU meshes.
"""

from lbmpc_tpu import models, synthesis, sets, ops, controllers, runtime, analysis
from lbmpc_tpu.config import (
    MGCMConfig,
    OCPConfig,
    SolverConfig,
    make_preset,
)

__version__ = "0.1.0"
