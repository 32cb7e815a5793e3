"""Test configuration: CPU mesh emulation + float64.

Multi-chip sharding is tested on a virtual 8-device CPU mesh
(xla_force_host_platform_device_count), per the reference-framework test
strategy in SURVEY.md §4. Real-TPU benchmarking happens in bench.py, not here.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import jax

# The environment's sitecustomize registers an `axon` TPU backend and forces
# jax_platforms to "axon,cpu"; tests run on the virtual 8-device CPU mesh.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache (r5): the interpret-mode Pallas kernel tests
# (mono/pallas_full at N=12) cost multi-minute XLA:CPU compiles; caching
# makes every suite run after the first pay only execution. Same directory
# the bench/chip scripts use; entries are keyed by backend + HLO so CPU and
# TPU artifacts coexist.
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".cache", "jax"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import pathlib

import numpy as np
import pytest

GOLDEN = pathlib.Path(__file__).parent / "golden"


@pytest.fixture(scope="session")
def golden():
    """Loader for reference golden data fixtures."""

    def load(name):
        p_npz = GOLDEN / f"{name}.npz"
        p_npy = GOLDEN / f"{name}.npy"
        if p_npz.exists():
            return dict(np.load(p_npz))
        return np.load(p_npy)

    return load
