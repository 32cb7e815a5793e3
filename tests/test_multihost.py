"""Two-process jax.distributed smoke test (VERDICT r1 item 8).

Actually executes runtime/sharding.initialize_multihost — the
jax.distributed.initialize code path that is otherwise reachable only on a
pod — with a coordinator + worker pair of CPU-backend subprocesses on this
host, then runs a cross-process psum (global_solve_stats) over a
process-spanning mesh. Subprocesses keep the distributed runtime out of the
test process itself (it would poison every later jit in the suite).

Reference analog: none (SURVEY.md §2.3 — the reference is single-threaded);
this validates BASELINE config 5's multi-host plumbing at the smallest scale.
"""

import os
import pathlib
import socket
import subprocess
import sys

import pytest

_WORKER = r"""
import os, sys
os.environ.pop("XLA_FLAGS", None)     # one local CPU device per process
import jax
jax.config.update("jax_platforms", "cpu")
pid, port = int(sys.argv[1]), sys.argv[2]
from lbmpc_tpu.runtime.sharding import (global_solve_stats,
                                        initialize_multihost, scenario_mesh)
initialize_multihost(coordinator_address=f"localhost:{port}",
                     num_processes=2, process_id=pid)
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
assert jax.process_count() == 2, jax.process_count()
assert len(jax.devices()) == 2          # global view spans both processes
mesh = scenario_mesh()
# each process contributes 4 scenario flags, 2 of them converged
conv_local = np.asarray([True, False, True, False])
garr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("scenario")), conv_local)
n_conv, n_tot = global_solve_stats(mesh, garr)
print("RESULT", int(n_conv), int(n_tot), jax.process_count(), flush=True)
"""


def test_two_process_distributed_psum(tmp_path):
    worker = tmp_path / "mh_worker.py"
    worker.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    repo = str(pathlib.Path(__file__).parent.parent)
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, str(worker), str(i), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True, env=env, cwd=repo)
        for i in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=180)
            outs.append(out)
            assert p.returncode == 0, out[-2000:]
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for out in outs:
        lines = [l for l in out.splitlines() if l.startswith("RESULT")]
        assert lines, out[-2000:]
        # 2 converged per process x 2 processes = 4 of 8, seen identically
        # on both hosts (psum is a global reduction)
        assert lines[0].split() == ["RESULT", "4", "8", "2"], out[-2000:]
