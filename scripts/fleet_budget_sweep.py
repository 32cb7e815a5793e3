"""Fleet HBM-budget bracket sweep (round-3 VERDICT item 7).

Probes the fused-cohort OOM boundary at 3-5 chunk sizes around the round-2
2-point anecdote ({8192 OK, 16384 fails}), each in its OWN subprocess so an
OOM or worker crash cannot kill the sweep. The measured bracket calibrates
`runtime/sharding.estimate_fleet_budget`'s per-lane live-set constant
(fused_kkt_copies) and the calibration test asserts the model reproduces the
boundary.

Round-4 ceiling probes (pallas_full backend, N=20/q=32/steps=10, one v5e):
  instances=chunk 262144 -> 724,796 closed-loop solves/s, OK
  instances=chunk 524288 -> 707,712 solves/s, OK
  instances=chunk 1048576 -> 691,852 solves/s, OK   (2^20 in ONE cohort)
  instances=chunk 2097152 -> RESOURCE_EXHAUSTED     (the real OOM point)
Model recalibrated to this bracket (sharding.py: staging factor 1.3,
validated_to=1048576); conv on these fused-only probes is 0.94 (the hybrid
repair restores 1.0 — the probes measure MEMORY, not the conv gate).

Usage: python scripts/fleet_budget_sweep.py [chunk ...]
"""

import json
import pathlib
import subprocess
import sys

REPO = pathlib.Path(__file__).parent.parent


def probe(chunk: int, instances: int = 131072, steps: int = 10,
          qp_kernel: str = "pallas_full") -> dict:
    # the FULL fleet context (round 2's bracket was measured with the whole
    # 131k-instance fleet's stacked outputs resident, not one lone cohort —
    # a single-cohort probe of chunk 16384 fits fine)
    cmd = [sys.executable, str(REPO / "examples" / "fleet_100k.py"),
           "--fused", "--backend", "fused", "--chunk", str(chunk),
           "--instances", str(instances), "--steps", str(steps),
           "--qp-kernel", qp_kernel]
    try:
        r = subprocess.run(cmd, capture_output=True, text=True, timeout=2400,
                           cwd=str(REPO))
    except subprocess.TimeoutExpired:
        return dict(chunk=chunk, ok=False, why="timeout")
    tail = (r.stdout + r.stderr)[-800:]
    oomish = any(s in tail for s in
                 ("RESOURCE_EXHAUSTED", "Out of memory", "OOM",
                  "Allocator", "UNAVAILABLE"))
    return dict(chunk=chunk, ok=(r.returncode == 0), rc=r.returncode,
                oom_marker=oomish, tail=tail.splitlines()[-3:])


def main():
    chunks = [int(c) for c in sys.argv[1:]] or [8192, 16384, 32768, 65536]
    results = []
    for c in sorted(chunks):
        res = probe(c)
        results.append(res)
        print(json.dumps(res), flush=True)
        if not res["ok"]:
            break  # larger chunks will also fail; don't hammer the worker
    ok = [r["chunk"] for r in results if r["ok"]]
    bad = [r["chunk"] for r in results if not r["ok"]]
    print(json.dumps(dict(largest_ok=max(ok) if ok else 0,
                          smallest_fail=min(bad) if bad else None)))


if __name__ == "__main__":
    main()
