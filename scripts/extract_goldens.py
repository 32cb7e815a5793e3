"""Extract golden DATA fixtures from the reference's .mat files.

Per the repo convention (CLAUDE.md): golden fixtures are DATA extracted from
the reference's saved trajectories (never code) — the analog of how the
reference itself ships term_set.mat. Round 1 extracted 22 fixtures by hand;
this script records the mapping and adds the oracle window-size sweep
(valid_qplots_LBMPC.m studied q in {10,50,100,200,500}; q in {50,200,500}
were previously smoke-tested only — VERDICT r1 missing item 7).
"""

import pathlib
import sys

import numpy as np
import scipy.io as sio

REF = pathlib.Path("/root/reference/matlab/LBMPC/saved_data+plots/data")
OUT = pathlib.Path(__file__).parent.parent / "tests" / "golden"


def main():
    for q in (50, 200, 500):
        src = REF / "casadi" / f"DMS_tLBMPC_q{q}.mat"
        dst = OUT / f"DMS_tLBMPC_q{q}.npy"
        xlo = np.asarray(sio.loadmat(src)["xlo"], float)
        np.save(dst, xlo)
        print(f"{dst.name}: {xlo.shape} from {src.name}")
    # pretrained q=500 run (hybrid variant with train_data preloaded)
    src = REF / "casadi" / "DMS_tLBMPC_q500_pretrained.mat"
    np.save(OUT / "DMS_tLBMPC_q500_pretrained.npy",
            np.asarray(sio.loadmat(src)["xlo"], float))
    # remaining solve-time sample files of the SURVEY §6 baseline table
    for name in ("intelCPU_solve_sample_full", "solve_sample_reg"):
        d = sio.loadmat(REF / "casadi" / f"{name}.mat")
        arr = np.vstack([d[f"solve_times_{i}"] for i in range(1, 6)])
        np.save(OUT / f"{name}.npy", arr)
        print(f"{name}.npy: {arr.shape}")
    # round 3 (VERDICT r2 item 4): the flagship q=10 run and the two orphan
    # artifacts no reference script touches (provenance analysis in
    # docs/PARITY.md "orphan artifacts")
    for name in ("DMS_tLBMPC_q10", "tLBMPC", "DMS_tLBMPC"):
        xlo = np.asarray(sio.loadmat(REF / "casadi" / f"{name}.mat")["xlo"], float)
        np.save(OUT / f"{name}.npy", xlo)
        print(f"{name}.npy: {xlo.shape}")


if __name__ == "__main__":
    main()
