"""Deck-measurement processing time: ours vs the executed reference chain.

BASELINE.md carries the reference's committed "Mean Time 18.70 s per case"
(Partsize-identical/evaluation_results.csv, voxel-0.02 hyperparameter row)
for the W/L identification chain. The b1/b2/b7 input crops behind that CSV
are NOT committed, so a same-data comparison is impossible; what IS possible
on this box is a SAME-SCAN, SAME-HYPERPARAMETER, SAME-HARDWARE head-to-head:
run `process_bridge_deck` with the exact voxel-0.02 CSV hyperparameters (our
defaults, WL_iden.py:365-430 parity) on the reference's two committed real
deck scans, through both our chain (`measure/wl_iden.py`, native C++ grid
membership + vectorized numpy) and the reference's own WL_iden.py executed
in-process (the same import recipe as tests/test_reference_parity.py, which
proves the outputs bitwise-identical). Host-only CPU work — run solo and
report min-of-reps (CLAUDE.md run-to-run variance note).

Writes benchmark_results/measure_timing.json.

Usage: python -m pointcloud_bridge_tpu.bench.measure_timing [reps]
"""

from __future__ import annotations

import importlib.util
import json
import os
import sys
import time
import types

import numpy as np

REF_DIR = "/root/reference/Partsize-identical"
DECKS = [
    os.path.join(REF_DIR, "output-deck.las"),
    os.path.join(REF_DIR, "output-deck-test.las"),
]


def _load_reference_wl():
    # stub the laspy-dependent reader WL_iden.py imports at module top level
    stub_pkg = types.ModuleType("tool_utils")
    stub_mod = types.ModuleType("tool_utils.load_las")
    stub_mod.read_las_file = lambda p: None
    stub_pkg.load_las = stub_mod
    sys.modules.setdefault("tool_utils", stub_pkg)
    sys.modules.setdefault("tool_utils.load_las", stub_mod)
    sys.path.insert(0, REF_DIR)
    try:
        spec = importlib.util.spec_from_file_location(
            "ref_wl_iden", os.path.join(REF_DIR, "WL_iden.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REF_DIR)


def main(reps: int = 3) -> None:
    from ..data.lasio import read_las
    from .. import measure as M

    ref_wl = _load_reference_wl()
    rows = {}
    for path in DECKS:
        name = os.path.basename(path)
        pts = read_las(path).xyz
        walls = {}
        for tag, mod in (("ours", M), ("reference", ref_wl)):
            best = float("inf")
            for _ in range(reps):
                t0 = time.perf_counter()
                length, width, _, _ = mod.process_bridge_deck(pts)
                best = min(best, time.perf_counter() - t0)
            walls[tag] = round(best, 3)
            print(f"{name} {tag:9s}: {best:7.2f} s  "
                  f"(L={length:.3f} W={width:.3f})", flush=True)
        walls["speedup"] = round(walls["reference"] / walls["ours"], 2)
        rows[name] = {"n_points": int(len(pts)), **walls}
    out = {
        "hyperparameters": "voxel-0.02 evaluation_results.csv row "
                           "(= process_bridge_deck defaults)",
        "reference_committed_mean_time_s": 18.695,
        "note": "same-scan same-hparams same-CPU head-to-head on the two "
                "committed deck scans; the CSV's 18.70 s row used "
                "uncommitted b1/b2/b7 crops, so it is context, not a "
                "same-data comparison",
        "reps_min_of": reps,
        "cases": rows,
    }
    os.makedirs("benchmark_results", exist_ok=True)
    with open(os.path.join("benchmark_results", "measure_timing.json"),
              "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmark_results/measure_timing.json")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:2]))
