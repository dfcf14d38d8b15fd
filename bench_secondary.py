"""Secondary bench metrics (VERDICT r2 #8): bristrunet — the non-SSG kernel
stack (BSE attention, gather3, EnhancedFP) — so regressions there are
visible beyond the primary driver metric. Run per-round; the JSON line is
also appended to benchmark_results/bench_secondary.jsonl for the record.

Usage: python bench_secondary.py
"""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

os.environ.setdefault("PCB_FPS_PALLAS", "1")

from bench import bench_model  # noqa: E402


def main() -> None:
    buf = io.StringIO()
    with redirect_stdout(buf):
        bench_model(
            "bristrunet", "bristrunet_inference_points_per_sec", 43_465.0,
            k_iters=8,
        )
    line = buf.getvalue().strip()
    print(line)
    os.makedirs("benchmark_results", exist_ok=True)
    with open("benchmark_results/bench_secondary.jsonl", "a") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
