"""Data-parallel scaling curve on a virtual CPU mesh.

Real multi-chip hardware is not available in this environment (one relay
chip), so the scaling evidence the driver can check runs on XLA's host
platform with N virtual devices — the same mechanism tests/conftest.py and
dryrun_multichip use. Each device count runs in its OWN subprocess (device
count is fixed at backend init).

Measured: wall-clock per DP train step of the flagship model at a FIXED
global batch (so perfect scaling halves the per-step time as devices double
— CPU timing here is honest; there is no relay in the loop).

Usage: python -m pointcloud_bridge_tpu.bench.dp_scaling
Writes benchmark_results/dp_scaling.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

_CHILD = r"""
import time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.parallel import (
    make_dp_train_step, make_mesh, replicate, shard_batch,
)
from pointcloud_bridge_tpu.train.loop import create_train_state, make_optimizer

n_dev = int(__import__("os").environ["PCB_NDEV"])
assert len(jax.devices()) == n_dev, (len(jax.devices()), n_dev)
mesh = make_mesh(n_dev)

GLOBAL_B, N = 8, 1024
rng = np.random.default_rng(0)
batch = {
    "points": rng.uniform(size=(GLOBAL_B, N, 3)).astype(np.float32),
    "colors": rng.uniform(size=(GLOBAL_B, N, 3)).astype(np.float32),
    "labels": rng.integers(0, 5, (GLOBAL_B, N)).astype(np.int32),
    "mask": np.ones(GLOBAL_B, bool),
    "block_ids": np.arange(GLOBAL_B, dtype=np.int32),
}
model = get_model("pointnet2_ssg", num_classes=5, axis_name="data",
                  sa_npoints=(256, 64, 16))
opt = make_optimizer()
key = jax.random.PRNGKey(0)
state = replicate(create_train_state(model, key, batch, opt), mesh)
cfg = Config()
cfg.loss.name = "ce"; cfg.loss.use_class_weights = False
step = make_dp_train_step(model, cfg.loss, opt, mesh)
sb = shard_batch(batch, mesh)
cw = replicate(jnp.ones(5, jnp.float32), mesh)

state, m = step(state, sb, jnp.float32(1e-3), cw, key)  # compile
float(m["loss"])
STEPS = 10
best = float("inf")
for _ in range(3):
    # the DP step donates its input state; keep stepping the live one
    t0 = time.perf_counter()
    ms = []
    for _ in range(STEPS):
        state, m = step(state, sb, jnp.float32(1e-3), cw, key)
        ms.append(m)
    jax.device_get(ms)
    best = min(best, (time.perf_counter() - t0) / STEPS)
print(f"RESULT {n_dev} {best}")
"""


def main() -> None:
    results = []
    for ndev in (1, 2, 4, 8):
        env = dict(os.environ)
        env["JAX_PLATFORMS"] = "cpu"
        env["PCB_NDEV"] = str(ndev)
        flags = [
            f
            for f in env.get("XLA_FLAGS", "").split()
            if "host_platform_device_count" not in f
        ]
        env["XLA_FLAGS"] = " ".join(
            flags + [f"--xla_force_host_platform_device_count={ndev}"]
        )
        out = subprocess.run(
            [sys.executable, "-c", _CHILD],
            env=env,
            capture_output=True,
            text=True,
            timeout=1200,
            cwd=os.path.dirname(os.path.dirname(os.path.dirname(
                os.path.abspath(__file__)
            ))),
        )
        line = next(
            (ln for ln in out.stdout.splitlines() if ln.startswith("RESULT")),
            None,
        )
        if line is None:
            print(f"ndev={ndev} FAILED:\n{out.stderr[-1500:]}")
            continue
        step_s = float(line.split()[2])
        results.append({"devices": ndev, "step_ms": round(step_s * 1e3, 2)})
        print(f"devices={ndev}: {step_s * 1e3:.2f} ms/step", flush=True)

    if results:
        base = results[0]["step_ms"]
        for r in results:
            r["speedup"] = round(base / r["step_ms"], 2)
        os.makedirs("benchmark_results", exist_ok=True)
        with open("benchmark_results/dp_scaling.json", "w") as f:
            json.dump(results, f, indent=1)
        print(json.dumps(results))


if __name__ == "__main__":
    main()
