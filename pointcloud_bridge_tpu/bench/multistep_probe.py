"""Measure steps_per_dispatch (train/loop.py::make_multi_train_step).

What it times: EXACTLY the feed path train() runs per epoch — fresh numpy
batches through prefetch_to_device (background-thread jnp.asarray + async
step dispatch), metrics kept on device and device_get ONCE after the loop —
at K = 1 vs K = 8 steps per dispatch, same total step count.

Why this shape matters (round-4 post-mortem of this probe's first version):
the naive K=1 loop that np.asarray'd each step's loss read 28 ms/step, but
~23 ms of that was its OWN 32 scalar fetches (each a ~25 ms relay round
trip) — with the deferred fetch both dispatch paths run at the ~5 ms device
floor when the batch is already on device (buffer identity is irrelevant:
reuse-1-buffer 5.01 vs 32-distinct 4.95 ms/step, measured). The cost
multi-step actually amortizes in the REAL loop is the per-batch H2D
UPLOADS (3 arrays x ~25 ms relay RTT per step; the prefetch thread overlaps
them with compute but the relay serializes transfers): one stacked K-batch
upload pays the RTT once per K steps.

Usage: python -m pointcloud_bridge_tpu.bench.multistep_probe [steps] [reps]
Writes benchmark_results/multistep_probe.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

B, N, C_IN, CLASSES = 4, 4096, 3, 5


def _batches(count, seed=0):
    rng = np.random.default_rng(seed)
    return [
        {
            "points": rng.uniform(size=(B, N, 3)).astype(np.float32),
            "colors": rng.uniform(size=(B, N, C_IN)).astype(np.float32),
            "labels": rng.integers(0, CLASSES, (B, N)).astype(np.int32),
        }
        for _ in range(count)
    ]


def main() -> None:
    steps = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models import get_model
    from ..train.loop import (
        create_train_state,
        make_multi_train_step,
        make_optimizer,
        make_train_step,
    )

    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    model = get_model("pointnet2_ssg", num_classes=CLASSES)
    opt = make_optimizer()
    batches = _batches(steps)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state0 = create_train_state(model, jax.random.PRNGKey(0), batches[0], opt)
    state0 = jax.device_put(state0, jax.devices()[0])
    rng = jax.random.PRNGKey(1)
    cw = jnp.ones(CLASSES)
    lr = jnp.float32(1e-3)

    from ..train.loop import group_batches, prefetch_to_device

    def put(b):
        return {key: jnp.asarray(v) for key, v in b.items()}

    results = {}
    for k in (1, 8):
        if k == 1:
            step = make_train_step(model, cfg.loss, opt, donate=False)
        else:
            step = make_multi_train_step(model, cfg.loss, opt, k, donate=False)

        def loop():
            # the train() epoch loop verbatim: background-thread uploads,
            # async step dispatch, ONE deferred metric fetch at the end
            it = iter(batches)
            if k > 1:
                it = group_batches(it, k)
            st, ms = state0, []
            for b in prefetch_to_device(it, put, 2):
                st, m = step(st, b, lr, cw, rng)
                ms.append(m)
            fetched = jax.device_get(ms)
            return float(np.mean(np.concatenate(
                [np.ravel(f["loss"]) for f in fetched]
            )))

        loss = loop()  # compile + warm
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            loss = loop()
            best = min(best, time.perf_counter() - t0)
        per_step = best / steps
        results[f"k{k}"] = {
            "wall_s": best, "ms_per_step": per_step * 1e3, "loss": loss,
        }
        print(f"k={k}: {per_step * 1e3:.2f} ms/step (loss {loss:.4f})")

    results["speedup"] = (
        results["k1"]["ms_per_step"] / results["k8"]["ms_per_step"]
    )
    print(f"speedup: {results['speedup']:.2f}x")
    os.makedirs("benchmark_results", exist_ok=True)
    with open("benchmark_results/multistep_probe.json", "w") as f:
        json.dump({"B": B, "N": N, "steps": steps, **results}, f, indent=1)
    print("wrote benchmark_results/multistep_probe.json")


if __name__ == "__main__":
    main()
