"""Benchmark entry point for the driver.

Measures segmentation inference throughput (points/sec) of the flagship model
on standard B=4 x N=4096 blocks — the harness shape of the reference's
eva_model.py (warmup + timed iterations, SURVEY.md §3.5) — and prints ONE
JSON line: {"metric", "value", "unit", "vs_baseline"}.

Baseline: the reference PointNet2 (SSG) at 35,557 points/sec on its GPU
(Highway_bridge/model_performance_comparison.csv:4, BASELINE.md).

Methodology notes: inputs are rotated across iterations (identical in-flight
computations can be deduped by the remote execution path, inflating numbers),
every iteration blocks on the result, and the median of per-iteration times
is reported. Params are initialized on CPU (remote-compiling the init graph
is pathologically slow) and transferred.
"""

from __future__ import annotations

import json
import statistics
import time


def init_on_cpu(model, key, xyz, feats):
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(key, xyz[:1], feats[:1], train=False)
    return jax.device_put(variables, jax.devices()[0])


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pointcloud_bridge_tpu.models import get_model

    b, n = 4, 4096
    model = get_model("pointnet2_ssg", num_classes=5)
    rng = np.random.default_rng(0)
    n_variants = 8
    xyz_all = jnp.asarray(rng.uniform(size=(n_variants, b, n, 3)), jnp.float32)
    feats_all = jnp.asarray(rng.uniform(size=(n_variants, b, n, 3)), jnp.float32)
    key = jax.random.PRNGKey(0)
    variables = init_on_cpu(model, key, np.asarray(xyz_all[0]), np.asarray(feats_all[0]))

    @jax.jit
    def forward(variables, xyz, feats):
        return model.apply(variables, xyz, feats, train=False)

    # warmup (compile + cache)
    for i in range(3):
        forward(variables, xyz_all[i % n_variants], feats_all[i % n_variants]).block_until_ready()

    iters = 20
    times = []
    for i in range(iters):
        x = xyz_all[i % n_variants]
        f = feats_all[i % n_variants]
        t0 = time.perf_counter()
        forward(variables, x, f).block_until_ready()
        times.append(time.perf_counter() - t0)
    dt = statistics.median(times)

    pts_per_sec = b * n / dt
    baseline = 35_557.0  # reference PointNet2 GPU points/sec
    print(
        json.dumps(
            {
                "metric": "pointnet2_ssg_inference_points_per_sec",
                "value": round(pts_per_sec, 1),
                "unit": "points/sec",
                "vs_baseline": round(pts_per_sec / baseline, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
