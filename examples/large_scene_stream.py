"""Large-scene streaming inference demo (VERDICT round-2 #9).

Runs whole-scene K-vote segmentation over a multi-million-point synthetic
bridge scene on the real TPU and reports END-TO-END points/sec — gridding,
H2D feed, device forward, and the host vote scatter all included. The vote
loop streams int32 block indices and gathers the scene table on device
(uploaded once), and defers each vote's single fetch under the next vote's
host gridding (infer/vote.py device_gather). This is the "arbitrarily
large scan" capability the reference only has at Python-loop speed
(Partsize test_sem_seg.py:58-65).

Usage:  python examples/large_scene_stream.py [n_points_millions] [model]
                                              [block_points]

`model` defaults to pointnet2_ssg (the smallest servable model — the
historical demo configuration). `model=ptv3_pooled` serves the hierarchical
transformer at large blocks (block_points defaults to 16384 there): the
U-Net's fixed-stride Morton pooling makes transformer-class quality
affordable at whole-scene scale — 4x fewer blocks per vote and ~0.24 us/pt
device cost (benchmark_results/pooled_probe_n16384.json).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("PCB_FPS_PALLAS", "1")

import numpy as np


def main():
    import jax

    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.infer.vote import whole_scene_vote_predict
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.hostmem import retain_freed_pages

    # this host faults fresh pages at ~100us/4K; keep numpy's big buffers
    # warm across the per-vote gridding passes (7.0 -> 0.55 s at 1M pts)
    retain_freed_pages()

    n_m = float(sys.argv[1]) if len(sys.argv) > 1 else 5.0
    n_points = int(n_m * 1e6)
    model_name = sys.argv[2] if len(sys.argv) > 2 else "pointnet2_ssg"
    num_classes = 5
    block_points = (
        int(sys.argv[3]) if len(sys.argv) > 3
        else (16384 if model_name == "ptv3_pooled" else 4096)
    )
    # keep points-per-device-batch constant as blocks grow
    vote_batch = max(1, (32 * 4096) // block_points)
    model_extra = {}
    if model_name == "ptv3_pooled":
        # levels block_points / 4 / 16, window 1024 (pooled_probe config)
        model_extra = {"dims": (64, 128, 256), "enc_depths": (2, 2, 6),
                      "dec_depths": (1, 1), "strides": (4, 4),
                      "window_size": 1024}

    print(f"generating {n_points:,}-point synthetic bridge scene...")
    xyz, rgb, labels = toy_bridge_scene(n_points, seed=0)
    points6 = np.concatenate([xyz, rgb], axis=1).astype(np.float32)

    # quick-train on a small scene so the demo's quality numbers mean
    # something (same recipe as examples/full_pipeline.py)
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.train import train

    # block spatial size scales as sqrt(points-per-block) so density matches
    train_bs = 6.0 * (block_points / 4096) ** 0.5
    txyz, trgb, tlabels = toy_bridge_scene(300_000, seed=1)
    blocks = make_training_blocks(
        txyz, trgb, tlabels, num_points=block_points, block_size=train_bs,
        sample_rate=1.0, file_name="toy", seed=0,
    )
    tr = BlockDataset.from_blocks(blocks, ["toy"], augment=True)
    cfg = Config.from_dict({
        "case": "stream_demo", "num_classes": num_classes, "batch_size": 4,
        "num_epochs": 4, "learning_rate": 1e-3, "model": model_name,
        "num_points": block_points,
    })
    if model_extra:
        cfg.model.extra = dict(model_extra)
    print("quick-training on a 300k-point scene (4 epochs)...")
    res = train(cfg, tr, None, exp_dir="/tmp/stream_demo_exp")
    model = res["model"]
    state = res["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    # Inference must match the training contract: the model was trained on
    # whole-scene-NORMALIZED coordinates (make_training_blocks), so the vote
    # gridder normalizes the scene too and block sizes are in normalized
    # units (8 m raw / scene radius).
    centered = xyz - xyz.mean(axis=0, keepdims=True)
    radius = float(np.sqrt((centered**2).sum(axis=1)).max())
    bs_norm = 8.0 * (block_points / 4096) ** 0.5 / radius
    stride_norm = 0.75 * bs_norm

    # warm-up: compile the gather+forward executable for THIS scene's table
    # bucket (the table length is baked into the jitted gather) by gridding
    # the full scene at a sparse stride — a handful of blocks, same shapes
    whole_scene_vote_predict(
        model, variables, points6, labels, np.ones(num_classes),
        num_classes, block_points=block_points, block_size=bs_norm,
        stride=8 * bs_norm, num_votes=1, batch_size=vote_batch,
        normalize_scene=True,
    )

    t0 = time.time()
    out = whole_scene_vote_predict(
        model, variables, points6, labels, np.ones(num_classes), num_classes,
        block_points=block_points, block_size=bs_norm, stride=stride_norm,
        num_votes=3, batch_size=vote_batch, normalize_scene=True,
        collect_timings=True,
    )
    wall = time.time() - t0
    covered = int((out["vote_pool"].sum(axis=1) > 0).sum())
    m = out["metrics"]
    print(
        f"scene: {n_points:,} pts | votes: 3 | wall: {wall:.1f} s | "
        f"end-to-end: {n_points / wall:,.0f} pts/s "
        f"(x3 votes = {3 * n_points / wall:,.0f} block-pts/s)"
    )
    print(
        f"coverage: {covered / n_points:.1%} | OA {m['OA']:.3f} | "
        f"mIoU {m['mIoU']:.3f}"
    )

    # per-phase JSON artifact (VERDICT r3 #7): a regression INSIDE the
    # 2.5x host-variance band is invisible to end-to-end wall time alone —
    # the phase decomposition localizes it. grid_s runs on a background
    # thread overlapped with device work; fetch_s includes waiting out
    # device compute (inseparable on the async relay).
    import json

    tm = out["timings"]
    artifact = {
        "n_points": n_points,
        "model": model_name,
        "num_votes": 3,
        "block_points": block_points,
        "wall_s": round(wall, 2),
        "end_to_end_pts_per_s": round(n_points / wall, 1),
        "phases": {
            k: ([round(x, 3) for x in v] if isinstance(v, list)
                else round(v, 3))
            for k, v in tm.items()
        },
        "oa": round(float(m["OA"]), 4),
        "miou": round(float(m["mIoU"]), 4),
        "coverage": round(covered / n_points, 4),
        "note": "grid_s overlaps device work (background thread); "
                "fetch_s = blocking D2H incl. device compute wait; "
                "host wall varies up to ~2.5x run-to-run on this box",
    }
    out_path = os.environ.get("PCB_STREAM_JSON")
    if out_path is None:
        os.makedirs("benchmark_results", exist_ok=True)
        tag = "" if model_name == "pointnet2_ssg" else f"_{model_name}"
        out_path = f"benchmark_results/large_scene_phases_{n_m:g}M{tag}.json"
    with open(out_path, "w") as f:
        json.dump(artifact, f, indent=1)
    print("phase artifact ->", out_path)
    print(json.dumps(artifact["phases"]))


if __name__ == "__main__":
    main()
