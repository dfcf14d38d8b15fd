"""End-to-end example: synthetic bridge LAS scenes -> training -> whole-scene
vote inference -> predicted LAS -> deck width/length measurement.

Runs on CPU or TPU:  python examples/full_pipeline.py [workdir]
"""

from __future__ import annotations

import os
import sys

# allow running as `python examples/full_pipeline.py` from anywhere
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(workdir: str = "/tmp/pcb_example") -> None:
    os.makedirs(workdir, exist_ok=True)
    for sub in ("train", "val", "test"):
        os.makedirs(os.path.join(workdir, sub), exist_ok=True)

    from pointcloud_bridge_tpu.data import read_las, write_las
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene

    # 1) synthesize labeled scenes (stand-in for real LiDAR scans)
    print("== generating scenes ==")
    for split, seeds in [("train", (0, 1, 2)), ("val", (10,)), ("test", (20,))]:
        for s in seeds:
            xyz, rgb, labels = toy_bridge_scene(40000, seed=s)
            write_las(os.path.join(workdir, split, f"scene{s}.las"), xyz, rgb, labels)

    # 2) train
    print("== training ==")
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.train_cli import build_datasets
    from pointcloud_bridge_tpu.train import train

    cfg = Config.from_dict(
        {
            "case": "example",
            "model": "pointnet2_ssg",
            "num_classes": 5,
            "num_points": 1024,
            "block_size": 8.0,
            "sample_rate": 0.3,
            "batch_size": 4,
            "num_epochs": 8,
            "learning_rate": 0.001,
            "train_dir": os.path.join(workdir, "train"),
            "val_dir": os.path.join(workdir, "val"),
            "exp_dir_root": os.path.join(workdir, "experiments"),
        }
    )
    cfg.model.extra = {"sa_npoints": (256, 64, 16)}
    cfg.data.augment = False
    # K steps per jit dispatch: the relay charges ~7 ms per dispatch while
    # the step computes in ~5 (bench/trainbreak.py); stacking amortizes it
    cfg.train.steps_per_dispatch = 8
    tr, va = build_datasets(cfg)
    out = train(cfg, tr, va)
    print(f"best val OA: {out['best_val_acc']:.4f}")

    # 3) whole-scene vote inference + LAS export
    print("== inference ==")
    import jax

    from pointcloud_bridge_tpu.data import scene_labelweights
    from pointcloud_bridge_tpu.data.dataset import _load_scene
    from pointcloud_bridge_tpu.infer import (
        export_predicted_las,
        whole_scene_vote_predict,
    )

    state = out["state"]
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    test_file = os.path.join(workdir, "test", "scene20.las")
    pts, cols, labels = _load_scene(test_file)
    lw = scene_labelweights([labels], 5)
    pts6 = np.concatenate([pts, cols], axis=1)
    # normalize_scene matches the training contract (blocks carry whole-scene
    # normalized coordinates); block sizes are in normalized units (~scene
    # radius 12 m -> 8 m raw ~ 0.65 normalized)
    res = whole_scene_vote_predict(
        out["model"], variables, pts6, labels, lw, 5,
        block_points=1024, block_size=0.65, stride=0.33, num_votes=3,
        normalize_scene=True,
    )
    m = res["metrics"]
    print(f"scene mIoU={m['mIoU']:.4f} OA={m['OA']:.4f}")
    pred_las = os.path.join(workdir, "scene20_pred.las")
    export_predicted_las(pred_las, pts, cols, res["pred"])

    # 4) deck width/length measurement from the predicted LAS (deck = class 3)
    print("== measurement ==")
    from pointcloud_bridge_tpu.measure import run_wl_identification

    raw = pts[labels == 3]
    pred_scan = read_las(pred_las)
    pred_deck = pred_scan.xyz[pred_scan.classification == 3]
    rows = run_wl_identification(
        [("scene20", raw, pred_deck)],
        out_csv=os.path.join(workdir, "evaluation_results.csv"),
        hyperparams={
            "voxel_size": 0.05,
            "isolation_forest_contamination": 0.1,
            "lof_n_neighbors": 20,
            "lof_contamination": 0.05,
        },
    )
    r = rows[0]
    print(
        f"deck GT {r['length_raw']:.2f} x {r['width_raw']:.2f} m, "
        f"measured {r['length_pred']:.2f} x {r['width_pred']:.2f} m, "
        f"rel err {r['relative_error']:.4f}"
    )


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/pcb_example")
