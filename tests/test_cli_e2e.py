"""End-to-end CLI tests: LAS scenes on disk -> train_cli -> infer_cli
(blocks + scene modes) -> predicted LAS, exercising the full user workflow."""

import glob
import json
import os

import numpy as np
import pytest

from pointcloud_bridge_tpu.data import write_las, read_las
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene


@pytest.fixture(scope="module")
def data_dirs(tmp_path_factory):
    root = tmp_path_factory.mktemp("clidata")
    for split, seeds in [("train", (0, 1)), ("val", (2,)), ("test", (3,))]:
        d = root / split
        d.mkdir()
        for s in seeds:
            xyz, rgb, labels = toy_bridge_scene(15000, seed=s)
            write_las(str(d / f"scene{s}.las"), xyz, rgb, labels)
    return root


@pytest.fixture(scope="module")
def trained_exp(data_dirs, tmp_path_factory):
    import yaml

    from pointcloud_bridge_tpu.train_cli import main as train_main

    cfgdir = tmp_path_factory.mktemp("cfg")
    expdir = tmp_path_factory.mktemp("exps")
    cfg = {
        "case": "cli_e2e",
        "model": "pointnet2_ssg",
        "num_classes": 5,
        "num_points": 256,
        "block_size": 6.0,
        "sample_rate": 0.2,
        "batch_size": 4,
        "num_epochs": 2,
        "learning_rate": 0.001,
        "train_dir": str(data_dirs / "train"),
        "val_dir": str(data_dirs / "val"),
        "exp_dir_root": str(expdir),
        "model_extra": {"sa_npoints": (64, 32, 16)},
        "data": {"augment": False},
    }
    cfg_path = str(cfgdir / "cfg.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    train_main(["--config", cfg_path])
    exps = glob.glob(str(expdir / "exp_*"))
    assert len(exps) == 1
    return exps[0]


@pytest.mark.slow
def test_train_cli_outputs(trained_exp):
    assert os.path.exists(os.path.join(trained_exp, "best_model"))
    assert os.path.exists(os.path.join(trained_exp, "latest_checkpoint"))
    assert os.path.exists(os.path.join(trained_exp, "scalars.csv"))
    assert os.path.exists(os.path.join(trained_exp, "training.log"))
    # code snapshot for reproducibility
    assert os.path.isdir(os.path.join(trained_exp, "code_snapshot"))


@pytest.mark.slow
def test_infer_cli_blocks(trained_exp, data_dirs, tmp_path):
    from pointcloud_bridge_tpu.infer_cli import main as infer_main

    out = str(tmp_path / "blocks_out")
    infer_main(
        [
            "blocks",
            "--checkpoint", trained_exp,
            "--model", "pointnet2_ssg",
            "--data-dir", str(data_dirs / "test"),
            "--out-dir", out,
            "--num-points", "256",
            "--batch-size", "4",
        ]
    )
    assert os.path.exists(os.path.join(out, "metrics.csv"))
    assert os.path.exists(os.path.join(out, "confusion_matrix.csv"))
    assert os.path.exists(os.path.join(out, "evaluation_summary.png"))


@pytest.mark.slow
def test_infer_cli_scene_and_las_export(trained_exp, data_dirs, tmp_path):
    from pointcloud_bridge_tpu.infer_cli import main as infer_main

    out = str(tmp_path / "scene_out")
    infer_main(
        [
            "scene",
            "--checkpoint", trained_exp,
            "--model", "pointnet2_ssg",
            "--data-dir", str(data_dirs / "test"),
            "--out-dir", out,
            "--num-points", "256",
            "--block-size", "6.0",
            "--stride", "3.0",
            "--num-votes", "2",
            "--batch-size", "8",
            "--export-las",
        ]
    )
    preds = glob.glob(os.path.join(out, "*_pred.las"))
    assert len(preds) == 1
    las = read_las(preds[0])
    assert las.classification.max() <= 4
    # every point got a label and geometry round-trips
    src = read_las(str(data_dirs / "test" / "scene3.las"))
    assert len(las.xyz) == len(src.xyz)
