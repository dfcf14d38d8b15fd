"""Inference layer tests: block inference metrics/CSVs, whole-scene vote
coverage and accuracy with a briefly trained model, LAS export round-trip."""

import os

import numpy as np
import jax
import pytest

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.data import (
    BlockDataset,
    make_training_blocks,
    read_las,
    scene_labelweights,
)
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
from pointcloud_bridge_tpu.infer import (
    export_predicted_las,
    run_block_inference,
    save_metrics_csv,
    whole_scene_vote_predict,
)
from pointcloud_bridge_tpu.models import get_model


@pytest.fixture(scope="module")
def trained():
    """Briefly train a small SSG model on the toy bridge (shared fixture)."""
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(30000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=256, block_size=4.0, sample_rate=0.3,
        file_name="toy", seed=0,
    )
    val_b = blocks[::4][:6]
    train_b = [b for i, b in enumerate(blocks) if i % 4 != 0]
    tr = BlockDataset.from_blocks(train_b, ["toy"])
    va = BlockDataset.from_blocks(val_b, ["toy"])
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 4, "num_epochs": 6, "learning_rate": 1e-3}
    )
    cfg.model.extra = {"sa_npoints": (64, 32, 16)}
    import tempfile

    out = train(cfg, tr, va, exp_dir=tempfile.mkdtemp())
    variables = {
        "params": out["state"].params,
        "batch_stats": out["state"].batch_stats,
    }
    return out["model"], variables, (xyz, rgb, labels), va


@pytest.mark.slow
def test_block_inference_and_csv(trained, tmp_path):
    model, variables, _, va = trained
    res = run_block_inference(model, variables, va, num_classes=5, batch_size=4)
    assert res["predictions"].shape == (len(va), va.num_points)
    assert res["global"]["OA"] > 0.5
    assert "toy" in res["per_file"]
    path = save_metrics_csv(res, str(tmp_path))
    assert os.path.exists(path)
    txt = open(path).read()
    assert "GLOBAL" in txt and "mIoU" in txt
    assert os.path.exists(str(tmp_path / "confusion_matrix.csv"))


def test_whole_scene_vote(trained):
    model, variables, (xyz, rgb, labels), _ = trained
    pts6 = np.concatenate([xyz, rgb], axis=1)
    lw = scene_labelweights([labels], 5)
    res = whole_scene_vote_predict(
        model,
        variables,
        pts6,
        labels,
        lw,
        num_classes=5,
        block_points=256,
        block_size=6.0,
        stride=3.0,
        num_votes=2,
        batch_size=8,
    )
    assert res["pred"].shape == (len(xyz),)
    # every point received at least one vote
    assert (res["vote_pool"].sum(axis=1) > 0).all()
    # trained model beats chance comfortably on the full scene
    assert res["metrics"]["OA"] > 0.5


def test_las_export_roundtrip(trained, tmp_path):
    model, variables, (xyz, rgb, labels), _ = trained
    pred = np.random.default_rng(0).integers(0, 5, len(xyz))
    p = export_predicted_las(str(tmp_path / "pred.las"), xyz, rgb, pred)
    las = read_las(p)
    np.testing.assert_array_equal(las.classification, pred)
    np.testing.assert_allclose(las.xyz, xyz, atol=2e-3)


def test_whole_scene_vote_normalized_contract(trained):
    """Highway-style models are trained on whole-scene-normalized blocks;
    normalize_scene=True applies that contract to the vote grid (validated on
    TPU: vote OA 0.77 > block-val OA 0.67)."""
    model, variables, (xyz, rgb, labels), _ = trained
    pts6 = np.concatenate([xyz, rgb], axis=1)
    lw = scene_labelweights([labels], 5)
    res = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, num_classes=5,
        block_points=256, block_size=0.5, stride=0.25, num_votes=2,
        batch_size=8, normalize_scene=True,
    )
    assert (res["vote_pool"].sum(axis=1) > 0).all()
    assert res["metrics"]["OA"] > 0.55


@pytest.mark.slow
def test_whole_scene_vote_device_gather_matches_host_path(trained):
    """Index-streaming vote inference (scene table gathered on device) must
    be bit-identical to the host block-assembly path."""
    model, variables, (xyz, rgb, labels), _ = trained
    pts6 = np.concatenate([xyz, rgb], axis=1)
    lw = scene_labelweights([labels], 5)
    kw = dict(
        num_classes=5, block_points=256, block_size=6.0, stride=3.0,
        num_votes=2, batch_size=8,
    )
    host = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, device_gather=False, **kw
    )
    dev = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, device_gather=True, **kw
    )
    np.testing.assert_array_equal(host["pred"], dev["pred"])
    np.testing.assert_array_equal(host["vote_pool"], dev["vote_pool"])


def test_whole_scene_vote_nine_mode_device_gather(trained):
    """The Partsize 9-channel vote contract (feature_mode='nine',
    test_sem_seg.py feed) through the device-gather path must match the
    host-assembly path bit-for-bit."""
    _, _, (xyz, rgb, labels), _ = trained
    model = get_model("pointnet_sem_seg", num_classes=5)
    pts6 = np.concatenate([xyz, rgb], axis=1)
    variables = model.init(
        jax.random.PRNGKey(0),
        np.zeros((1, 256, 3), np.float32),
        np.zeros((1, 256, 9), np.float32),
        train=False,
    )
    lw = scene_labelweights([labels], 5)
    kw = dict(
        num_classes=5, block_points=256, block_size=6.0, stride=3.0,
        num_votes=1, batch_size=8, feature_mode="nine",
    )
    host = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, device_gather=False, **kw
    )
    dev = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, device_gather=True, **kw
    )
    np.testing.assert_array_equal(host["pred"], dev["pred"])
    np.testing.assert_array_equal(host["vote_pool"], dev["vote_pool"])


@pytest.mark.slow
def test_whole_scene_vote_sharded_matches_single_device(trained):
    """Mesh-sharded vote inference (blocks axis over the 8-device CPU mesh)
    must produce identical predictions to the single-device path."""
    from pointcloud_bridge_tpu.parallel import make_mesh

    model, variables, (xyz, rgb, labels), _ = trained
    pts6 = np.concatenate([xyz, rgb], axis=1)
    lw = scene_labelweights([labels], 5)
    kw = dict(
        num_classes=5, block_points=256, block_size=6.0, stride=3.0,
        num_votes=2, batch_size=8,
    )
    single = whole_scene_vote_predict(model, variables, pts6, labels, lw, **kw)
    mesh = make_mesh(8)
    sharded = whole_scene_vote_predict(
        model, variables, pts6, labels, lw, mesh=mesh, **kw
    )
    np.testing.assert_array_equal(sharded["pred"], single["pred"])
    np.testing.assert_allclose(sharded["vote_pool"], single["vote_pool"])
