"""Round-2 zoo closure: RandLANet_ss, Partsize pointnet_sem_seg, AVS-Net,
statistically-weighted kNN — each against a numpy/torch oracle or the
executed reference where feasible.
"""

import importlib.util
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.models import get_model

REF = "/root/reference/Highway_bridge/models/pointnet2_utils.py"
REF_PARTSIZE = "/root/reference/Partsize-identical/models"


def _load_ref_utils():
    if not os.path.exists(REF):
        pytest.skip("reference checkout not available")
    spec = importlib.util.spec_from_file_location("ref_pn2_utils", REF)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


# --------------------------------------------------------------------------
# models
# --------------------------------------------------------------------------

def _run(name, feat_ch=3, n=192, train=False, **kw):
    m = get_model(name, num_classes=5, **kw)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, n, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, n, feat_ch))
    v = m.init(
        {"params": key, "dropout": key, "sampling": key}, xyz, feats, train=False
    )
    if train:
        out, _ = m.apply(
            v, xyz, feats, train=True,
            rngs={"dropout": key, "sampling": key}, mutable=["batch_stats"],
        )
    else:
        out = m.apply(v, xyz, feats, train=False)
    return v, out


@pytest.mark.slow
def test_randlanet_ss_forward_and_train():
    _, out = _run("randlanet_ss")
    assert out.shape == (2, 192, 5)
    assert np.isfinite(np.asarray(out)).all()
    _, out = _run("randlanet_ss", train=True)
    assert out.shape == (2, 192, 5)


def test_randlanet_ss_differs_from_base_randlanet():
    v_ss, _ = _run("randlanet_ss")
    v, _ = _run("randlanet")
    n_ss = sum(x.size for x in jax.tree.leaves(v_ss["params"]))
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n_ss != n  # distinct architecture (decoder [128,64,32,32], ss LFA)


def test_pointnet_sem_seg_partsize_forward():
    _, out = _run("pointnet_sem_seg", feat_ch=6)
    assert out.shape == (2, 192, 5)
    _, out = _run("pointnet_sem_seg", feat_ch=6, train=True)
    assert out.shape == (2, 192, 5)


def test_pointnet_sem_seg_partsize_transform_and_params():
    m = get_model("pointnet_sem_seg", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 64, 3))
    feats = jax.random.uniform(key, (2, 64, 6))
    v = m.init(key, xyz, feats, train=False)
    logits, trans_feat = m.apply(v, xyz, feats, train=False, return_transform=True)
    assert logits.shape == (2, 64, 5)
    assert trans_feat.shape == (2, 64, 64)

    # trainable-param parity vs the torch reference (BN affine included)
    if not os.path.isdir(REF_PARTSIZE):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, REF_PARTSIZE)
    try:
        import torch  # noqa: F401
        spec = importlib.util.spec_from_file_location(
            "ref_pn_sem_seg", os.path.join(REF_PARTSIZE, "pointnet_sem_seg.py")
        )
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        tmodel = ref.get_model(5, with_rgb=True)
        n_torch = sum(p.numel() for p in tmodel.parameters() if p.requires_grad)
    finally:
        sys.path.remove(REF_PARTSIZE)
    n_ours = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n_ours == n_torch


# --------------------------------------------------------------------------
# knn_stat_weighted oracle (numpy transcription of RandLANet_ss.py:58-97)
# --------------------------------------------------------------------------

def _ref_knn_ss(xyz, k):
    b, n, _ = xyz.shape
    idx = np.zeros((b, n, k), dtype=np.int64)
    for bi in range(b):
        for i in range(n):
            diff = xyz[bi] - xyz[bi, i : i + 1]
            dist = np.sum(diff * diff, axis=-1)
            k2 = min(k * 2, n)
            top = np.argsort(dist, kind="stable")[:k2]
            local = xyz[bi, top]
            mean = local.mean(axis=0)
            std = local.std(axis=0, ddof=1)
            w = np.exp(-np.sum((local - mean) ** 2, -1) / (std + 1e-6).mean())
            wd = dist[top] * w
            order = np.argsort(wd, kind="stable")
            idx[bi, i] = top[order[:k]]
    return idx


def test_knn_stat_weighted_matches_loop_oracle(rng):
    from pointcloud_bridge_tpu.ops import knn_stat_weighted

    xyz = rng.uniform(size=(2, 48, 3)).astype(np.float32)
    ours = np.asarray(knn_stat_weighted(jnp.asarray(xyz), k=8))
    ref = _ref_knn_ss(xyz, 8)
    # ties in distance can permute candidates; compare as sets per point
    assert np.mean([
        len(set(a) & set(b)) / 8.0
        for A, B in zip(ours, ref) for a, b in zip(A, B)
    ]) > 0.99


# --------------------------------------------------------------------------
# AVS-Net vs executed torch reference
# --------------------------------------------------------------------------

def test_avs_voxel_downsample_matches_reference(rng):
    import torch

    from pointcloud_bridge_tpu.ops import avs_voxel_downsample

    ref = _load_ref_utils()
    xyz = rng.uniform(0, 2.0, size=(2, 300, 3)).astype(np.float32)
    net = ref.AVSNet()
    theirs = net.voxel_downsample(torch.from_numpy(xyz), 0.25).numpy()
    ours = avs_voxel_downsample(xyz, 0.25)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5, atol=1e-6)


def test_avs_adapt_voxel_size_matches_reference(rng):
    import torch

    from pointcloud_bridge_tpu.ops import avs_adapt_voxel_size

    ref = _load_ref_utils()
    xyz = rng.uniform(0, 2.0, size=(1, 400, 3)).astype(np.float32)
    net = ref.AVSNet(V0=0.05, Kp=0.5, Ki=0.1, max_iter=6)
    theirs = float(net.adapt_voxel_size(torch.from_numpy(xyz), 64))
    ours = avs_adapt_voxel_size(xyz, 64, v0=0.05, max_iter=6)
    np.testing.assert_allclose(ours, theirs, rtol=1e-5)


def test_avs_indices_match_reference_when_deterministic(rng):
    """When voxel count <= npoint the index-recovery path has no randomness;
    indices must match the reference exactly (incl. the pad-with-last rule)."""
    import torch

    from pointcloud_bridge_tpu.ops import avs_net_sample_indices

    ref = _load_ref_utils()
    xyz = rng.uniform(0, 1.0, size=(2, 200, 3)).astype(np.float32)
    net = ref.AVSNet(V0=0.5, max_iter=3)  # big voxels -> few centroids
    theirs = net(torch.from_numpy(xyz), 64).numpy()
    ours, vs = avs_net_sample_indices(xyz, 64, v0=0.5, max_iter=3)
    assert ours.shape == (2, 64)
    np.testing.assert_array_equal(ours, theirs)


def test_avs_trim_path_is_valid_subset(rng):
    from pointcloud_bridge_tpu.ops import avs_net_sample_indices

    xyz = rng.uniform(0, 4.0, size=(1, 500, 3)).astype(np.float32)
    idx, _ = avs_net_sample_indices(
        xyz, 16, v0=0.05, max_iter=2, rng=np.random.default_rng(0)
    )
    assert idx.shape == (1, 16)
    assert ((idx >= 0) & (idx < 500)).all()


# --------------------------------------------------------------------------
# SPT point-level wrapper (archive/train.py wiring)
# --------------------------------------------------------------------------

_SPT_KW = dict(
    superpoint_size=16, num_layers=2, num_heads=4, hidden_channels=32
)


def test_spt_segmenter_forward_and_train():
    _, out = _run("spt", **_SPT_KW)
    assert out.shape == (2, 192, 5)
    assert np.isfinite(np.asarray(out)).all()
    _, out = _run("spt", train=True, **_SPT_KW)
    assert out.shape == (2, 192, 5)


@pytest.mark.slow
def test_spt_trains_one_epoch_through_engine(tmp_path):
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(20000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=256, block_size=4.0, sample_rate=0.2,
        file_name="toy", seed=0,
    )
    tr = BlockDataset.from_blocks(blocks[:8], ["toy"], augment=False)
    va = BlockDataset.from_blocks(blocks[8:10], ["toy"])
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 2, "num_epochs": 1, "model": "spt"}
    )
    cfg.model.extra = dict(_SPT_KW)
    out = train(cfg, tr, va, exp_dir=str(tmp_path / "exp"))
    assert np.isfinite(out["history"][-1]["train_loss"])
    import os as _os

    assert _os.path.exists(str(tmp_path / "exp" / "best_model"))


# --------------------------------------------------------------------------
# benchmark-harness completion (VERDICT #4)
# --------------------------------------------------------------------------

def test_dgcnn_global_param_parity_with_reference_csv():
    m = get_model("dgcnn_global", num_classes=5, k=32)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 96, 3))
    v = m.init({"params": key, "dropout": key}, xyz, None, train=False)
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n == 1_546_245  # model_performance_comparison.csv:3 'DGCNN'
    out = m.apply(v, xyz, None, train=False)
    assert out.shape == (2, 96, 5)
    # per-point logits are the repeated scene logits (model.py:478-480)
    np.testing.assert_allclose(out[:, 0], out[:, 50], rtol=1e-6)


@pytest.mark.slow
def test_eva_row_has_memory_and_note_fields():
    from pointcloud_bridge_tpu.bench.eva_model import DEFAULT_ZOO, evaluate_model

    assert {"spg", "ptv3_big", "dgcnn_k32"} <= set(DEFAULT_ZOO)
    row = evaluate_model(
        "pointnet2_ssg", num_points=128, iters=2, train_iters=1,
        model_kwargs={"sa_npoints": (32, 16, 8), "_note": "tiny"},
    )
    assert row["device_peak_mb"] > 0
    assert row["config_note"] == "tiny"
    assert row["vs_reference"] > 0
