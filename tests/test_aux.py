"""Auxiliary subsystem tests: profiling, determinism, export, statistics,
dice loss, class maps, debug/smoke tool."""

import os
import sys

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_set_random_seed():
    from pointcloud_bridge_tpu.utils.determinism import set_random_seed

    k1 = set_random_seed(7)
    a = np.random.rand(3)
    k2 = set_random_seed(7)
    b = np.random.rand(3)
    np.testing.assert_array_equal(a, b)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))


def test_span_and_points_per_second():
    from pointcloud_bridge_tpu.utils.profiling import span, points_per_second

    sink = {}
    with span("x", sink):
        pass
    assert "x" in sink

    def fn(x):
        return (x @ x.transpose(0, 2, 1)).sum(-1)

    xyz = jnp.ones((2, 64, 3))
    pps = points_per_second(fn, xyz, iters=4)
    assert pps > 0


def test_export_stablehlo_roundtrip(tmp_path):
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.export import (
        dump_hlo_text,
        export_stablehlo,
        load_stablehlo,
    )

    model = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(16, 8, 4))
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 64, 3))
    feats = xyz
    v = model.init(key, xyz, feats, train=False)
    p = export_stablehlo(
        model, v, str(tmp_path / "model.stablehlo"), 1, 64, 3
    )
    fn = load_stablehlo(p)
    out = fn(xyz, feats)
    want = model.apply(v, xyz, feats, train=False)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want), atol=1e-5)

    hlo = dump_hlo_text(model, v, str(tmp_path / "model.hlo.txt"), 1, 64, 3)
    assert os.path.getsize(hlo) > 1000


def test_statistics_suite(tmp_path, rng):
    from pointcloud_bridge_tpu.measure.evaluation import (
        bland_altman,
        comparison_table,
        dimension_metrics,
        error_distribution,
        regression_analysis,
    )

    truth = rng.uniform(5, 25, 30)
    measured = truth + rng.normal(0, 0.2, 30)
    m = dimension_metrics(measured, truth)
    assert m["MAE"] < 0.5 and abs(m["pearson_r"]) > 0.99
    ba = bland_altman(measured, truth, str(tmp_path / "ba.png"))
    assert abs(ba["mean_diff"]) < 0.2
    assert os.path.exists(str(tmp_path / "ba.png"))
    ed = error_distribution(measured - truth, str(tmp_path / "ed.png"))
    assert ed["std"] < 0.5
    ra = regression_analysis(measured, truth, str(tmp_path / "ra.png"))
    assert abs(ra["slope"] - 1.0) < 0.05 and ra["r2"] > 0.98
    rows = comparison_table({"m1": {"measured": measured, "truth": truth}})
    assert rows[0]["method"] == "m1"


def test_dice_and_combined_loss(rng):
    from pointcloud_bridge_tpu.losses import combined_ce_dice_loss, dice_loss

    labels = jnp.asarray(rng.integers(0, 5, (2, 64)))
    perfect = jax.nn.one_hot(labels, 5) * 20.0 - 10.0
    bad = -(jax.nn.one_hot(labels, 5) * 20.0 - 10.0)
    assert float(dice_loss(perfect, labels)) < 0.01
    assert float(dice_loss(bad, labels)) > 0.9
    assert float(combined_ce_dice_loss(perfect, labels)) < float(
        combined_ce_dice_loss(bad, labels)
    )


def test_class_names():
    from pointcloud_bridge_tpu.class_names import ROAD_5C, YBC_8C, PARTSIZE_5C, names_list

    assert names_list(ROAD_5C) == ["noise", "abutment", "girder", "slab", "parapet"]
    assert len(YBC_8C) == 8
    assert PARTSIZE_5C[0] == "abutment"


def test_density_weighted_sampling(rng):
    from pointcloud_bridge_tpu.ops import density_weighted_sample_indices

    # dense cluster + sparse spread: sparse points should be over-sampled
    dense = rng.normal(0, 0.01, (1, 900, 3))
    sparse = rng.uniform(-10, 10, (1, 100, 3))
    xyz = jnp.asarray(np.concatenate([dense, sparse], axis=1), jnp.float32)
    idx = np.asarray(
        density_weighted_sample_indices(jax.random.PRNGKey(0), xyz, 100)
    )
    assert idx.shape == (1, 100)
    sparse_frac = (idx >= 900).mean()
    assert sparse_frac > 0.5  # sparse 10% of points >50% of samples
    assert len(set(idx[0].tolist())) == 100  # no replacement


@pytest.mark.slow
def test_train_resume(tmp_path):
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(8000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.2)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict({"num_classes": 5, "batch_size": 4, "num_epochs": 2})
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    exp = str(tmp_path / "exp")
    out1 = train(cfg, ds, None, exp_dir=exp)
    cfg.train.num_epochs = 3
    out2 = train(cfg, ds, None, exp_dir=exp, resume=True)
    # resumed run continues from epoch 3 only
    assert [h["epoch"] for h in out2["history"]] == [3]


def test_plain_random_blocks():
    from pointcloud_bridge_tpu.data import make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene

    xyz, rgb, labels = toy_bridge_scene(8000, seed=1)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=256, sample_rate=0.1, stratified=False
    )
    assert len(blocks) >= 1
    assert blocks[0].points.shape == (256, 3)


@pytest.mark.slow
def test_debug_module_smoke():
    from pointcloud_bridge_tpu.tools.debug_module import smoke_test

    res = smoke_test(
        "pointnet2_ssg", num_points=128, batch_sizes=(1,),
        model_kwargs={"sa_npoints": (16, 8, 4)},
    )
    assert res["params"] > 0
    assert res["output_shape"] == (1, 128, 5)


def test_config_presets_parse():
    import glob

    from pointcloud_bridge_tpu.config import Config

    files = sorted(glob.glob("configs/train_*.yaml"))
    assert len(files) >= 7
    for f in files:
        cfg = Config.from_yaml(f)
        assert cfg.model.num_classes == 5
        assert cfg.train.num_epochs == 100
    ptv3 = Config.from_yaml("configs/train_ptv3.yaml")
    assert ptv3.model.extra == {"embed_dim": 384, "depth": 8, "num_heads": 2}
    assert ptv3.loss.name == "weighted_ce"
    bsn = Config.from_yaml("configs/train_bristrunet.yaml")
    assert bsn.loss.name == "bridge_structure" and bsn.loss.alpha == 80.0
    assert bsn.data.weighted_sampling is True
    ps = Config.from_yaml("configs/train_partsize_msg.yaml")
    assert ps.train.scheduler == "step" and ps.loss.name == "sol"


def test_radius_graph_and_local_frames(rng):
    from pointcloud_bridge_tpu.data.superpoints import local_frames, radius_graph

    pts = rng.uniform(size=(200, 3))
    ei = radius_graph(pts, 0.2)
    assert ei.shape[0] == 2
    d = np.linalg.norm(pts[ei[0]] - pts[ei[1]], axis=1)
    assert (d <= 0.2 + 1e-9).all()
    frames = local_frames(pts, k=10)
    assert frames.shape == (200, 3, 3)
    # rows orthonormal
    eye = np.einsum("nij,nkj->nik", frames, frames)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (200, 1, 1)), atol=1e-5)


def test_classification_report(rng):
    from pointcloud_bridge_tpu.utils.metrics import classification_report

    labels = rng.integers(0, 3, 500)
    preds = labels.copy()
    preds[:50] = (preds[:50] + 1) % 3
    rep = classification_report(preds, labels, ["a", "b", "c"])
    assert "precision" in rep and "a" in rep


@pytest.mark.slow
def test_bristrunet_29ch_variant():
    from pointcloud_bridge_tpu.models import get_model

    m = get_model("bristrunet", num_classes=5, input_ch=29,
                  sa_npoints=(48, 24, 12))
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 192, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (1, 192, 3))
    v = m.init({"params": key, "dropout": key}, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (1, 192, 5)


def test_load_snapshot_models(tmp_path):
    """Snapshot the package into an exp dir, then load get_model FROM the
    snapshot (reference inference.py:72-78 reproducibility device)."""
    from pointcloud_bridge_tpu.utils.logging import (
        load_snapshot_models,
        snapshot_code,
    )

    exp = str(tmp_path / "exp")
    os.makedirs(exp)
    snapshot_code(exp)
    get_model = load_snapshot_models(exp)
    m = get_model("pointnet2_ssg", num_classes=5)
    # the class must come from the snapshot tree, not the installed package
    mod_file = sys.modules[type(m).__module__].__file__
    assert str(tmp_path) in mod_file, mod_file


def test_persistent_compile_cache(tmp_path, monkeypatch):
    """enable_persistent_compilation_cache: env-gated, writes cache entries.

    Cross-process hit timing is the TPU story (utils/compile_cache.py
    docstring has the measured numbers); here we assert the plumbing — off
    when unset, on via PCB_COMPILE_CACHE, entries appear after a compile —
    then restore the config so the rest of the suite doesn't cache."""
    from pointcloud_bridge_tpu.utils.compile_cache import (
        enable_persistent_compilation_cache,
    )

    monkeypatch.delenv("PCB_COMPILE_CACHE", raising=False)
    assert enable_persistent_compilation_cache() is None

    cache_dir = tmp_path / "xla_cache"
    monkeypatch.setenv("PCB_COMPILE_CACHE", str(cache_dir))
    try:
        assert enable_persistent_compilation_cache() == str(cache_dir)

        @jax.jit
        def f(x):
            return jnp.tanh(x @ x.T) + x.sum()

        np.asarray(f(jnp.ones((64, 64), jnp.float32)))
        entries = [
            os.path.join(r, fn)
            for r, _, fns in os.walk(cache_dir)
            for fn in fns
        ]
        assert entries, "no cache entries written after a jit compile"
    finally:
        jax.config.update("jax_compilation_cache_dir", None)
