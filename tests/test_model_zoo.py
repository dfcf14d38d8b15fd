"""Smoke + contract tests for the wider model zoo (SURVEY.md §2.2)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.models import get_model, MODEL_REGISTRY


def _run(name, feat_ch=3, n=192, train=False, **kw):
    m = get_model(name, num_classes=5, **kw)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, n, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, n, feat_ch))
    rngs = {"params": key, "dropout": key, "sampling": key}
    v = m.init(rngs, xyz, feats, train=False)
    if train:
        out, _ = m.apply(
            v, xyz, feats, train=True,
            rngs={"dropout": key, "sampling": key}, mutable=["batch_stats"],
        )
    else:
        out = m.apply(v, xyz, feats, train=False)
    return v, out


@pytest.mark.parametrize(
    "name,kw",
    [
        ("pointnet", {}),
        ("pointnet_global", {}),
        ("dgcnn", {"k": 8}),
        ("randlanet", {}),
        ("ptv3", {"embed_dim": 64, "depth": 2, "num_heads": 2}),
        ("bristrunet", {"sa_npoints": (48, 24, 12)}),
    ],
)
def test_zoo_forward_shapes(name, kw):
    v, out = _run(name, **kw)
    assert out.shape == (2, 192, 5)
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.parametrize(
    "name,kw",
    [
        ("dgcnn", {"k": 8}),
        ("randlanet", {}),
        ("bristrunet", {"sa_npoints": (48, 24, 12)}),
    ],
)
def test_zoo_train_mode(name, kw):
    v, out = _run(name, train=True, **kw)
    assert out.shape == (2, 192, 5)


def test_pointnet_param_parity():
    # 3,536,526 params at num_classes=5, feature_dim=3
    # (model_performance_comparison.csv:2 'PointNet')
    v, _ = _run("pointnet")
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n == 3_536_526


def test_pointnet_global_param_parity():
    # hand-derived from model.py:266-369 (STN3d + conv stack + fc head)
    v, _ = _run("pointnet_global")
    n = sum(x.size for x in jax.tree.leaves(v["params"]))
    assert n == 3_224_590


def test_pointnet_transform_regularizer_path():
    m = get_model("pointnet", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 128, 3))
    feats = xyz
    v = m.init(key, xyz, feats, train=False)
    logits, trans = m.apply(v, xyz, feats, train=False, return_transform=True)
    assert trans.shape == (2, 64, 64)
    from pointcloud_bridge_tpu.losses import feature_transform_regularizer

    reg = float(feature_transform_regularizer(trans))
    assert np.isfinite(reg)


def test_ptv3_windowed_equals_shape_and_perm_invariance():
    """Serialized-window PTv3: output must align with input order (the
    unsort must undo the Morton sort)."""
    m = get_model(
        "ptv3", num_classes=5, embed_dim=32, depth=1, num_heads=2,
        window_size=64, drop_rate=0.0, attn_drop_rate=0.0,
    )
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (1, 256, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (1, 256, 3))
    v = m.init(key, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (1, 256, 5)
    # permuting the input points must permute the output identically
    # (windowing operates in serialized space, independent of input order)
    perm = jax.random.permutation(jax.random.PRNGKey(2), 256)
    out_p = m.apply(v, xyz[:, perm], feats[:, perm], train=False)
    np.testing.assert_allclose(
        np.asarray(out[:, perm]), np.asarray(out_p), atol=2e-4
    )


def test_registry_aliases():
    assert MODEL_REGISTRY["bridgeseg"] is MODEL_REGISTRY["bristrunet"]
    assert MODEL_REGISTRY["pointnet2"] is MODEL_REGISTRY["pointnet2_ssg"]
    with pytest.raises(KeyError):
        get_model("nope", 5)


@pytest.mark.parametrize(
    "name",
    ["pointnet_cls", "pointnet2_cls_ssg", "pointnet2_cls_msg"],
)
def test_cls_models(name):
    m = get_model(name, num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 192, 3))
    v = m.init({"params": key, "dropout": key}, xyz, None, train=False)
    out = m.apply(v, xyz, None, train=False)
    assert out.shape == (2, 5)


@pytest.mark.slow
def test_partsize_ssg_seg():
    m = get_model("pointnet2_sem_seg", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 192, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, 192, 9))
    v = m.init(key, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (2, 192, 5)


@pytest.mark.slow
def test_spg_forward():
    m = get_model("spg", num_classes=5, superpoint_size=16, knn_k=8)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 512, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 3))
    v = m.init({"params": key, "dropout": key}, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (2, 512, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_spg_train_mode():
    m = get_model("spg", num_classes=5, superpoint_size=16, knn_k=8)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 256, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, 256, 3))
    v = m.init({"params": key, "dropout": key}, xyz, feats, train=False)
    out, _ = m.apply(
        v, xyz, feats, train=True, rngs={"dropout": key}, mutable=["batch_stats"]
    )
    assert out.shape == (2, 256, 5)


def test_pointnet2_fp1_features_variant():
    m = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(16, 8, 4),
                  fp1_use_features=True)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 128, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, 128, 3))
    v = m.init(key, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (2, 128, 5)


def test_randlanet_density_sampling():
    m = get_model("randlanet", num_classes=5, sampling="density")
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 192, 3))
    v = m.init({"params": key, "dropout": key, "sampling": key},
               xyz, None, train=False)
    out, _ = m.apply(
        v, xyz, None, train=True,
        rngs={"dropout": key, "sampling": key}, mutable=["batch_stats"],
    )
    assert out.shape == (2, 192, 5)


@pytest.mark.parametrize("attn", [False, True])
def test_enhanced_pointnet2_ssg(attn):
    m = get_model("enhanced_pointnet2_ssg", num_classes=8,
                  sa_npoints=(48, 24, 12), use_attention=attn)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 192, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (2, 192, 3))
    v = m.init({"params": key, "dropout": key}, xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (2, 192, 8)


def test_migration_doc_names_resolve():
    """Doc-rot guard: every model name and CLI module MIGRATION.md mentions
    must exist (registry names in backticks; `python -m ...` modules)."""
    import importlib.util
    import re
    from pathlib import Path

    from pointcloud_bridge_tpu.models.registry import MODEL_REGISTRY

    text = (Path(__file__).parent.parent / "MIGRATION.md").read_text()
    # registry names quoted like `pointnet2_ssg` in the model-names section
    sec = text.split("## Model names")[1].split("##")[0]
    names = set(re.findall(r"`([a-z0-9_]+)`", sec)) - {"model", "models"}
    missing = {n for n in names if n not in MODEL_REGISTRY}
    assert not missing, f"MIGRATION.md names not in registry: {missing}"

    mods = set(re.findall(r"python -m ([a-zA-Z0-9_.]+)", text))
    for mod in mods:
        assert importlib.util.find_spec(mod) is not None, mod


def test_segment_quantile_stats_oracle():
    """Exact reference stat-pooling semantics (Highway_bridge/models/
    spg.py:322-357): per-segment max/mean/torch-std/index-median/index-q75
    vs a numpy per-segment loop, including empty and singleton segments."""
    import numpy as np
    import jax.numpy as jnp
    from pointcloud_bridge_tpu.models.spg import segment_quantile_stats

    rng = np.random.default_rng(0)
    b, n, c, s = 2, 64, 5, 8
    feats = rng.standard_normal((b, n, c)).astype(np.float32)
    # skewed assignment: segment 7 empty, segment 6 a singleton
    assign = rng.integers(0, 6, (b, n)).astype(np.int32)
    assign[:, 0] = 6
    onehot = np.zeros((b, n, s), np.float32)
    for bi in range(b):
        onehot[bi, np.arange(n), assign[bi]] = 1.0

    mx, mean, std, med, q75 = [
        np.asarray(t) for t in segment_quantile_stats(
            jnp.asarray(feats), jnp.asarray(onehot), jnp.asarray(assign)
        )
    ]

    for bi in range(b):
        for si in range(s):
            m = assign[bi] == si
            cnt = int(m.sum())
            if cnt == 0:
                for arr in (mx, mean, std, med, q75):
                    np.testing.assert_array_equal(arr[bi, si], 0.0)
                continue
            f = feats[bi, m]  # [cnt, C]
            np.testing.assert_allclose(mx[bi, si], f.max(0), rtol=1e-6)
            np.testing.assert_allclose(mean[bi, si], f.mean(0), rtol=1e-5,
                                       atol=1e-6)
            want_std = (f.std(0, ddof=1) + 1e-6) if cnt > 1 else np.zeros(c)
            np.testing.assert_allclose(std[bi, si], want_std, rtol=1e-4,
                                       atol=1e-6)
            fs = np.sort(f, axis=0)
            np.testing.assert_array_equal(
                med[bi, si], fs[min(cnt // 2, cnt - 1)]
            )
            np.testing.assert_array_equal(
                q75[bi, si], fs[min(3 * cnt // 4, cnt - 1)]
            )
