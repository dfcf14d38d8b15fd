"""SuperPointTransformer + superpoint preprocessing tests."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.data.superpoints import (
    compute_normals_host,
    compute_geometric_features,
    generate_superpoints,
    build_graph,
    pad_graph,
)
from pointcloud_bridge_tpu.models.spt import SuperPointTransformer
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene


@pytest.fixture(scope="module")
def sp_graph():
    xyz, rgb, labels = toy_bridge_scene(4000, seed=0)
    normals = compute_normals_host(xyz, k=12)
    sp_labels, sp_feats = generate_superpoints(xyz, rgb, normals, min_points=10,
                                               eps=0.8)
    assert len(sp_feats) >= 2, f"expected >=2 superpoints, got {len(sp_feats)}"
    ei, ea = build_graph(sp_feats, k_neighbors=4)
    return sp_labels, sp_feats, ei, ea


def test_normals_and_geometric_features():
    xyz, rgb, _ = toy_bridge_scene(2000, seed=1)
    n = compute_normals_host(xyz, k=10)
    assert n.shape == xyz.shape
    np.testing.assert_allclose(np.linalg.norm(n, axis=1), 1.0, atol=1e-5)
    g = compute_geometric_features(xyz, n, k=10)
    assert g.shape == (len(xyz), 3)
    assert (g[:, 0] >= -1e-6).all() and (g[:, 0] <= 1 + 1e-6).all()


def test_superpoint_graph_shapes(sp_graph):
    sp_labels, sp_feats, ei, ea = sp_graph
    s = len(sp_feats)
    assert ei.shape[0] == 2
    assert ea.shape[0] == ei.shape[1]
    assert ei.max() < s
    # bidirectional edges
    pairs = set(map(tuple, ei.T.tolist()))
    assert all((j, i) in pairs for (i, j) in list(pairs)[:20])


def test_spt_forward(sp_graph):
    _, sp_feats, ei, ea = sp_graph
    x, ei_p, ea_p, nm, em = pad_graph(
        sp_feats.astype(np.float32), ei, ea, max_nodes=64, max_edges=512
    )
    model = SuperPointTransformer(
        num_classes=5, hidden_channels=32, num_layers=2, num_heads=4
    )
    key = jax.random.PRNGKey(0)
    v = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(x), jnp.asarray(ei_p), jnp.asarray(ea_p), jnp.asarray(em),
        train=False,
    )
    out = model.apply(
        v, jnp.asarray(x), jnp.asarray(ei_p), jnp.asarray(ea_p), jnp.asarray(em),
        train=False,
    )
    assert out.shape == (64, 5)
    assert np.isfinite(np.asarray(out)).all()


def test_spt_train_mode(sp_graph):
    _, sp_feats, ei, ea = sp_graph
    x, ei_p, ea_p, nm, em = pad_graph(
        sp_feats.astype(np.float32), ei, ea, max_nodes=64, max_edges=512
    )
    model = SuperPointTransformer(
        num_classes=5, hidden_channels=32, num_layers=1, num_heads=4
    )
    key = jax.random.PRNGKey(0)
    v = model.init(
        {"params": key, "dropout": key},
        jnp.asarray(x), jnp.asarray(ei_p), jnp.asarray(ea_p), jnp.asarray(em),
        train=False,
    )
    out, _ = model.apply(
        v, jnp.asarray(x), jnp.asarray(ei_p), jnp.asarray(ea_p), jnp.asarray(em),
        train=True, rngs={"dropout": key}, mutable=["batch_stats"],
    )
    assert out.shape == (64, 5)
