"""Tests for the extra sampler variants and the completion processor."""

import numpy as np
import pytest

from pointcloud_bridge_tpu.data.samplers_extra import (
    simple_random_blocks,
    chunked_blocks,
    validation_chunk_subset,
    overlapping_grid_blocks,
    hv_grid_blocks,
    _numpy_fps,
)
from pointcloud_bridge_tpu.data.completion import (
    complete_girder,
    complete_deck,
    complete_parapet,
    complete_pier,
    complete_scene,
)
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene


@pytest.fixture(scope="module")
def scene():
    return toy_bridge_scene(12000, seed=0)


def test_simple_random_blocks(scene):
    xyz, rgb, labels = scene
    blocks = simple_random_blocks(xyz, rgb, labels, 512, steps_per_file=3)
    assert len(blocks) == 3
    for b in blocks:
        assert b.points.shape == (512, 3)
        assert np.isfinite(b.points).all()


def test_simple_random_blocks_empty_placeholder():
    z = np.zeros((0, 3), np.float32)
    blocks = simple_random_blocks(z, z, np.zeros(0, np.int64), 128)
    assert blocks[0].points.shape == (128, 3)
    assert (blocks[0].points == 0).all()


def test_chunked_blocks_and_validation_subset(scene):
    xyz, rgb, labels = scene
    blocks = chunked_blocks(xyz, rgb, labels, num_points=512,
                            chunk_size=2048, overlap=256)
    expected = max(1, (len(xyz) - 256) // (2048 - 256))
    assert len(blocks) == expected
    for b in blocks[:2]:
        assert b.points.shape == (512, 3)
    val = validation_chunk_subset(blocks, fraction=0.3, seed=42)
    assert len(val) == max(1, int(len(blocks) * 0.3))
    val2 = validation_chunk_subset(blocks, fraction=0.3, seed=42)
    assert [id(a) for a in val] == [id(a) for a in val2]  # seeded determinism


def test_numpy_fps_matches_jax():
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops.sampling import _fps_jnp

    rng = np.random.default_rng(0)
    xyz = rng.uniform(size=(200, 3)).astype(np.float32)
    want = np.asarray(_fps_jnp(jnp.asarray(xyz[None]), 50))[0]
    got = _numpy_fps(xyz, 50)
    np.testing.assert_array_equal(got, want)


def test_overlapping_grid_blocks(scene):
    xyz, rgb, labels = scene
    blocks = overlapping_grid_blocks(
        xyz, rgb, labels, num_points=256, block_size=8.0, overlap=0.3,
        min_points=50,
    )
    assert len(blocks) > 0
    for b in blocks[:3]:
        assert b.points.shape == (256, 3)
        # centered coordinates
        assert np.abs(b.points[:, 0]).max() <= 8.0


def test_hv_grid_blocks(scene):
    xyz, rgb, labels = scene
    blocks = hv_grid_blocks(
        xyz, rgb, labels, num_points=256,
        h_block_size=10.0, v_block_size=4.0, h_stride=10.0, v_stride=4.0,
        min_points=50,
    )
    assert len(blocks) > 0
    assert blocks[0].points.shape == (256, 3)


def test_completion_functions():
    rng = np.random.default_rng(0)
    # girder: line along x with a square cross-section
    t = rng.uniform(0, 10, 2000)
    girder = np.stack(
        [t, 0.2 * rng.uniform(-1, 1, 2000), 0.2 * rng.uniform(-1, 1, 2000)], 1
    )
    g = complete_girder(girder, 0.1)
    assert len(g) > 0 and g.shape[1] == 3

    deck = np.stack(
        [rng.uniform(0, 5, 3000), rng.uniform(0, 3, 3000),
         2.0 + 0.01 * rng.normal(size=3000)], 1,
    )
    d = complete_deck(deck, 0.1)
    assert len(d) > 100
    assert abs(d[:, 2].mean() - 2.0) < 0.1  # heights interpolated near plane

    parapet = np.stack(
        [rng.uniform(0, 5, 1500), 0.05 * rng.normal(size=1500),
         rng.uniform(0, 1, 1500)], 1,
    )
    p = complete_parapet(parapet, 0.2)
    assert len(p) > 0

    theta = rng.uniform(0, 2 * np.pi, 2000)
    pier = np.stack(
        [0.5 * np.cos(theta), 0.5 * np.sin(theta), rng.uniform(0, 4, 2000)], 1
    )
    q = complete_pier(pier, 0.2)
    assert len(q) >= len(pier) * 0.5
    radii = np.linalg.norm(q[:, :2], axis=1)
    assert 0.2 < np.median(radii) < 0.8  # radial structure preserved


def test_complete_scene(scene):
    xyz, rgb, labels = scene
    p2, c2, l2 = complete_scene(xyz, rgb, labels, voxel_size=0.3)
    assert len(p2) > len(xyz)  # completions appended
    assert len(p2) == len(c2) == len(l2)
