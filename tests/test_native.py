"""Native C++ preprocessing library vs numpy oracles."""

import numpy as np
import pytest

from pointcloud_bridge_tpu.data import native


def test_native_builds():
    assert native.native_available(), "g++ build of libpcbpre.so failed"


def test_points_in_block_matches_numpy(rng):
    pts = rng.uniform(-5, 5, (5000, 3)).astype(np.float32)
    bmin = np.array([-1.0, -1.0, 0.0])
    bmax = np.array([1.0, 1.0, 0.0])
    got = native.points_in_block_mask(pts, bmin, bmax, 2.0)
    from pointcloud_bridge_tpu.data.blocks import points_in_block

    want_idx = points_in_block(pts, bmin, bmax, 2.0)
    np.testing.assert_array_equal(np.where(got)[0], want_idx)


def test_multi_block_masks(rng):
    pts = rng.uniform(-5, 5, (2000, 3)).astype(np.float32)
    centers = rng.uniform(-4, 4, (7, 3)).astype(np.float32)
    got = native.multi_block_masks(pts, centers, 2.0, 1.5)
    assert got.shape == (7, 2000)
    h = 1.0
    for i, c in enumerate(centers):
        want = (
            (np.abs(pts[:, 0] - c[0]) <= h)
            & (np.abs(pts[:, 1] - c[1]) <= h)
            & (np.abs(pts[:, 2] - c[2]) <= 1.5)
        )
        np.testing.assert_array_equal(got[i], want)


def test_voxel_first_indices_matches_numpy(rng):
    pts = rng.uniform(-3, 3, (8000, 3))
    got = native.voxel_first_indices(pts, 0.5)
    coords = np.floor(pts / 0.5).astype(np.int64)
    _, want = np.unique(coords, axis=0, return_index=True)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))


def test_voxel_centroids(rng):
    pts = rng.uniform(0, 2, (3000, 3))
    cent, vid = native.voxel_centroids(pts, 0.5)
    assert vid.shape == (3000,)
    assert cent.shape[0] == vid.max() + 1
    # each centroid is the mean of its member points
    for v in range(min(5, len(cent))):
        np.testing.assert_allclose(cent[v], pts[vid == v].mean(0), atol=1e-9)


def test_label_histogram(rng):
    labels = rng.integers(0, 5, 100000).astype(np.int32)
    got = native.label_histogram(labels, 5)
    np.testing.assert_array_equal(got, np.bincount(labels, minlength=5))


def test_las_decode_native_matches_numpy(tmp_path, rng):
    """Native one-pass LAS decode must be bit-identical to the numpy strided
    fallback, including scale/offset application and classification masking."""
    import pointcloud_bridge_tpu.data.native as N
    from pointcloud_bridge_tpu.data.lasio import read_las, write_las

    if not N.native_available():
        pytest.skip("native library unavailable")
    xyz = rng.uniform(-50, 50, (5000, 3))
    rgb = rng.uniform(0, 1, (5000, 3))
    labels = rng.integers(0, 5, 5000).astype(np.uint8)
    p = str(tmp_path / "t.las")
    write_las(p, xyz, rgb, labels)

    fast = read_las(p)
    real = N.las_decode
    try:
        N.las_decode = lambda *a, **k: None
        slow = read_las(p)
    finally:
        N.las_decode = real
    np.testing.assert_array_equal(fast.xyz, slow.xyz)
    np.testing.assert_array_equal(fast.rgb, slow.rgb)
    np.testing.assert_array_equal(fast.classification, slow.classification)
    np.testing.assert_array_equal(fast.intensity, slow.intensity)


def test_grid_cell_members_native_matches_numpy(rng, monkeypatch):
    from pointcloud_bridge_tpu.data import blocks

    pts = np.zeros((20000, 6), np.float32)
    pts[:, 0] = rng.uniform(0, 23.7, 20000)
    pts[:, 1] = rng.uniform(0, 11.3, 20000)
    pts[:, 2] = rng.uniform(0, 4, 20000)
    cmin = pts[:, :3].min(axis=0)
    cmax = pts[:, :3].max(axis=0)
    bs, stride, pad = 5.0, 2.5, 0.001
    gx = int(np.ceil((cmax[0] - cmin[0] - bs) / stride) + 1)
    gy = int(np.ceil((cmax[1] - cmin[1] - bs) / stride) + 1)

    def run():
        return list(
            blocks._grid_cell_members(pts, cmin, cmax, gx, gy, bs, stride, pad)
        )

    monkeypatch.setenv("PCB_NATIVE_GRID", "0")
    ref = run()
    monkeypatch.setenv("PCB_NATIVE_GRID", "1")
    assert native.native_available()
    got = run()
    assert len(got) == len(ref)
    for (ca, pa), (cb, pb) in zip(got, ref):
        assert ca == cb
        np.testing.assert_array_equal(pa, pb)
