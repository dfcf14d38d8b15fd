"""Numpy-oracle tests for the core point-cloud ops (SURVEY.md §4 test pyramid,
level 1: pure-function kernels vs naive references)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.ops import (
    square_distance,
    index_points,
    farthest_point_sample,
    query_ball_point,
    knn,
    sample_and_group,
    three_nn_interpolate,
    edge_conv_graph_feature,
    eigh3x3,
    local_structure_features,
    estimate_normals,
    random_sample_indices,
)
from pointcloud_bridge_tpu.ops.structure import min_eigvec3x3


# ---------- numpy oracles (naive, loop-based) ----------


def np_square_distance(src, dst):
    return ((src[:, :, None, :] - dst[:, None, :, :]) ** 2).sum(-1)


def np_fps(xyz, npoint, start=0):
    b, n, _ = xyz.shape
    out = np.zeros((b, npoint), dtype=np.int64)
    for bi in range(b):
        dist = np.full(n, 1e10)
        far = start
        for i in range(npoint):
            out[bi, i] = far
            d = ((xyz[bi] - xyz[bi, far]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            far = int(dist.argmax())
    return out


def np_ball_query(radius, nsample, xyz, new_xyz):
    b, n, _ = xyz.shape
    s = new_xyz.shape[1]
    out = np.zeros((b, s, nsample), dtype=np.int64)
    for bi in range(b):
        for si in range(s):
            d = ((xyz[bi] - new_xyz[bi, si]) ** 2).sum(-1)
            hits = np.where(d <= radius**2)[0]
            row = np.full(nsample, n, dtype=np.int64)
            row[: min(nsample, len(hits))] = hits[:nsample]
            if len(hits) > 0:
                row[row == n] = row[0]
            out[bi, si] = row
    return out


# ---------- tests ----------


def test_square_distance(rng):
    src = rng.normal(size=(2, 37, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 53, 3)).astype(np.float32)
    got = np.asarray(square_distance(jnp.array(src), jnp.array(dst)))
    want = np_square_distance(src, dst)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_index_points_clamps(rng):
    pts = rng.normal(size=(2, 10, 4)).astype(np.float32)
    idx = np.array([[[0, 9, 15], [3, -2, 5]], [[1, 1, 1], [0, 0, 10]]])
    got = np.asarray(index_points(jnp.array(pts), jnp.array(idx)))
    idx_c = np.clip(idx, 0, 9)
    want = np.stack([pts[b][idx_c[b]] for b in range(2)])
    np.testing.assert_allclose(got, want)


def test_fps_matches_oracle(rng):
    xyz = rng.normal(size=(3, 128, 3)).astype(np.float32)
    got = np.asarray(farthest_point_sample(jnp.array(xyz), 32, use_pallas=False))
    want = np_fps(xyz, 32)
    np.testing.assert_array_equal(got, want)


def test_fps_covers_spread_points():
    # 8 corners of a cube + jitter cluster at origin: FPS must pick corners first.
    corners = np.array(
        [[x, y, z] for x in (0, 10) for y in (0, 10) for z in (0, 10)],
        dtype=np.float32,
    )
    cluster = np.random.default_rng(1).normal(scale=0.01, size=(56, 3)).astype(
        np.float32
    ) + 5.0
    xyz = np.concatenate([corners, cluster])[None]
    idx = np.asarray(farthest_point_sample(jnp.array(xyz), 8, start_idx=0))
    # The first 8 picks should include >= 7 of the 8 corners (start point is
    # corner 0 itself).
    assert len(set(idx[0]) & set(range(8))) >= 7


def test_ball_query_matches_oracle(rng):
    xyz = rng.uniform(size=(2, 64, 3)).astype(np.float32)
    new_xyz = xyz[:, :16]
    got = np.asarray(query_ball_point(0.3, 8, jnp.array(xyz), jnp.array(new_xyz)))
    want = np_ball_query(0.3, 8, xyz, new_xyz)
    np.testing.assert_array_equal(got, want)


def test_ball_query_empty_ball():
    xyz = jnp.array([[[0.0, 0, 0], [1, 0, 0], [100, 100, 100]]])
    new_xyz = jnp.array([[[100.0, 100, 100], [50, 50, 50]]])
    idx = np.asarray(query_ball_point(0.5, 4, xyz, new_xyz))
    # ball around point 2 only contains itself
    np.testing.assert_array_equal(idx[0, 0], [2, 2, 2, 2])
    # empty ball encodes N everywhere (clamped later by index_points)
    np.testing.assert_array_equal(idx[0, 1], [3, 3, 3, 3])


def test_knn(rng):
    xyz = rng.normal(size=(2, 40, 3)).astype(np.float32)
    idx = np.asarray(knn(jnp.array(xyz), k=5))
    d = np_square_distance(xyz, xyz)
    want = np.argsort(d, axis=-1, kind="stable")[:, :, :5]
    # compare sets per-point (tie order may differ)
    got_d = np.take_along_axis(d, idx, -1)
    want_d = np.take_along_axis(d, want, -1)
    np.testing.assert_allclose(np.sort(got_d), np.sort(want_d), atol=1e-4)
    # nearest neighbor of each point is itself
    np.testing.assert_array_equal(idx[:, :, 0], np.arange(40)[None].repeat(2, 0))


def test_sample_and_group_shapes(rng):
    xyz = rng.uniform(size=(2, 256, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 256, 7)).astype(np.float32)
    new_xyz, new_points, fps_idx = sample_and_group(
        64, 0.2, 16, jnp.array(xyz), jnp.array(feats)
    )
    assert new_xyz.shape == (2, 64, 3)
    assert new_points.shape == (2, 64, 16, 10)
    assert fps_idx.shape == (2, 64)
    # grouped xyz are center-relative: first neighbor of each ball is within r
    rel = np.asarray(new_points)[..., :3]
    assert (np.linalg.norm(rel[:, :, 0], axis=-1) <= 0.2 + 1e-5).all()


def test_three_nn_interpolate_exact_at_source(rng):
    # interpolating source features onto the source points returns them
    xyz = rng.normal(size=(2, 32, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 32, 5)).astype(np.float32)
    out = np.asarray(
        three_nn_interpolate(jnp.array(xyz), jnp.array(xyz), jnp.array(feats))
    )
    # nearest neighbor is the point itself with dist 0 => weight ~1
    np.testing.assert_allclose(out, feats, atol=1e-3)


def test_three_nn_interpolate_weights(rng):
    xyz_src = jnp.array([[[0.0, 0, 0], [2, 0, 0], [0, 2, 0], [5, 5, 5]]])
    feats = jnp.array([[[1.0], [2.0], [3.0], [100.0]]])
    xyz_dst = jnp.array([[[1.0, 0, 0]]])  # equidistant from src0 and src1
    out = np.asarray(three_nn_interpolate(xyz_dst, xyz_src, feats))
    d = np.array([1.0, 1.0, np.sqrt(5) ** 2])  # squared dists: 1, 1, 5
    w = 1 / (np.array([1.0, 1.0, 5.0]) + 1e-8)
    w = w / w.sum()
    want = (w * np.array([1.0, 2.0, 3.0])).sum()
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_three_nn_fewer_sources_than_k(rng):
    # S < k clamps to a blend over ALL sources — the reference's FP slices
    # [:, :, :3] after a sort, which a torch slice clamps to S columns.
    # (Hit by tiny-npoint configs, e.g. the 2-device dryrun's sa_npoints.)
    xyz_src = jnp.array([[[0.0, 0, 0], [2.0, 0, 0]]])  # S=2
    feats = jnp.array([[[1.0], [5.0]]])
    xyz_dst = jnp.array([[[0.5, 0, 0]]])
    out = np.asarray(three_nn_interpolate(xyz_dst, xyz_src, feats, k=3))
    d2 = np.array([0.25, 2.25])  # squared distances
    w = 1 / (d2 + 1e-8)
    w = w / w.sum()
    want = (w * np.array([1.0, 5.0])).sum()
    np.testing.assert_allclose(out[0, 0, 0], want, rtol=1e-5)


def test_three_nn_s1_broadcast(rng):
    xyz_dst = jnp.array(rng.normal(size=(2, 8, 3)).astype(np.float32))
    xyz_src = jnp.array(rng.normal(size=(2, 1, 3)).astype(np.float32))
    feats = jnp.array(rng.normal(size=(2, 1, 4)).astype(np.float32))
    out = np.asarray(three_nn_interpolate(xyz_dst, xyz_src, feats))
    np.testing.assert_allclose(out, np.broadcast_to(np.asarray(feats), (2, 8, 4)))


def test_edge_conv_graph_feature(rng):
    x = rng.normal(size=(2, 30, 6)).astype(np.float32)
    out = np.asarray(edge_conv_graph_feature(jnp.array(x), k=4))
    assert out.shape == (2, 30, 4, 12)
    # self is always the nearest neighbor -> first edge diff is zero, center half is x
    np.testing.assert_allclose(out[:, :, 0, :6], 0.0, atol=1e-6)
    np.testing.assert_allclose(out[:, :, 0, 6:], x, atol=1e-6)


def test_eigh3x3_vs_numpy(rng):
    v = rng.normal(size=(64, 8, 3)).astype(np.float32)
    a = np.einsum("nki,nkj->nij", v, v)
    got = np.asarray(eigh3x3(jnp.array(a)))
    want = np.linalg.eigvalsh(a)[:, ::-1]  # descending
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_min_eigvec3x3(rng):
    v = rng.normal(size=(32, 10, 3)).astype(np.float64)
    a = np.einsum("nki,nkj->nij", v, v)
    got = np.asarray(min_eigvec3x3(jnp.array(a.astype(np.float32))))
    w, vec = np.linalg.eigh(a)
    want = vec[:, :, 0]
    # direction match up to sign
    cos = np.abs(np.sum(got * want, axis=-1))
    assert (cos > 0.99).all()


def test_local_structure_features_planar(rng):
    # points on a plane: planarity ~1, sphericity ~0, z-stats ~0 for z=const
    pts = rng.uniform(-1, 1, size=(1, 64, 3)).astype(np.float32)
    pts[..., 2] = 0.0
    from pointcloud_bridge_tpu.ops.structure import knn_relative_positions

    rel, _ = knn_relative_positions(jnp.array(pts), k=16)
    feats = np.asarray(local_structure_features(rel))
    assert feats.shape == (1, 64, 13)
    linearity = feats[..., 0]
    planarity = feats[..., 1]
    sphericity = feats[..., 2]
    # for coplanar points: l3 ~ 0 so sphericity ~ 0 and lin+plan ~ 1
    assert sphericity.mean() < 0.05
    assert (linearity + planarity).mean() > 0.95
    z_range = feats[..., 8]
    np.testing.assert_allclose(z_range, 0.0, atol=1e-5)


def test_estimate_normals_plane(rng):
    pts = rng.uniform(-1, 1, size=(1, 128, 3)).astype(np.float32)
    pts[..., 2] = 0.25 * pts[..., 0]  # plane z = x/4, normal ∝ (-1, 0, 4)
    n = np.asarray(estimate_normals(jnp.array(pts), k=12))
    want = np.array([-0.25, 0, 1.0])
    want = want / np.linalg.norm(want)
    cos = np.abs(n @ want)
    assert (cos > 0.99).mean() > 0.95


def test_random_sample_indices():
    key = jax.random.PRNGKey(0)
    idx = np.asarray(random_sample_indices(key, 100, 30, batch=4))
    assert idx.shape == (4, 30)
    for row in idx:
        assert len(set(row.tolist())) == 30  # no duplicates
        assert row.min() >= 0 and row.max() < 100
    # rows differ
    assert not (idx[0] == idx[1]).all()


def test_three_nn_matmul_blend_matches_gather(rng, monkeypatch):
    """The TPU one-hot-matmul blend path must match the gather path (same
    neighbor selection, different reduction; tolerance covers sum order)."""
    import pointcloud_bridge_tpu.ops.interpolate as interp

    xyz_dst = jnp.asarray(rng.uniform(size=(2, 256, 3)).astype(np.float32))
    xyz_src = jnp.asarray(rng.uniform(size=(2, 64, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(2, 64, 32)).astype(np.float32))

    monkeypatch.setenv("PCB_INTERP_MATMUL", "0")
    want = np.asarray(three_nn_interpolate(xyz_dst, xyz_src, feats, k=4))
    monkeypatch.setenv("PCB_INTERP_MATMUL", "1")
    got = np.asarray(three_nn_interpolate(xyz_dst, xyz_src, feats, k=4))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_three_nn_matmul_blend_grad_flows(rng, monkeypatch):
    import pointcloud_bridge_tpu.ops.interpolate as interp

    monkeypatch.setenv("PCB_INTERP_MATMUL", "1")
    xyz_dst = jnp.asarray(rng.uniform(size=(1, 64, 3)).astype(np.float32))
    xyz_src = jnp.asarray(rng.uniform(size=(1, 16, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(1, 16, 8)).astype(np.float32))

    g = jax.grad(
        lambda f: jnp.sum(three_nn_interpolate(xyz_dst, xyz_src, f) ** 2)
    )(feats)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
