"""Direct parity tests of the device ops against the REFERENCE torch code
(Highway_bridge/models/pointnet2_utils.py), run on CPU torch.

The reference FPS seeds its start point with torch.randint; we seed torch,
run theirs, and feed the start indices it chose into our implementation —
the remaining iterations must match exactly.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.torchref

REF_MODELS = "/root/reference/Highway_bridge/models"


@pytest.fixture(scope="module")
def ref_ops():
    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference checkout not available")
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_pn2_utils", os.path.join(REF_MODELS, "pointnet2_utils.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def torch():
    import torch as t

    return t


def test_square_distance_matches_reference(ref_ops, torch, rng):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import square_distance

    src = rng.normal(size=(2, 64, 3)).astype(np.float32)
    dst = rng.normal(size=(2, 96, 3)).astype(np.float32)
    theirs = ref_ops.square_distance(
        torch.tensor(src), torch.tensor(dst)
    ).numpy()
    ours = np.asarray(square_distance(jnp.asarray(src), jnp.asarray(dst)))
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_fps_matches_reference(ref_ops, torch, rng):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import farthest_point_sample

    xyz = rng.uniform(size=(3, 256, 3)).astype(np.float32)
    torch.manual_seed(42)
    theirs = ref_ops.farthest_point_sample(torch.tensor(xyz), 64).numpy()
    start = theirs[:, 0].astype(np.int32)  # the torch.randint draw
    ours = np.asarray(
        farthest_point_sample(jnp.asarray(xyz), 64, start_idx=jnp.asarray(start))
    )
    np.testing.assert_array_equal(ours, theirs)


def test_query_ball_point_matches_reference(ref_ops, torch, rng):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import query_ball_point

    xyz = rng.uniform(size=(2, 128, 3)).astype(np.float32)
    new_xyz = xyz[:, :32]
    theirs = ref_ops.query_ball_point(
        0.3, 16, torch.tensor(xyz), torch.tensor(new_xyz)
    ).numpy()
    ours = np.asarray(
        query_ball_point(0.3, 16, jnp.asarray(xyz), jnp.asarray(new_xyz),
                         approx=False)
    )
    np.testing.assert_array_equal(ours, theirs)


def test_index_points_matches_reference(ref_ops, torch, rng):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import index_points

    pts = rng.normal(size=(2, 50, 7)).astype(np.float32)
    idx = rng.integers(0, 60, size=(2, 10, 4))  # includes out-of-range (clamped)
    theirs = ref_ops.index_points(
        torch.tensor(pts), torch.tensor(idx)
    ).numpy()
    ours = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
    np.testing.assert_allclose(ours, theirs)


def test_sample_and_group_matches_reference(ref_ops, torch, rng):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import (
        farthest_point_sample,
        group_points,
        index_points,
        query_ball_point,
    )

    xyz = rng.uniform(size=(2, 128, 3)).astype(np.float32)
    feats = rng.normal(size=(2, 128, 5)).astype(np.float32)
    torch.manual_seed(7)
    new_xyz_t, new_points_t = ref_ops.sample_and_group(
        32, 0.25, 8, torch.tensor(xyz), torch.tensor(feats)
    )
    # recover the reference's random FPS start by re-running its FPS with the
    # same torch seed
    torch.manual_seed(7)
    fps_t = ref_ops.farthest_point_sample(torch.tensor(xyz), 32).numpy()
    start = fps_t[:, 0].astype(np.int32)

    fps_idx = farthest_point_sample(jnp.asarray(xyz), 32, jnp.asarray(start))
    np.testing.assert_array_equal(np.asarray(fps_idx), fps_t)
    new_xyz = index_points(jnp.asarray(xyz), fps_idx)
    idx = query_ball_point(0.25, 8, jnp.asarray(xyz), new_xyz, approx=False)
    grouped = group_points(jnp.asarray(xyz), new_xyz, idx, jnp.asarray(feats))
    np.testing.assert_allclose(np.asarray(new_xyz), new_xyz_t.numpy(), atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(grouped), new_points_t.numpy(), atol=1e-5
    )


def test_three_nn_interpolation_matches_reference(ref_ops, torch, rng):
    """FeaturePropagation's interpolation core (pointnet2_utils.py:184-196):
    replicate the torch math directly and compare with our op."""
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.ops import three_nn_interpolate

    xyz1 = rng.uniform(size=(2, 64, 3)).astype(np.float32)
    xyz2 = rng.uniform(size=(2, 24, 3)).astype(np.float32)
    feats2 = rng.normal(size=(2, 24, 6)).astype(np.float32)

    t_xyz1, t_xyz2 = torch.tensor(xyz1), torch.tensor(xyz2)
    dists = ref_ops.square_distance(t_xyz1, t_xyz2)
    dists, idx = dists.sort(dim=-1)
    dists, idx = dists[:, :, :3], idx[:, :, :3]
    recip = 1.0 / (dists + 1e-8)
    norm = recip.sum(dim=2, keepdim=True)
    weight = recip / norm
    theirs = (
        ref_ops.index_points(torch.tensor(feats2), idx)
        * weight.view(2, 64, 3, 1)
    ).sum(dim=2).numpy()

    ours = np.asarray(
        three_nn_interpolate(
            jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(feats2),
            approx=False,
        )
    )
    np.testing.assert_allclose(ours, theirs, atol=2e-5)


def test_multiscale_sa_module_matches_reference(ref_ops, torch, rng):
    """The Highway MSG set-abstraction block (MultiScaleSetAbstraction,
    pointnet2_utils.py:302-360) with TRANSFERRED torch weights must match our
    models/common.py module: FPS start pinned to 0 on both sides, randomized
    BN affine + running stats so the mapping is actually exercised. This
    carries the module-level parity for the one reference component whose
    enclosing model (EnhancedPointNet2) is intentionally non-mappable
    (utils/torch_import.py docstring)."""
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models.common import MultiScaleSetAbstraction
    from pointcloud_bridge_tpu.utils.torch_import import (
        convert_state_dict,
        validate_variables,
    )

    b, n, c = 2, 128, 6
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.normal(size=(b, n, c)).astype(np.float32)

    tm = ref_ops.MultiScaleSetAbstraction(
        npoint=32, radius_list=[0.3, 0.5], nsample_list=[8, 16],
        in_channel=c + 3, mlp=[16, 32],
    ).eval()
    g = torch.Generator().manual_seed(7)
    for m in tm.modules():
        if isinstance(m, torch.nn.BatchNorm2d):
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(
                    0.5 + torch.rand(m.running_var.shape, generator=g)
                )

    ours = MultiScaleSetAbstraction(
        npoint=32, radius_list=(0.3, 0.5), nsample_list=(8, 16), mlp=(16, 32)
    )
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict("multiscale_sa", sd, strict=True)
    init_vars = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats),
        train=False,
    )
    validate_variables(variables, init_vars)

    # pin the reference's torch.randint FPS start to 0 (ours defaults to 0)
    orig_fps = ref_ops.farthest_point_sample

    def det_fps(x, npoint):
        B, N, _ = x.shape
        centroids = torch.zeros(B, npoint, dtype=torch.long)
        distance = torch.ones(B, N) * 1e10
        farthest = torch.zeros(B, dtype=torch.long)
        bidx = torch.arange(B, dtype=torch.long)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = x[bidx, farthest, :].view(B, 1, 3)
            dist = torch.sum((x - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = torch.max(distance, -1)[1]
        return centroids

    ref_ops.farthest_point_sample = det_fps
    try:
        with torch.no_grad():
            t_xyz, t_pts = tm(
                torch.tensor(xyz), torch.tensor(np.swapaxes(feats, 1, 2))
            )
    finally:
        ref_ops.farthest_point_sample = orig_fps
    theirs_xyz = t_xyz.numpy()
    theirs = np.swapaxes(t_pts.numpy(), 1, 2)  # [B, S, sum(mlp[-1])]

    got_xyz, got = ours.apply(
        variables, jnp.asarray(xyz), jnp.asarray(feats), train=False
    )
    np.testing.assert_allclose(np.asarray(got_xyz), theirs_xyz, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got), theirs, rtol=5e-4, atol=5e-4)
