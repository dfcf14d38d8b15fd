"""Data layer tests: LAS round-trip, H5 round-trip, block sampler contracts,
whole-scene grid coverage, dataset caching and batching."""

import os

import numpy as np
import pytest

from pointcloud_bridge_tpu.data import (
    read_las,
    write_las,
    read_las_xyzrgbl,
    read_h5,
    write_h5,
    normalize_points,
    points_in_block,
    stratified_sample_indices,
    weighted_stratified_sample_indices,
    boosted_class_proportions,
    make_training_blocks,
    s3dis_column_block,
    whole_scene_grid_blocks,
    scene_labelweights,
    split_files,
    BlockDataset,
)
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene


def test_las_roundtrip(tmp_path, rng):
    xyz = rng.uniform(-100, 100, (1000, 3))
    rgb = rng.uniform(0, 1, (1000, 3)).astype(np.float32)
    labels = rng.integers(0, 5, 1000).astype(np.uint8)
    p = str(tmp_path / "test.las")
    write_las(p, xyz, rgb, labels)
    las = read_las(p)
    np.testing.assert_allclose(las.xyz, xyz, atol=1e-3)  # mm scale
    np.testing.assert_array_equal(las.classification, labels)
    np.testing.assert_allclose(las.colors01, rgb, atol=1.0 / 65535)
    arr = read_las_xyzrgbl(p)
    assert arr.shape == (1000, 7)
    np.testing.assert_array_equal(arr[:, 6].astype(int), labels)


def test_h5_roundtrip(tmp_path, rng):
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    cols = rng.uniform(size=(500, 3)).astype(np.float32)
    labs = rng.integers(0, 5, 500)
    p = str(tmp_path / "t.h5")
    write_h5(p, pts, cols, labs)
    p2, c2, l2 = read_h5(p)
    np.testing.assert_allclose(p2, pts)
    np.testing.assert_array_equal(l2, labs)


def test_normalize_points(rng):
    pts = rng.uniform(5, 10, (200, 3))
    n = normalize_points(pts)
    np.testing.assert_allclose(n.mean(0), 0, atol=1e-9)
    assert np.sqrt((n**2).sum(1)).max() <= 1.0 + 1e-9


def test_points_in_block():
    pts = np.array(
        [[0.5, 0.5, 0.0], [0.5, 0.5, 3.0], [2.0, 0.5, 0.0], [0.9, 0.9, -1.9]]
    )
    idx = points_in_block(pts, np.array([0, 0, 0.0]), np.array([1, 1, 0.0]), 2.0)
    np.testing.assert_array_equal(idx, [0, 3])


def test_stratified_sampling_min_ratio(rng):
    labels = np.concatenate([np.zeros(9000), np.ones(500), np.full(500, 2)]).astype(
        int
    )
    idx = stratified_sample_indices(labels, 4096, 3, 0.05, rng)
    assert len(idx) == 4096
    counts = np.bincount(labels[idx], minlength=3)
    assert counts[1] >= int(4096 * 0.05)
    assert counts[2] >= int(4096 * 0.05)


def test_weighted_stratified_sampling(rng):
    labels = np.concatenate([np.zeros(9000), np.ones(100)]).astype(int)
    props = boosted_class_proportions(labels)
    assert props[1] > 100 / 9100  # rare class boosted
    idx = weighted_stratified_sample_indices(labels, 4096, props, rng)
    assert len(idx) == 4096
    frac1 = (labels[idx] == 1).mean()
    assert frac1 > 0.01  # boosted above raw 1.1%


def test_make_training_blocks():
    xyz, rgb, labels = toy_bridge_scene(30000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=1024, block_size=2.0, sample_rate=0.2
    )
    assert len(blocks) >= 1
    for b in blocks[:3]:
        assert b.points.shape == (1024, 3)
        assert np.sqrt((b.points**2).sum(1)).max() <= 1.0 + 1e-6
        assert b.labels.shape == (1024,)
        # indices map back to original scene points
        np.testing.assert_allclose(
            b.original_points, xyz[b.indices], atol=1e-6
        )


def test_s3dis_column_block(rng):
    xyz, rgb, labels = toy_bridge_scene(20000, seed=1)
    pts6 = np.concatenate([xyz, rgb], axis=1)
    cmin, cmax = xyz.min(0), xyz.max(0)
    out, labs = s3dis_column_block(pts6, labels, cmin, cmax, 2048, 1.0, rng)
    assert out.shape == (2048, 9)
    assert labs.shape == (2048,)
    # centered x,y within block
    assert np.abs(out[:, 0]).max() <= 0.5 + 1e-6
    # normalized channels are raw coords / extent (reference does NOT shift by
    # coord_min, BridgeDataLoader.py:143-146)
    ext = cmax - cmin
    sel_z = out[:, 2]
    np.testing.assert_allclose(out[:, 8], sel_z / ext[2], atol=1e-5)


def test_whole_scene_grid_covers_every_point():
    xyz, rgb, labels = toy_bridge_scene(8000, seed=2)
    pts6 = np.concatenate([xyz, rgb], axis=1)
    lw = scene_labelweights([labels], 5)
    data, labs, wts, idxs = whole_scene_grid_blocks(
        pts6, labels, lw, block_points=1024, block_size=4.0, stride=2.0
    )
    assert data.shape[1:] == (1024, 9)
    covered = np.unique(idxs.reshape(-1))
    assert len(covered) == len(xyz)  # every original point appears >= once
    # labels in blocks match scene labels at those indices
    np.testing.assert_array_equal(labs[0], labels[idxs[0]])


def _grid_blocks_naive(
    points6, labels, labelweights, block_points, block_size, stride,
    padding=0.001, center_xy=True, seed=0,
):
    """Reference per-cell O(grid·N) scan implementation — the oracle for the
    vectorized binning in blocks.py::_grid_cell_members (bit-exact incl. RNG
    call order)."""
    rng = np.random.default_rng(seed)
    coord_min = points6[:, :3].min(axis=0)
    coord_max = points6[:, :3].max(axis=0)
    grid_x = int(np.ceil((coord_max[0] - coord_min[0] - block_size) / stride) + 1)
    grid_y = int(np.ceil((coord_max[1] - coord_min[1] - block_size) / stride) + 1)
    grid_x, grid_y = max(grid_x, 1), max(grid_y, 1)
    datas, labs, wts, idxs = [], [], [], []
    ext = coord_max - coord_min
    for iy in range(grid_y):
        for ix in range(grid_x):
            s_x = coord_min[0] + ix * stride
            e_x = min(s_x + block_size, coord_max[0])
            s_x = e_x - block_size
            s_y = coord_min[1] + iy * stride
            e_y = min(s_y + block_size, coord_max[1])
            s_y = e_y - block_size
            pid = np.where(
                (points6[:, 0] >= s_x - padding)
                & (points6[:, 0] <= e_x + padding)
                & (points6[:, 1] >= s_y - padding)
                & (points6[:, 1] <= e_y + padding)
            )[0]
            if pid.size == 0:
                continue
            nb = int(np.ceil(pid.size / block_points))
            target = nb * block_points
            replace = (target - pid.size) > pid.size
            extra = rng.choice(pid, target - pid.size, replace=replace)
            pid = np.concatenate([pid, extra])
            rng.shuffle(pid)
            batch = points6[pid].copy()
            norm_xyz = np.zeros((target, 3))
            norm_xyz[:, 0] = batch[:, 0] / max(ext[0], 1e-9)
            norm_xyz[:, 1] = batch[:, 1] / max(ext[1], 1e-9)
            norm_xyz[:, 2] = batch[:, 2] / max(ext[2], 1e-9)
            if center_xy:
                batch[:, 0] -= s_x + block_size / 2.0
                batch[:, 1] -= s_y + block_size / 2.0
            datas.append(np.concatenate([batch, norm_xyz], axis=1))
            lab = labels[pid].astype(np.int64)
            labs.append(lab)
            wts.append(labelweights[lab])
            idxs.append(pid)
    data = np.concatenate(datas).reshape(-1, block_points, 9).astype(np.float32)
    lab = np.concatenate(labs).reshape(-1, block_points)
    wt = np.concatenate(wts).reshape(-1, block_points).astype(np.float32)
    idx = np.concatenate(idxs).reshape(-1, block_points).astype(np.int64)
    return data, lab, wt, idx


@pytest.mark.parametrize(
    "bs,stride,pad,center",
    [
        (4.0, 2.0, 0.001, True),
        (8.0, 6.0, 0.001, False),   # streaming-demo config (non-divisible)
        (100.0, 50.0, 0.001, True),  # block larger than the scene extent
        (3.0, 3.0, 0.0, True),       # no overlap, zero padding
    ],
)
def test_whole_scene_grid_matches_naive_scan(bs, stride, pad, center):
    """The vectorized searchsorted binning must be BIT-identical to per-cell
    np.where scans — same membership at window boundaries, same cell visit
    order, same RNG consumption."""
    xyz, rgb, labels = toy_bridge_scene(6000, seed=7)
    pts6 = np.concatenate([xyz, rgb], axis=1).astype(np.float32)
    lw = scene_labelweights([labels], 5)
    got = whole_scene_grid_blocks(
        pts6, labels, lw, block_points=512, block_size=bs, stride=stride,
        padding=pad, center_xy=center, seed=3,
    )
    want = _grid_blocks_naive(
        pts6, labels, lw, 512, bs, stride, padding=pad, center_xy=center,
        seed=3,
    )
    for g, w in zip(got, want):
        np.testing.assert_array_equal(g, w)


@pytest.mark.parametrize(
    "bs,stride,center",
    [(4.0, 2.0, True), (8.0, 6.0, False)],
)
def test_whole_scene_grid_indices_reconstructs_blocks(bs, stride, center):
    """The indices-only grid path (device-gather streaming) must select the
    same blocks bit-for-bit: identical idx/weights, and gathering
    scene_feature_table rows + subtracting the per-block centers must
    reproduce the assembled 9-channel data exactly."""
    from pointcloud_bridge_tpu.data.blocks import (
        scene_feature_table,
        whole_scene_grid_indices,
    )

    xyz, rgb, labels = toy_bridge_scene(6000, seed=7)
    pts6 = np.concatenate([xyz, rgb], axis=1).astype(np.float32)
    lw = scene_labelweights([labels], 5)
    kw = dict(
        block_points=512, block_size=bs, stride=stride, center_xy=center,
        seed=3,
    )
    data, _, wts, idxs = whole_scene_grid_blocks(pts6, labels, lw, **kw)
    idxs2, wts2, centers = whole_scene_grid_indices(pts6, labels, lw, **kw)
    np.testing.assert_array_equal(idxs, idxs2)
    np.testing.assert_array_equal(wts, wts2)
    rec = scene_feature_table(pts6)[idxs2]
    rec[:, :, 0] -= centers[:, 0:1]
    rec[:, :, 1] -= centers[:, 1:2]
    np.testing.assert_array_equal(rec, data)
    if not center:
        assert not centers.any()

    # reusing a precomputed cell-membership handle must be bit-identical
    # (and must not be mutated by the per-vote rng resampling)
    from pointcloud_bridge_tpu.data.blocks import precompute_grid_cells

    cells = precompute_grid_cells(pts6, bs, stride)
    for s in (3, 4):
        a = whole_scene_grid_indices(pts6, labels, lw, **{**kw, "seed": s})
        b = whole_scene_grid_indices(
            pts6, labels, lw, cells=cells, **{**kw, "seed": s}
        )
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)
    with pytest.raises(ValueError):
        whole_scene_grid_indices(
            pts6, labels, lw, cells=cells, **{**kw, "block_size": bs * 2}
        )


def test_scene_labelweights_ordering():
    labels = np.concatenate([np.zeros(1000), np.ones(10)]).astype(int)
    w = scene_labelweights([labels], 2)
    assert w[1] > w[0]  # rare class gets higher weight
    np.testing.assert_allclose(w[0], 1.0, atol=1e-6)


def test_split_files():
    files = [f"f{i}.las" for i in range(20)]
    tr, va, te = split_files(files, seed=1)
    assert len(tr) == 14 and len(va) == 3 and len(te) == 3
    assert set(tr) | set(va) | set(te) == set(files)


def test_block_dataset_cache_and_batches(tmp_path):
    xyz, rgb, labels = toy_bridge_scene(20000, seed=3)
    from pointcloud_bridge_tpu.data import write_h5 as _w

    f = str(tmp_path / "scene.h5")
    _w(f, xyz, rgb, labels)
    cache = str(tmp_path / "cache")
    ds = BlockDataset.from_files(
        [f], num_points=512, sample_rate=0.2, cache_dir=cache, seed=0
    )
    assert len(ds) >= 1
    # cache hit returns identical data
    ds2 = BlockDataset.from_files(
        [f], num_points=512, sample_rate=0.2, cache_dir=cache, seed=0
    )
    np.testing.assert_array_equal(ds.points, ds2.points)
    assert len(os.listdir(cache)) == 1

    batches = list(ds.batches(2, shuffle=True, seed=0, drop_last=False))
    assert all(b["points"].shape == (2, 512, 3) for b in batches)
    assert all(b["labels"].dtype == np.int32 for b in batches)
    # augmented batches differ from raw blocks
    ds.augment = True
    b_aug = next(iter(ds.batches(2, shuffle=False, seed=0)))
    assert not np.allclose(b_aug["points"], ds.points[b_aug["block_ids"]])


def test_block_dataset_multiprocess(tmp_path):
    from pointcloud_bridge_tpu.data import write_h5

    for s in range(2):
        xyz, rgb, labels = toy_bridge_scene(8000, seed=s)
        write_h5(str(tmp_path / f"s{s}.h5"), xyz, rgb, labels)
    files = [str(tmp_path / f"s{s}.h5") for s in range(2)]
    ds1 = BlockDataset.from_files(files, num_points=256, sample_rate=0.2, seed=0)
    ds2 = BlockDataset.from_files(
        files, num_points=256, sample_rate=0.2, seed=0, processes=2
    )
    np.testing.assert_array_equal(ds1.points, ds2.points)  # pool == serial


def test_block_dataset_sampler_modes(tmp_path):
    from pointcloud_bridge_tpu.data import write_h5

    xyz, rgb, labels = toy_bridge_scene(8000, seed=0)
    f = str(tmp_path / "s.h5")
    write_h5(f, xyz, rgb, labels)
    for mode in ("stratified", "weighted", "random", "simple", "chunked"):
        ds = BlockDataset.from_files(
            [f], num_points=256, sample_rate=0.2, sampler=mode,
            chunk_size=1024, overlap=128, steps_per_file=3,
        )
        assert len(ds) >= 1, mode
        assert ds.points.shape[1:] == (256, 3), mode


def test_provider_augmentations_match_reference():
    """The full provider.py augmentation set (Partsize-identical/
    provider.py:3-199): deterministic functions match the EXECUTED reference
    bitwise-ish; stochastic ones are checked for the reference's invariants
    (rigid rotations preserve norms and rotate normals by the same matrix;
    normalize_data lands on the unit sphere; shuffle_points shares one
    permutation across the batch)."""
    import importlib.util
    import os

    import numpy as np

    from pointcloud_bridge_tpu.data import augment as A

    rng = np.random.default_rng(0)
    batch6 = rng.standard_normal((3, 32, 6)).astype(np.float32)
    batch3 = batch6[..., :3].copy()

    # --- deterministic: exact parity vs the executed reference
    ppath = "/root/reference/Partsize-identical/provider.py"
    if os.path.isfile(ppath):
        spec = importlib.util.spec_from_file_location("ref_provider", ppath)
        ref = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(ref)
        np.testing.assert_allclose(
            A.normalize_data(batch3),
            ref.normalize_data(batch3.astype(np.float64)),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            A.rotate_point_cloud_by_angle(batch3, 0.7),
            ref.rotate_point_cloud_by_angle(batch3, 0.7),
            rtol=1e-6, atol=1e-6,
        )
        np.testing.assert_allclose(
            A.rotate_point_cloud_by_angle_with_normal(batch6, 0.7),
            ref.rotate_point_cloud_by_angle_with_normal(batch6, 0.7),
            rtol=1e-6, atol=1e-6,
        )

    # --- stochastic: invariants
    g = np.random.default_rng(1)
    rot = A.rotate_point_cloud(batch3, g)
    np.testing.assert_allclose(
        np.linalg.norm(rot, axis=-1), np.linalg.norm(batch3, axis=-1),
        rtol=1e-5, atol=1e-5,
    )
    assert not np.allclose(rot, batch3)

    rotn = A.rotate_point_cloud_with_normal(batch6, np.random.default_rng(2))
    # xyz and normal of each point rotate by the SAME matrix: dot products
    # between them are preserved
    dots = np.sum(batch6[..., :3] * batch6[..., 3:6], axis=-1)
    dots_r = np.sum(rotn[..., :3] * rotn[..., 3:6], axis=-1)
    np.testing.assert_allclose(dots_r, dots, rtol=1e-4, atol=1e-5)

    pert = A.rotate_perturbation_point_cloud(
        batch3, np.random.default_rng(3)
    )
    # small-angle: close to the input but not equal
    assert np.max(np.abs(pert - batch3)) < 0.5
    assert not np.allclose(pert, batch3)
    pertn = A.rotate_perturbation_point_cloud_with_normal(
        batch6, np.random.default_rng(4)
    )
    np.testing.assert_allclose(
        np.sum(pertn[..., :3] * pertn[..., 3:6], axis=-1), dots,
        rtol=1e-4, atol=1e-5,
    )

    norm = A.normalize_data(batch3)
    np.testing.assert_allclose(
        np.max(np.linalg.norm(norm, axis=-1), axis=1), 1.0, rtol=1e-5
    )

    sp = A.shuffle_points(batch3, np.random.default_rng(5))
    # one shared permutation: sorted point sets per cloud are unchanged
    np.testing.assert_allclose(
        np.sort(sp, axis=1), np.sort(batch3, axis=1)
    )
    # recover the permutation from cloud 0 (sp[0] == batch3[0][perm]) and
    # check cloud 1 used the SAME one
    order_sp = np.lexsort(sp[0].T)
    order_b = np.lexsort(batch3[0].T)
    perm = np.empty(batch3.shape[1], np.int64)
    perm[order_sp] = order_b
    np.testing.assert_allclose(sp[1], batch3[1][perm])

    labels = np.arange(3)
    sd, sl, idx = A.shuffle_data(batch3, labels, np.random.default_rng(6))
    np.testing.assert_allclose(sd, batch3[idx])
    np.testing.assert_array_equal(sl, labels[idx])
