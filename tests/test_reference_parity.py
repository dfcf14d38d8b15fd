"""Direct numerical parity tests against the REFERENCE implementation.

The reference's WL_iden.py is pure numpy/scipy/sklearn (no torch/laspy in the
functions under test), so we import it from /root/reference with its missing
LAS reader stubbed out and compare our pipeline's outputs function-by-function
on identical inputs. Skipped when the reference checkout is absent.
"""

import sys
import types

import numpy as np
import pytest

pytestmark = pytest.mark.torchref

REF_DIR = "/root/reference/Partsize-identical"


@pytest.fixture(scope="module")
def ref_wl():
    import os

    if not os.path.isdir(REF_DIR):
        pytest.skip("reference checkout not available")
    # stub the laspy-dependent reader the module imports at top level
    stub_pkg = types.ModuleType("tool_utils")
    stub_mod = types.ModuleType("tool_utils.load_las")
    stub_mod.read_las_file = lambda p: None
    stub_pkg.load_las = stub_mod
    sys.modules.setdefault("tool_utils", stub_pkg)
    sys.modules.setdefault("tool_utils.load_las", stub_mod)
    sys.path.insert(0, REF_DIR)
    try:
        import importlib.util

        spec = importlib.util.spec_from_file_location(
            "ref_wl_iden", os.path.join(REF_DIR, "WL_iden.py")
        )
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
        return mod
    finally:
        sys.path.remove(REF_DIR)


def _deck(n=6000, seed=0, outliers=0):
    rng = np.random.default_rng(seed)
    pts = np.stack(
        [rng.uniform(0, 18, n), rng.uniform(0, 6, n),
         2.5 + rng.normal(0, 0.01, n)], 1,
    )
    c, s = np.cos(0.4), np.sin(0.4)
    pts = pts @ np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]]).T
    if outliers:
        pts = np.concatenate(
            [pts, rng.uniform(-3, 20, (outliers, 3))], axis=0
        )
    return pts


def test_mbr_matches_reference(ref_wl, rng):
    import pointcloud_bridge_tpu.measure as M

    pts2d = _deck()[:, :2]
    ours = M.minimum_bounding_rectangle(pts2d)
    theirs = ref_wl.minimum_bounding_rectangle(pts2d)
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_trim_edges_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts2d = _deck(seed=1)[:, :2]
    ours = M.detect_and_trim_edges(pts2d, 20)
    theirs = ref_wl.detect_and_trim_edges(pts2d, 20)
    np.testing.assert_allclose(ours, theirs)


def test_ransac_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts = _deck(seed=2, outliers=200)
    ours = M.ransac_plane_fit(pts, max_trials=500, residual_threshold=0.2)
    theirs = ref_wl.ransac_plane_fit(pts, max_trials=500, residual_threshold=0.2)
    np.testing.assert_allclose(ours, theirs)  # same random_state=42 -> bitwise


def test_data_voxel_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts = _deck(seed=3)
    ours = M.data_voxel(pts, voxel_size=0.1)
    theirs = ref_wl.data_voxel(pts, voxel_size=0.1)
    np.testing.assert_allclose(ours, theirs)


def test_calculate_dimensions_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts2d = _deck(seed=4)[:, :2]
    rect = M.minimum_bounding_rectangle(pts2d)
    ours = M.calculate_dimensions(pts2d, rect)
    theirs = ref_wl.calculate_dimensions(pts2d, rect)
    np.testing.assert_allclose(ours, theirs, rtol=1e-12)


def test_isolation_forest_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts = _deck(seed=5, outliers=150)
    ours = M.isolation_forest_outlier_removal(pts, contamination=0.2)
    theirs = ref_wl.isolation_forest_outlier_removal(pts, contamination=0.2)
    np.testing.assert_allclose(ours, theirs)  # random_state=42 both sides


def test_lof_matches_reference(ref_wl):
    import pointcloud_bridge_tpu.measure as M

    pts = _deck(seed=6, outliers=100)
    ours = M.lof_outlier_removal(pts, n_neighbors=20, contamination=0.1)
    theirs = ref_wl.lof_outlier_removal(pts, n_neighbors=20, contamination=0.1)
    np.testing.assert_allclose(ours, theirs)


def test_full_deck_pipeline_matches_reference(ref_wl):
    """process_bridge_deck end-to-end: identical (length, width) on identical
    inputs with identical hyperparameters (fixed seeds on both sides)."""
    import pointcloud_bridge_tpu.measure as M

    pts = _deck(seed=7, outliers=120)
    kw = dict(
        voxel_size=0.05,
        ransac_max_trials=500,
        ransac_residual_threshold=0.3,
        isolation_forest_contamination=0.2,
        lof_n_neighbors=25,
        lof_contamination=0.1,
        percentile=20,
    )
    l1, w1, _, rect1 = M.process_bridge_deck(pts, **kw)
    l2, w2, _, rect2 = ref_wl.process_bridge_deck(pts, **kw)
    np.testing.assert_allclose([l1, w1], [l2, w2], rtol=1e-9)
    np.testing.assert_allclose(rect1, rect2, atol=1e-9)


# ---------------------------------------------------------------------------
# REAL-DATA parity: the reference repo commits two real bridge-deck scans
# (Partsize-identical/output-deck.las, output-deck-test.las). Run the full
# measurement pipeline on the actual points through both implementations with
# the reference __main__'s own hyperparameters (WL_iden.py:583-592) and
# require identical dimensions.
# ---------------------------------------------------------------------------

_REAL_DECKS = [
    REF_DIR + "/output-deck.las",
    REF_DIR + "/output-deck-test.las",
]

_REF_MAIN_HPARAMS = dict(  # WL_iden.py:583-592 ("no_PCA,CB" row)
    voxel_size=0.05,
    ransac_max_trials=1000,
    ransac_residual_threshold=0.3,
    isolation_forest_contamination=0.03,
    lof_n_neighbors=30,
    lof_contamination="auto",
    percentile=25,
)


@pytest.mark.parametrize("path", _REAL_DECKS)
def test_real_deck_raw_branch_matches_reference(ref_wl, path):
    import os

    from pointcloud_bridge_tpu.data.lasio import read_las
    import pointcloud_bridge_tpu.measure as M

    if not os.path.exists(path):
        pytest.skip("committed reference LAS not available")
    pts = read_las(path).xyz
    l1, w1, trim1, rect1 = M.process_raw(pts, percentile=25)
    l2, w2, trim2, rect2 = ref_wl.process_raw(pts, percentile=25)
    np.testing.assert_allclose([l1, w1], [l2, w2], rtol=1e-12)
    np.testing.assert_allclose(rect1, rect2, atol=1e-9)
    np.testing.assert_allclose(trim1, trim2)


@pytest.mark.parametrize("path", _REAL_DECKS)
def test_real_deck_full_pipeline_matches_reference(ref_wl, path):
    import os

    from pointcloud_bridge_tpu.data.lasio import read_las
    import pointcloud_bridge_tpu.measure as M

    if not os.path.exists(path):
        pytest.skip("committed reference LAS not available")
    pts = read_las(path).xyz
    l1, w1, _, rect1 = M.process_bridge_deck(pts, **_REF_MAIN_HPARAMS)
    l2, w2, _, rect2 = ref_wl.process_bridge_deck(pts, **_REF_MAIN_HPARAMS)
    np.testing.assert_allclose([l1, w1], [l2, w2], rtol=1e-12)
    np.testing.assert_allclose(rect1, rect2, atol=1e-9)
    # and the derived relative-error metric agrees bitwise
    lr, wr, _, _ = M.process_raw(pts, percentile=25)
    assert M.evaluate_result(lr, wr, l1, w1) == ref_wl.evaluate_result(
        lr, wr, l2, w2
    )
