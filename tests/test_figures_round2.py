"""Round-2 figure/chart suite completion (VERDICT #9): per-panel exports,
per-file comparison charts, per-component & per-case error charts, and the
chunked CSV-append grid search."""

import glob
import os

import numpy as np
import pytest


def _fake_results():
    c = 4
    cm = np.diag([50, 40, 30, 20]) + 2.0
    per_class = np.linspace(0.6, 0.9, c)
    g = {
        "mIoU": 0.75, "OA": 0.9, "mAcc": 0.8, "Precision": 0.85,
        "Recall": 0.84, "F1_score": 0.86,
        "IoU_per_class": per_class, "Acc_per_class": per_class,
        "Confusion_Matrix": cm,
    }
    pf = {
        "a": dict(g, mIoU=0.7), "b": dict(g, mIoU=0.8),
    }
    return {"global": g, "per_file": pf}


def test_save_subplots_exports_each_panel(tmp_path):
    from pointcloud_bridge_tpu.infer import save_inference_figures

    paths = save_inference_figures(
        _fake_results(), str(tmp_path), save_subplots=True, prefix="val"
    )
    for stem in ("iou_per_class", "acc_per_class", "confusion_matrix",
                 "global_metrics", "per_file_miou", "per_file_oa"):
        assert os.path.exists(str(tmp_path / f"val_{stem}.png")), stem
        assert os.path.exists(str(tmp_path / f"val_{stem}.pdf")), stem
    assert os.path.exists(str(tmp_path / "evaluation_summary.png"))


def test_file_comparison_charts(tmp_path):
    from pointcloud_bridge_tpu.infer import file_comparison_charts

    res = _fake_results()
    paths = file_comparison_charts(res["per_file"], str(tmp_path))
    assert os.path.exists(str(tmp_path / "file_comparison.png"))
    assert os.path.exists(str(tmp_path / "file_comparison.pdf"))
    assert os.path.exists(str(tmp_path / "class_iou_comparison.png"))


def _records(case, comp, n, err, dim="length", seed=0):
    rng = np.random.default_rng(seed)
    out = []
    for _ in range(n):
        t = rng.uniform(5, 20)
        out.append({
            "case": case, "component": comp,
            f"true_{dim}": t, f"pred_{dim}": t * (1 + err + rng.normal(0, 0.01)),
        })
    return out


def test_component_and_case_error_charts(tmp_path):
    from pointcloud_bridge_tpu.measure.evaluation import (
        plot_case_errors,
        plot_component_relative_errors,
    )

    r1 = _records("b1", "Deck", 5, 0.05) + _records("b2", "Girder", 5, 0.1)
    r2 = _records("cb2", "Deck", 5, 0.02) + _records("cb6", "Parapet", 5, 0.08)
    plot_component_relative_errors(
        r1, r2, save_path=str(tmp_path / "comp.png")
    )
    plot_case_errors(r1, r2, save_path=str(tmp_path / "case.png"))
    for f in ("comp.png", "comp.pdf", "case.png", "case.pdf"):
        assert os.path.exists(str(tmp_path / f)), f


def test_grid_search_chunked_csv_appends_and_resumes(tmp_path):
    from pointcloud_bridge_tpu.measure.optimize import grid_search

    rng = np.random.default_rng(0)
    pts = np.stack([rng.uniform(0, 18, 4000), rng.uniform(0, 6, 4000),
                    2.5 + rng.normal(0, 0.01, 4000)], 1)
    cases = [("deck", pts, pts)]
    grid = {"voxel_size": [0.1, 0.2], "percentile": [20, 25]}
    csv_path = str(tmp_path / "sweep.csv")
    res = grid_search(cases, grid, csv_path=csv_path, chunk_size=1)
    assert len(res) == 4
    lines = open(csv_path).read().strip().splitlines()
    assert len(lines) == 5  # header + 4 rows
    # resume: nothing left to do, CSV unchanged, returns empty
    res2 = grid_search(cases, grid, csv_path=csv_path, chunk_size=1)
    assert res2 == []
    assert len(open(csv_path).read().strip().splitlines()) == 5
