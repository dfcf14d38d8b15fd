"""Inference result figures — the visualize_results suite
(inference.py:408-785): per-class IoU/accuracy bars, confusion-matrix heatmap,
per-file metric comparison, and a metric summary panel. PNG + PDF like the
reference."""

from __future__ import annotations

import os
from typing import Any, Dict, List, Optional

import numpy as np


def save_inference_figures(
    results: Dict[str, Any],
    out_dir: str,
    class_names: Optional[List[str]] = None,
) -> List[str]:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(out_dir, exist_ok=True)
    g = results["global"]
    c = len(g["IoU_per_class"])
    names = class_names or [f"class_{i}" for i in range(c)]
    paths = []

    # 6-panel summary (inference.py:408-659)
    fig, axes = plt.subplots(2, 3, figsize=(16, 9))
    axes[0, 0].bar(names, g["IoU_per_class"])
    axes[0, 0].set_title(f"IoU per class (mIoU={g['mIoU']:.3f})")
    axes[0, 1].bar(names, g["Acc_per_class"])
    axes[0, 1].set_title(f"Accuracy per class (mAcc={g['mAcc']:.3f})")
    cm = np.asarray(g["Confusion_Matrix"], np.float64)
    cmn = cm / np.maximum(cm.sum(axis=1, keepdims=True), 1.0)
    im = axes[0, 2].imshow(cmn, cmap="Blues", vmin=0, vmax=1)
    axes[0, 2].set_title("Confusion matrix (row-normalized)")
    axes[0, 2].set_xticks(range(c), names, rotation=45)
    axes[0, 2].set_yticks(range(c), names)
    fig.colorbar(im, ax=axes[0, 2])
    for i in range(c):
        for j in range(c):
            axes[0, 2].text(j, i, f"{cmn[i, j]:.2f}", ha="center", va="center",
                            fontsize=7)
    summary = {
        "mIoU": g["mIoU"], "OA": g["OA"], "mAcc": g["mAcc"],
        "Precision": g["Precision"], "Recall": g["Recall"], "F1": g["F1_score"],
    }
    axes[1, 0].bar(list(summary), list(summary.values()))
    axes[1, 0].set_ylim(0, 1)
    axes[1, 0].set_title("Global metrics")
    # per-file mIoU / OA comparison (inference.py:723-785)
    per_file = results.get("per_file", {})
    if per_file:
        fnames = sorted(per_file)
        axes[1, 1].bar(fnames, [per_file[f]["mIoU"] for f in fnames])
        axes[1, 1].set_title("Per-file mIoU")
        axes[1, 1].tick_params(axis="x", rotation=45)
        axes[1, 2].bar(fnames, [per_file[f]["OA"] for f in fnames])
        axes[1, 2].set_title("Per-file OA")
        axes[1, 2].tick_params(axis="x", rotation=45)
    fig.tight_layout()
    for ext in ("png", "pdf"):
        p = os.path.join(out_dir, f"evaluation_summary.{ext}")
        fig.savefig(p, dpi=200 if ext == "png" else None, bbox_inches="tight")
        paths.append(p)
    plt.close(fig)
    return paths


def scatter_3d_comparison(
    xyz: np.ndarray,
    gt: np.ndarray,
    pred: np.ndarray,
    out_path: str,
    max_points: int = 50000,
    seed: int = 0,
) -> str:
    """GT-vs-prediction 3D scatter (inference.py:661-721)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rng = np.random.default_rng(seed)
    if len(xyz) > max_points:
        sel = rng.choice(len(xyz), max_points, replace=False)
        xyz, gt, pred = xyz[sel], gt[sel], pred[sel]
    fig = plt.figure(figsize=(14, 6))
    for i, (labels, title) in enumerate([(gt, "Ground truth"), (pred, "Prediction")]):
        ax = fig.add_subplot(1, 2, i + 1, projection="3d")
        ax.scatter(xyz[:, 0], xyz[:, 1], xyz[:, 2], c=labels, s=0.5, cmap="tab10")
        ax.set_title(title)
    fig.tight_layout()
    fig.savefig(out_path, dpi=150)
    plt.close(fig)
    return out_path
