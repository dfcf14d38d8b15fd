"""Block-based inference with per-file and global metrics.

Mirrors Highway_bridge/inference.py (SURVEY.md §3.2): batched forward over
validation blocks, accumulation keyed by source file, confusion-matrix metric
suite (IoU/OA/mAcc/weighted P/R/F1), CSV export. The reference's Python
double loop over points (inference.py:226-231) becomes an on-device bincount.
"""

from __future__ import annotations

import csv
import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..utils import metrics as M


def run_block_inference(
    model,
    variables: Dict[str, Any],
    dataset,
    num_classes: int,
    batch_size: int = 16,
) -> Dict[str, Any]:
    """Returns {global: metrics, per_file: {name: metrics}, predictions:
    [NB, P] int32 aligned with dataset block order}."""

    @jax.jit
    def forward(xyz, feats):
        logits = model.apply(variables, xyz, feats, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    nb_total = len(dataset)
    preds_all = np.zeros((nb_total, dataset.num_points), np.int32)
    for batch in dataset.batches(batch_size, shuffle=False, drop_last=False):
        preds = np.asarray(
            forward(jnp.asarray(batch["points"]), jnp.asarray(batch["colors"]))
        )
        ids = batch["block_ids"][batch["mask"]]
        preds_all[ids] = preds[batch["mask"]]

    global_cm = np.zeros((num_classes, num_classes), np.int64)
    per_file_cm: Dict[str, np.ndarray] = {}
    for i in range(nb_total):
        cm = np.asarray(
            M.confusion_matrix(
                jnp.asarray(preds_all[i]), jnp.asarray(dataset.labels[i]), num_classes
            )
        )
        global_cm += cm
        fname = dataset.file_names[int(dataset.file_ids[i])]
        per_file_cm[fname] = per_file_cm.get(
            fname, np.zeros((num_classes, num_classes), np.int64)
        ) + cm

    return {
        "global": M.metrics_from_confusion(global_cm),
        "per_file": {
            k: M.metrics_from_confusion(v) for k, v in per_file_cm.items()
        },
        "predictions": preds_all,
    }


def save_metrics_csv(
    results: Dict[str, Any], out_dir: str, class_names: Optional[list] = None
) -> str:
    """Write global + per-file metric CSVs (inference.py:331-373 contract)."""
    os.makedirs(out_dir, exist_ok=True)
    path = os.path.join(out_dir, "metrics.csv")
    rows = []

    def row_for(name: str, m: Dict[str, Any]) -> Dict[str, Any]:
        r = {
            "file": name,
            "mIoU": m["mIoU"],
            "OA": m["OA"],
            "mAcc": m["mAcc"],
            "Precision": m["Precision"],
            "Recall": m["Recall"],
            "F1_score": m["F1_score"],
        }
        for c, iou in enumerate(m["IoU_per_class"]):
            cname = class_names[c] if class_names else f"class_{c}"
            r[f"IoU_{cname}"] = float(iou)
        return r

    rows.append(row_for("GLOBAL", results["global"]))
    for fname, m in sorted(results["per_file"].items()):
        rows.append(row_for(fname, m))
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
        w.writeheader()
        w.writerows(rows)

    # confusion matrix CSV
    cm_path = os.path.join(out_dir, "confusion_matrix.csv")
    np.savetxt(cm_path, results["global"]["Confusion_Matrix"], fmt="%d", delimiter=",")
    return path
