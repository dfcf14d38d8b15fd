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
    [NB, P] int32 aligned with dataset block order}.

    Relay-aware feed (round 4, same lessons as infer/vote.py): the whole
    block tensor uploads ONCE and batches slice on device — per-batch
    upload + dispatch + blocking fetch cost ~3 relay round trips per batch
    (~150 ms for a ~2 ms forward); async dispatches over device slices cost
    one. Predictions fetch once at the end. The tail batch re-slices the
    last `batch_size` rows (clamped start — recompute beats a padded
    recompile). Confusion matrices are one host-side np.bincount over
    (file, label, pred) keys — the previous per-block jitted CM was one
    ~50 ms dispatch per block on the relay.
    """
    nb_total = len(dataset)
    p = dataset.num_points
    bsz = min(batch_size, nb_total)

    @jax.jit
    def forward_at(pts, cols, start):
        xyz = jax.lax.dynamic_slice_in_dim(pts, start, bsz)
        feats = jax.lax.dynamic_slice_in_dim(cols, start, bsz)
        logits = model.apply(variables, xyz, feats, train=False)
        return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    preds_all = np.zeros((nb_total, p), np.int32)
    if nb_total:
        pts_d = jnp.asarray(np.asarray(dataset.points, np.float32))
        cols_d = jnp.asarray(np.asarray(dataset.colors, np.float32))
        starts = list(range(0, nb_total - bsz + 1, bsz))
        if starts[-1] + bsz < nb_total:
            starts.append(nb_total - bsz)  # overlapping tail slice
        outs = [forward_at(pts_d, cols_d, s) for s in starts]  # async
        fetched = np.asarray(jnp.stack(outs))  # ONE blocking fetch
        for j, s in enumerate(starts):
            preds_all[s : s + bsz] = fetched[j]

    # per-file + global CMs in one bincount pass (np.add.at-style loops are
    # ~10x slower at multi-M updates — CLAUDE.md host-scatter note)
    labels = np.asarray(dataset.labels, np.int64)  # [NB, P]
    file_ids = np.asarray(dataset.file_ids, np.int64)  # [NB]
    nf = len(dataset.file_names)
    key = (
        file_ids[:, None] * (num_classes * num_classes)
        + labels * num_classes
        + preds_all
    )
    per_file = np.bincount(
        key.ravel(), minlength=nf * num_classes * num_classes
    ).reshape(nf, num_classes, num_classes)
    global_cm = per_file.sum(axis=0)
    per_file_cm: Dict[str, np.ndarray] = {}
    for fi, fname in enumerate(dataset.file_names):
        if per_file[fi].sum():
            per_file_cm[fname] = per_file_cm.get(
                fname, np.zeros((num_classes, num_classes), np.int64)
            ) + per_file[fi]

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
