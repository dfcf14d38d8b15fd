"""Segmentation metrics from confusion matrices.

Formula parity with Highway_bridge/inference.py:814-855 (calculate_metrics):
per-class IoU / mIoU, OA, per-class acc / mAcc, row-weight-averaged precision
and recall, F1 = 2PR/(P+R). The confusion matrix itself is computed on device
with one bincount (replacing the reference's Python double loop over points,
inference.py:226-231).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np


def confusion_matrix(
    preds: jax.Array, labels: jax.Array, num_classes: int
) -> jax.Array:
    """[C, C] counts with rows = true label, cols = prediction. jit-friendly."""
    preds = preds.reshape(-1).astype(jnp.int32)
    labels = labels.reshape(-1).astype(jnp.int32)
    flat = labels * num_classes + preds
    counts = jnp.bincount(flat, length=num_classes * num_classes)
    return counts.reshape(num_classes, num_classes)


def masked_confusion_matrix(
    preds: jax.Array, labels: jax.Array, mask: jax.Array, num_classes: int
) -> jax.Array:
    """Confusion matrix counting only mask==True points (padded batches)."""
    preds = preds.reshape(-1).astype(jnp.int32)
    labels = labels.reshape(-1).astype(jnp.int32)
    mask = mask.reshape(-1)
    flat = labels * num_classes + preds
    # route masked-out entries to an extra bin that is then dropped
    flat = jnp.where(mask, flat, num_classes * num_classes)
    counts = jnp.bincount(flat, length=num_classes * num_classes + 1)
    return counts[:-1].reshape(num_classes, num_classes)


def metrics_from_confusion(cm: np.ndarray) -> Dict[str, object]:
    """inference.py:814-855 metric suite from a [C, C] confusion matrix."""
    cm = np.asarray(cm, np.float64)
    intersection = np.diag(cm)
    union = cm.sum(axis=1) + cm.sum(axis=0) - np.diag(cm)
    iou_per_class = intersection / (union + 1e-6)
    miou = float(np.nanmean(iou_per_class))
    total = cm.sum()
    oa = float(np.diag(cm).sum() / max(total, 1e-6))
    acc_per_class = np.diag(cm) / (cm.sum(axis=1) + 1e-6)
    macc = float(np.nanmean(acc_per_class))
    precision_per_class = np.diag(cm) / (cm.sum(axis=0) + 1e-6)
    recall_per_class = np.diag(cm) / (cm.sum(axis=1) + 1e-6)
    weights = cm.sum(axis=1) / max(total, 1e-6)
    precision = float((precision_per_class * weights).sum())
    recall = float((recall_per_class * weights).sum())
    f1 = 2 * precision * recall / (precision + recall + 1e-6)
    return {
        "mIoU": miou,
        "IoU_per_class": iou_per_class,
        "OA": oa,
        "mAcc": macc,
        "Acc_per_class": acc_per_class,
        "Precision": precision,
        "Recall": recall,
        "F1_score": float(f1),
        "Confusion_Matrix": cm,
    }


def classification_report(
    preds: np.ndarray, labels: np.ndarray, class_names=None
) -> str:
    """sklearn classification report (tool_utils/model_eva.py:46-107)."""
    from sklearn.metrics import classification_report as _report

    return _report(
        np.asarray(labels).reshape(-1),
        np.asarray(preds).reshape(-1),
        target_names=class_names,
        zero_division=0,
    )
