"""Point-cloud augmentations.

  - apply_transform: the BriPCDMulti per-block augmentation — random z
    rotation, translation U(0.01, 0.1), scale U(0.9, 1.1), color jitter
    N(0, 0.02) clipped (BriPCDMulti.py:367-403).
  - provider-style batch augmentations operating on [B, N, C]
    (Partsize-identical/provider.py): z/3d rotation, jitter, shift, scale,
    random point dropout.

All functions are host-side numpy with explicit Generators (the reference
uses the global unseeded numpy RNG; we require seeds — SURVEY.md §7 hard
part #5, parity is distributional).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np


def _rotz(theta: float) -> np.ndarray:
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], np.float64)


def apply_transform(
    points: np.ndarray,
    colors: Optional[np.ndarray],
    rng: np.random.Generator,
) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """BriPCDMulti.apply_transform (BriPCDMulti.py:367-403)."""
    points = points.copy()
    theta = rng.uniform(0, 2 * np.pi)
    points = points @ _rotz(theta)
    points = points + rng.uniform(0.01, 0.1, size=(1, 3))
    points = points * rng.uniform(0.9, 1.1)
    if colors is not None:
        colors = np.clip(colors + rng.normal(0, 0.02, colors.shape), 0, 1)
    return points.astype(np.float32), (
        None if colors is None else colors.astype(np.float32)
    )


# --- provider.py-style batch augmentations ([B, N, C]) ---


def rotate_point_cloud_z(batch: np.ndarray, rng: np.random.Generator) -> np.ndarray:
    out = batch.copy()
    for b in range(len(batch)):
        out[b, :, :3] = batch[b, :, :3] @ _rotz(rng.uniform(0, 2 * np.pi))
    return out


def jitter_point_cloud(
    batch: np.ndarray, rng: np.random.Generator, sigma: float = 0.01, clip: float = 0.05
) -> np.ndarray:
    noise = np.clip(sigma * rng.standard_normal(batch[..., :3].shape), -clip, clip)
    out = batch.copy()
    out[..., :3] += noise
    return out


def shift_point_cloud(
    batch: np.ndarray, rng: np.random.Generator, shift_range: float = 0.1
) -> np.ndarray:
    shifts = rng.uniform(-shift_range, shift_range, (len(batch), 1, 3))
    out = batch.copy()
    out[..., :3] += shifts
    return out


def random_scale_point_cloud(
    batch: np.ndarray,
    rng: np.random.Generator,
    scale_low: float = 0.8,
    scale_high: float = 1.25,
) -> np.ndarray:
    scales = rng.uniform(scale_low, scale_high, (len(batch), 1, 1))
    out = batch.copy()
    out[..., :3] *= scales
    return out


def random_point_dropout(
    batch: np.ndarray, rng: np.random.Generator, max_dropout_ratio: float = 0.875
) -> np.ndarray:
    """Replace a random subset of each cloud with its first point
    (provider.py random_point_dropout semantics)."""
    out = batch.copy()
    for b in range(len(batch)):
        ratio = rng.uniform() * max_dropout_ratio
        drop = np.where(rng.uniform(size=batch.shape[1]) <= ratio)[0]
        if len(drop) > 0:
            out[b, drop] = out[b, 0]
    return out
