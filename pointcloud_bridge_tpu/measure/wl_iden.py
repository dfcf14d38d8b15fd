"""Deck width/length identification pipeline (Partsize-identical/WL_iden.py).

Host-side numpy/scipy/sklearn, preserved bit-compatibly with the reference
where the reference is deterministic (RANSAC/IsolationForest use
random_state=42 exactly as WL_iden.py does; adaptive helpers that sample with
the global RNG take an explicit seed here).

Pred branch (process_bridge_deck, WL_iden.py:365-430): voxel downsample ->
RANSAC plane fit on z(x,y) -> directional IsolationForest (PCA length axis
relaxed 0.5x, width axis strict) -> LOF -> xy projection -> density-histogram
edge trim -> convex-hull minimum bounding rectangle (rotating calipers) ->
edge-point-projection refinement clipped to ±5%.
Raw branch (process_raw, :434-463): projection -> PCA alignment -> trim ->
MBR -> refinement (no denoising).
"""

from __future__ import annotations

import csv
import os
import time
from typing import Dict, Iterable, List, Optional, Tuple

import numpy as np
from scipy.spatial import ConvexHull, cKDTree


def ransac_plane_fit(
    points: np.ndarray, max_trials: int = 2000, residual_threshold: float = 0.1
) -> np.ndarray:
    """Keep RANSAC inliers of the plane z = f(x, y) (WL_iden.py:51-55)."""
    from sklearn.linear_model import RANSACRegressor

    ransac = RANSACRegressor(
        max_trials=max_trials,
        residual_threshold=residual_threshold,
        random_state=42,
    )
    ransac.fit(points[:, :2], points[:, 2])
    return points[ransac.inlier_mask_]


def project_to_plane(points: np.ndarray) -> np.ndarray:
    return points[:, :2]


def align_to_principal_axes(points: np.ndarray) -> np.ndarray:
    from sklearn.decomposition import PCA

    pca = PCA(n_components=2)
    pca.fit(points)
    return pca.transform(points)


def detect_and_trim_edges(points: np.ndarray, percentile: float = 20) -> np.ndarray:
    """Density-histogram edge trim (WL_iden.py:65-79)."""
    x, y = points[:, 0], points[:, 1]
    x_density, x_bins = np.histogram(x, bins=100)
    y_density, y_bins = np.histogram(y, bins=100)
    x_threshold = np.percentile(x_density, percentile)
    y_threshold = np.percentile(y_density, percentile)
    x_idx = np.clip(np.digitize(x, x_bins[1:-1]) - 1, 0, len(x_density) - 1)
    y_idx = np.clip(np.digitize(y, y_bins[1:-1]) - 1, 0, len(y_density) - 1)
    x_mask = (x_density[x_idx] > x_threshold) & (x_density[x_idx] < x_density.max())
    y_mask = (y_density[y_idx] > y_threshold) & (y_density[y_idx] < y_density.max())
    return points[x_mask & y_mask]


def minimum_bounding_rectangle(points: np.ndarray) -> np.ndarray:
    """Rotating-calipers MBR over the convex hull (WL_iden.py:81-113).
    Returns the 4 rectangle corners [4, 2]."""
    hull_points = points[ConvexHull(points).vertices]
    edges = np.subtract.outer(hull_points, hull_points).reshape(-1, 2)
    angles = np.arctan2(edges[:, 1], edges[:, 0])
    angles = np.abs(np.mod(angles, np.pi / 2))
    angles = np.unique(angles)

    rotations = np.vstack(
        [np.cos(angles), -np.sin(angles), np.sin(angles), np.cos(angles)]
    ).T.reshape(-1, 2, 2)
    rot_points = np.dot(rotations, hull_points.T)

    min_x = np.nanmin(rot_points[:, 0], axis=1)
    max_x = np.nanmax(rot_points[:, 0], axis=1)
    min_y = np.nanmin(rot_points[:, 1], axis=1)
    max_y = np.nanmax(rot_points[:, 1], axis=1)
    areas = (max_x - min_x) * (max_y - min_y)
    best = int(np.argmin(areas))

    x1, x2 = max_x[best], min_x[best]
    y1, y2 = max_y[best], min_y[best]
    r = rotations[best]
    return np.array(
        [
            np.dot([x1, y2], r),
            np.dot([x2, y2], r),
            np.dot([x2, y1], r),
            np.dot([x1, y1], r),
        ]
    )


def adaptive_voxel_size(
    data: np.ndarray,
    target_points_ratio: float = 0.1,
    min_points: int = 1000,
    max_voxel_size: float = 0.5,
    min_voxel_size: float = 0.01,
    seed: int = 0,
) -> float:
    """Density + NN-distance initial estimate, bisection to a target point
    count (WL_iden.py:116-181)."""
    points = data[:, :3]
    rng = np.random.default_rng(seed)
    n = len(points)
    bbox = points.max(0) - points.min(0)
    point_density = n / max(np.prod(bbox), 1e-12)

    sample = points[rng.choice(n, min(1000, n), replace=False)]
    tree = cKDTree(sample)
    d, _ = tree.query(sample, k=2)
    mean_nn = float(np.mean(d[:, 1]))

    density_size = (1.0 / point_density) ** (1.0 / 3.0)
    voxel_size = float(np.mean([density_size, mean_nn * 2]))
    target = max(min_points, int(n * target_points_ratio))
    left, right = min_voxel_size, max_voxel_size
    for _ in range(10):
        coords = np.floor(points / voxel_size).astype(int)
        cur = len(np.unique(coords, axis=0))
        if abs(cur - target) / target < 0.1:
            break
        if cur > target:
            left = voxel_size
            voxel_size = (voxel_size + right) / 2
        else:
            right = voxel_size
            voxel_size = (left + voxel_size) / 2
    return float(np.clip(voxel_size, min_voxel_size, max_voxel_size))


def data_voxel(data: np.ndarray, voxel_size: Optional[float] = None) -> np.ndarray:
    """First-point-per-voxel downsampling (WL_iden.py:184-197). Native C++
    fast path when built; exact same selection (first point per voxel)."""
    if voxel_size is None:
        voxel_size = adaptive_voxel_size(data)
    pts = data[:, :3]
    try:
        from ..data import native

        if native.native_available():
            idx = native.voxel_first_indices(pts, float(voxel_size))
            # replicate np.unique's lexicographic voxel ordering exactly
            # (downstream RANSAC sampling is order-sensitive)
            c = np.floor(pts[idx] / voxel_size).astype(int)
            order = np.lexsort((c[:, 2], c[:, 1], c[:, 0]))
            return pts[idx[order]]
    except Exception:
        pass
    coords = np.floor(pts / voxel_size).astype(int)
    _, unique_idx = np.unique(coords, axis=0, return_index=True)
    return pts[unique_idx]


def directional_outlier_detection(
    points: np.ndarray, contamination: float = 0.1, is_length_direction: bool = True
):
    """PCA-transformed coordinates + axis choice + relaxed/strict
    contamination (WL_iden.py:233-256)."""
    from sklearn.decomposition import PCA

    pca = PCA(n_components=points.shape[1])
    transformed = pca.fit_transform(points)
    ratio = pca.explained_variance_ratio_
    main_idx = 0 if ratio[0] > ratio[1] else 1
    direction_idx = main_idx if is_length_direction else (1 - main_idx)
    adjusted = contamination * (0.5 if is_length_direction else 1.0)
    return transformed, direction_idx, adjusted, pca


def isolation_forest_outlier_removal(
    points: np.ndarray, contamination: float = 0.1
) -> np.ndarray:
    """Directional IsolationForest: relaxed along the bridge-length axis,
    strict along width; keep points normal in both (WL_iden.py:200-230)."""
    from sklearn.ensemble import IsolationForest

    t_l, i_l, c_l, _ = directional_outlier_detection(points, contamination, True)
    t_w, i_w, c_w, _ = directional_outlier_detection(points, contamination, False)
    iso_l = IsolationForest(contamination=c_l, random_state=42)
    iso_w = IsolationForest(contamination=c_w, random_state=42)
    lab_l = iso_l.fit_predict(t_l[:, [i_l]])
    lab_w = iso_w.fit_predict(t_w[:, [i_w]])
    return points[(lab_l == 1) & (lab_w == 1)]


def adaptive_lof_params(
    points: np.ndarray,
    target_precision: float = 0.03,
    min_neighbors: int = 5,
    max_neighbors: int = 50,
    seed: int = 0,
) -> Tuple[int, float]:
    """Density/variance-driven LOF parameter selection (WL_iden.py:260-327)."""
    from sklearn.neighbors import NearestNeighbors

    rng = np.random.default_rng(seed)
    n = len(points)
    bbox = points.max(0) - points.min(0)
    volume = max(np.prod(bbox), 1e-12)
    density = n / volume
    expected = density * (4.0 / 3.0 * np.pi * target_precision**3)

    sample = points[rng.choice(n, min(1000, n), replace=False)]
    k = min(20, len(sample) - 1)
    nbrs = NearestNeighbors(n_neighbors=k + 1).fit(sample)
    d, _ = nbrs.kneighbors()
    mean_dist = np.mean(d[:, 1:], axis=1)
    std_dist = np.std(d[:, 1:], axis=1)
    cv = std_dist / np.maximum(mean_dist, 1e-12)
    n_neighbors = int(np.clip(int(expected) * (1 + np.mean(cv)), min_neighbors, max_neighbors))
    threshold = mean_dist.mean() + 2 * mean_dist.std()
    contamination = float(np.clip(np.mean(mean_dist > threshold), 0.01, 0.1))
    return n_neighbors, contamination


def lof_outlier_removal(
    points: np.ndarray,
    n_neighbors: Optional[int] = None,
    contamination: Optional[float] = None,
) -> np.ndarray:
    from sklearn.neighbors import LocalOutlierFactor

    if n_neighbors is None or contamination is None:
        n_neighbors, contamination = adaptive_lof_params(points)
    lof = LocalOutlierFactor(n_neighbors=n_neighbors, contamination=contamination)
    labels = lof.fit_predict(points)
    return points[labels == 1]


def dbscan_outlier_removal(
    points: np.ndarray, eps: float = 0.5, min_samples: int = 5
) -> np.ndarray:
    from sklearn.cluster import DBSCAN
    from sklearn.preprocessing import StandardScaler

    scaled = StandardScaler().fit_transform(points)
    clusters = DBSCAN(eps=eps, min_samples=min_samples).fit_predict(scaled)
    return points[clusters != -1]


def calculate_dimensions(
    points: np.ndarray, rect: np.ndarray
) -> Tuple[float, float]:
    """Edge-point-projection refinement clipped to ±5% of the MBR sides
    (WL_iden.py:492-555). Returns (length, width) along rect edges."""
    original_width = float(np.linalg.norm(rect[1] - rect[0]))
    original_length = float(np.linalg.norm(rect[2] - rect[1]))
    dir1 = (rect[1] - rect[0]) / original_width
    dir2 = (rect[2] - rect[1]) / original_length

    margin = 0.1
    proj1 = np.dot(points - rect[0], dir1)
    proj2 = np.dot(points - rect[1], dir2)
    edge_w = points[
        (proj1 < margin * original_width) | (proj1 > (1 - margin) * original_width)
    ]
    edge_l = points[
        (proj2 < margin * original_length) | (proj2 > (1 - margin) * original_length)
    ]
    if len(edge_w) > 0 and len(edge_l) > 0:
        wp = np.dot(edge_w - rect[0], dir1)
        lp = np.dot(edge_l - rect[1], dir2)
        width = float(
            np.clip(wp.max() - wp.min(), 0.95 * original_width, 1.05 * original_width)
        )
        length = float(
            np.clip(lp.max() - lp.min(), 0.95 * original_length, 1.05 * original_length)
        )
    else:
        width, length = original_width, original_length
    return length, width


def process_bridge_deck(
    points: np.ndarray,
    voxel_size: float = 0.02,
    ransac_max_trials: int = 1000,
    ransac_residual_threshold: float = 0.3,
    isolation_forest_contamination: float = 0.3,
    lof_n_neighbors: int = 30,
    lof_contamination: float = 0.4,
    dbscan_eps: float = 1.0,
    dbscan_min_samples: int = 5,
    percentile: float = 20,
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Full denoise + measure chain on PREDICTED deck points
    (WL_iden.py:365-430). Returns (length, width, trimmed_points, rect) with
    length >= width."""
    result = points[:, :3]
    result = data_voxel(result, voxel_size=voxel_size)
    result = ransac_plane_fit(result, ransac_max_trials, ransac_residual_threshold)
    result = isolation_forest_outlier_removal(result, isolation_forest_contamination)
    result = lof_outlier_removal(result, lof_n_neighbors, lof_contamination)
    result = project_to_plane(result)
    points_trimmed = detect_and_trim_edges(result, percentile)
    result = detect_and_trim_edges(result)
    rect = minimum_bounding_rectangle(result)
    length, width = calculate_dimensions(result, rect)
    return max(width, length), min(width, length), points_trimmed, rect


def process_raw(
    points: np.ndarray, percentile: float = 20
) -> Tuple[float, float, np.ndarray, np.ndarray]:
    """Ground-truth branch: no denoising (WL_iden.py:434-463)."""
    xy = project_to_plane(points[:, :3])
    result = align_to_principal_axes(xy)
    points_trimmed = detect_and_trim_edges(result, percentile)
    result = detect_and_trim_edges(result)
    rect = minimum_bounding_rectangle(result)
    length, width = calculate_dimensions(result, rect)
    return max(width, length), min(width, length), points_trimmed, rect


def evaluate_result(
    length_raw: float, width_raw: float, length_pred: float, width_pred: float
) -> float:
    """Mean relative error over both dimensions (WL_iden.py:466-469)."""
    le = abs(length_raw - length_pred) / length_raw
    we = abs(width_raw - width_pred) / width_raw
    return (le + we) / 2


def save_overlay_figure(
    points_trimmed: np.ndarray,
    rect: np.ndarray,
    out_path: str,
    title: str = "",
) -> str:
    """Trimmed points + fitted minimum bounding rectangle overlay
    (WL_iden.py:633-672 / WL_iden_vision.py figures)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.scatter(points_trimmed[:, 0], points_trimmed[:, 1], s=2, alpha=0.5,
               label="trimmed deck points")
    closed = np.vstack([rect, rect[:1]])
    ax.plot(closed[:, 0], closed[:, 1], "r-", lw=2, label="min bounding rect")
    ax.set_aspect("equal")
    ax.legend()
    ax.set_title(title)
    fig.tight_layout()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    fig.savefig(out_path, dpi=200)
    plt.close(fig)
    return out_path


def run_wl_identification(
    cases: Iterable[Tuple[str, np.ndarray, np.ndarray]],
    out_csv: Optional[str] = None,
    hyperparams: Optional[Dict] = None,
    fig_dir: Optional[str] = None,
) -> List[Dict]:
    """Batch driver mirroring WL_iden.py __main__ (:559-676).

    Args:
      cases: iterable of (name, raw_points [N,>=3], pred_points [M,>=3]) —
        points already filtered to the target class.
      out_csv: append results (hyperparams + per-case rows + mean error).
    Returns the per-case result rows.
    """
    hp = dict(
        voxel_size=0.02,
        ransac_max_trials=1000,
        ransac_residual_threshold=0.3,
        isolation_forest_contamination=0.3,
        lof_n_neighbors=30,
        lof_contamination=0.4,
        percentile=20,
    )
    if hyperparams:
        hp.update(hyperparams)

    rows: List[Dict] = []
    for name, raw_pts, pred_pts in cases:
        t0 = time.time()
        l_raw, w_raw, _, _ = process_raw(raw_pts, percentile=hp["percentile"])
        l_pred, w_pred, trimmed, rect = process_bridge_deck(
            pred_pts,
            voxel_size=hp["voxel_size"],
            ransac_max_trials=hp["ransac_max_trials"],
            ransac_residual_threshold=hp["ransac_residual_threshold"],
            isolation_forest_contamination=hp["isolation_forest_contamination"],
            lof_n_neighbors=hp["lof_n_neighbors"],
            lof_contamination=hp["lof_contamination"],
            percentile=hp["percentile"],
        )
        err = evaluate_result(l_raw, w_raw, l_pred, w_pred)
        if fig_dir:
            try:
                save_overlay_figure(
                    trimmed, rect, os.path.join(fig_dir, f"{name}_overlay.png"),
                    title=f"{name}: {max(l_pred, w_pred):.2f} x "
                          f"{min(l_pred, w_pred):.2f} m (err {err:.3f})",
                )
            except Exception:
                pass
        rows.append(
            {
                "name": name,
                "length_raw": l_raw,
                "width_raw": w_raw,
                "length_pred": l_pred,
                "width_pred": w_pred,
                "relative_error": err,
                "time_s": time.time() - t0,
                **hp,
            }
        )

    if out_csv and rows:
        exists = os.path.exists(out_csv)
        with open(out_csv, "a", newline="") as f:
            w = csv.DictWriter(f, fieldnames=list(rows[0].keys()))
            if not exists:
                w.writeheader()
            w.writerows(rows)
    return rows
