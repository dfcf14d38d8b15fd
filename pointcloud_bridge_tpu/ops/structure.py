"""Local geometric structure ops: closed-form 3x3 eigendecomposition, PCA shape
features, normal estimation.

Capability parity with the reference's structure encodings
(Highway_bridge/models/attention_modules.py):
  - get_structure_features (:622-687): 13-dim per-point local stats from the
    k-NN relative positions (PCA linearity/planarity/sphericity, radius/mean/std
    distance, direction consistency, z stats, mean rel-pos, std norm).
  - compute_normals (:311-338): min-eigenvector of the local covariance.

TPU-first design deltas:
  - `torch.linalg.eigh` on [B*N] 3x3 matrices is replaced by a closed-form
    trigonometric symmetric eigensolver — pure VPU elementwise math, no LAPACK
    host callback, fully fusible by XLA.
  - Eigenvalues are returned in DESCENDING order and the shape features use the
    standard Weinmann et al. convention (linearity=(l1-l2)/l1 with l1 largest).
    The reference indexes torch's ascending order with the descending formula
    (attention_modules.py:639-641), which yields scrambled but learnable
    features; we implement the textbook definition intentionally.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from .grouping import knn
from .core import index_points


def eigvals3_from_entries(a00, a01, a02, a11, a12, a22):
    """Cardano eigenvalues (descending) from the 6 unique entries of a
    symmetric 3x3, elementwise over any batch shape.

    TPU layout note: taking scalar-plane entries instead of an [..., 3, 3]
    tensor matters — minor dims (3, 3) pad to the (8, 128) f32 tile, a 43x
    physical bloat that made the covariance+eigh chain cost 0.43 ms of the
    BSE forward at B=4, N=4096 (measured; plane form avoids it entirely).
    Returns (e1, e2, e3), largest first.
    """
    q = (a00 + a11 + a22) / 3.0
    p1 = a01**2 + a02**2 + a12**2
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = b00**2 + b11**2 + b22**2 + 2.0 * p1
    p = jnp.sqrt(jnp.maximum(p2, 0.0) / 6.0)
    safe_p = jnp.where(p > 1e-12, p, 1.0)

    # det((A - qI) / p) / 2
    c00, c11, c22 = b00 / safe_p, b11 / safe_p, b22 / safe_p
    c01, c02, c12 = a01 / safe_p, a02 / safe_p, a12 / safe_p
    detb = (
        c00 * (c11 * c22 - c12 * c12)
        - c01 * (c01 * c22 - c12 * c02)
        + c02 * (c01 * c12 - c11 * c02)
    )
    r = jnp.clip(detb / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    e2 = 3.0 * q - e1 - e3

    degenerate = p <= 1e-12
    e1 = jnp.where(degenerate, q, e1)
    e2 = jnp.where(degenerate, q, e2)
    e3 = jnp.where(degenerate, q, e3)
    return e1, e2, e3


def eigh3x3(a: jax.Array) -> jax.Array:
    """Eigenvalues of symmetric 3x3 matrices, closed form, descending order.

    Args:
      a: [..., 3, 3] symmetric.
    Returns:
      [..., 3] eigenvalues, largest first.
    """
    a = a.astype(jnp.float32)
    e1, e2, e3 = eigvals3_from_entries(
        a[..., 0, 0], a[..., 0, 1], a[..., 0, 2],
        a[..., 1, 1], a[..., 1, 2], a[..., 2, 2],
    )
    return jnp.stack([e1, e2, e3], axis=-1)


def min_eigvec3x3(a: jax.Array, eigvals: Optional[jax.Array] = None) -> jax.Array:
    """Unit eigenvector of the smallest eigenvalue of symmetric 3x3 matrices.

    Uses the cross-product method: rows of (A - l_min I) are orthogonal to the
    eigenvector; the largest-norm pairwise cross product is the most stable.
    Degenerate neighborhoods fall back to +z.
    """
    if eigvals is None:
        eigvals = eigh3x3(a)
    lmin = eigvals[..., 2]
    eye = jnp.eye(3, dtype=a.dtype)
    m = a - lmin[..., None, None] * eye
    r0, r1, r2 = m[..., 0, :], m[..., 1, :], m[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    cands = jnp.stack([c01, c02, c12], axis=-2)  # [..., 3, 3]
    norms = jnp.linalg.norm(cands, axis=-1)  # [..., 3]
    best = jnp.argmax(norms, axis=-1)
    vec = jnp.take_along_axis(cands, best[..., None, None].repeat(3, -1), axis=-2)
    vec = vec[..., 0, :]
    nrm = jnp.linalg.norm(vec, axis=-1, keepdims=True)
    fallback = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], a.dtype), vec.shape)
    return jnp.where(nrm > 1e-10, vec / jnp.maximum(nrm, 1e-10), fallback)


def local_covariance(rel_pos: jax.Array, unbiased: bool = True) -> jax.Array:
    """Covariance of k-NN relative positions. rel_pos: [B, N, k, 3] -> [B,N,3,3]."""
    k = rel_pos.shape[-2]
    denom = (k - 1) if unbiased else k
    return jnp.einsum(
        "bnki,bnkj->bnij", rel_pos, rel_pos, preferred_element_type=jnp.float32
    ) / denom


def local_structure_features(rel_pos: jax.Array) -> jax.Array:
    """13-dim per-point structure descriptor from k-NN relative positions.

    Mirrors attention_modules.py:622-687: [linearity, planarity, sphericity,
    local_radius, mean_dist, std_dist, direction_consistency, z_std, z_range,
    mean_rel_pos(3), |std(rel_pos)|].

    Args:
      rel_pos: [B, N, k, 3] neighbor positions relative to each point.
    Returns:
      [B, N, 13] float32.
    """
    k = rel_pos.shape[-2]
    rel_pos = rel_pos.astype(jnp.float32)

    # Everything below runs on the coordinate PLANES rx/ry/rz [B, N, k] and
    # [B, N] scalars — never an [..., 3]- or [..., 3, 3]-minor tensor. On TPU
    # the minor two dims pad to the (8, 128) f32 tile, so [B,N,3,3] carries a
    # 43x physical bloat (measured 0.43 ms just for the cov+eigh chain at
    # B=4, N=4096 in the stacked form; the plane form collapses it).
    rx, ry, rz = rel_pos[..., 0], rel_pos[..., 1], rel_pos[..., 2]
    inv_km1 = 1.0 / (k - 1)

    cxx = jnp.sum(rx * rx, axis=-1) * inv_km1
    cyy = jnp.sum(ry * ry, axis=-1) * inv_km1
    czz = jnp.sum(rz * rz, axis=-1) * inv_km1
    cxy = jnp.sum(rx * ry, axis=-1) * inv_km1
    cxz = jnp.sum(rx * rz, axis=-1) * inv_km1
    cyz = jnp.sum(ry * rz, axis=-1) * inv_km1
    e1, e2, e3 = eigvals3_from_entries(cxx, cxy, cxz, cyy, cyz, czz)
    l1 = e1 + 1e-8
    linearity = (e1 - e2) / l1
    planarity = (e2 - e3) / l1
    sphericity = e3 / l1

    mx = jnp.mean(rx, axis=-1)
    my = jnp.mean(ry, axis=-1)
    mz = jnp.mean(rz, axis=-1)
    dx = rx - mx[..., None]
    dy = ry - my[..., None]
    dz = rz - mz[..., None]
    dists = jnp.sqrt(dx * dx + dy * dy + dz * dz)  # [B, N, k]
    local_radius = jnp.max(dists, axis=-1)
    mean_dist = jnp.mean(dists, axis=-1)
    std_dist = jnp.std(dists, axis=-1, ddof=1)

    # Direction consistency: mean pairwise cosine similarity of neighbor dirs.
    # mean_{ij} (u_i . u_j) == |sum_i u_i|^2 / k^2 — O(k) instead of the
    # reference's explicit [k, k] Gram matrix (attention_modules.py:659-663).
    inv_norm = 1.0 / (jnp.sqrt(rx * rx + ry * ry + rz * rz) + 1e-8)
    sx = jnp.sum(rx * inv_norm, axis=-1)
    sy = jnp.sum(ry * inv_norm, axis=-1)
    sz = jnp.sum(rz * inv_norm, axis=-1)
    direction_consistency = (sx * sx + sy * sy + sz * sz) / (k * k)

    z_std = jnp.std(rz, axis=-1, ddof=1)
    z_range = jnp.max(rz, axis=-1) - jnp.min(rz, axis=-1)

    vx = jnp.std(rx, axis=-1, ddof=1)
    vy = jnp.std(ry, axis=-1, ddof=1)
    vz = jnp.std(rz, axis=-1, ddof=1)
    std_norm = jnp.sqrt(vx * vx + vy * vy + vz * vz)

    return jnp.stack(
        [
            linearity, planarity, sphericity,
            local_radius, mean_dist, std_dist,
            direction_consistency,
            z_std, z_range,
            mx, my, mz,
            std_norm,
        ],
        axis=-1,
    )


def estimate_normals(xyz: jax.Array, k: int = 20) -> jax.Array:
    """Per-point normals via min-eigenvector of the k-NN covariance.

    Mirrors compute_normals (attention_modules.py:311-338) with the closed-form
    eigensolver. xyz: [B, N, 3] -> [B, N, 3] unit normals (sign unnormalized,
    matching the reference).
    """
    idx = knn(xyz, k=k)
    neighbors = index_points(xyz, idx)  # [B, N, k, 3]
    rel = neighbors - xyz[:, :, None, :]
    cov = jnp.einsum(
        "bnki,bnkj->bnij", rel, rel, preferred_element_type=jnp.float32
    )
    return min_eigvec3x3(cov)


def knn_relative_positions(
    xyz: jax.Array,
    k: int,
    recall_target: float = 0.95,
    ordered: bool = True,
    query: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array]:
    """k-NN then center-relative positions. Returns (rel_pos [B,S,k,3], idx).

    ordered=False: permutation-invariant consumers (statistics, mean/max
    pooling — BSE/EPE) take the neighbor SET via `knn_set`, skipping the
    approx-top-k aggregation sort on TPU (~2/3 of the kNN cost).

    query (default xyz): query centers [B, S, 3]. A SLICE of xyz yields
    exactly the corresponding rows of the self-kNN result (top-k is
    per-row), which is what sequence-parallel BridgeStructureEncoding
    relies on (models/attention.py sp_axis)."""
    q = xyz if query is None else query
    if ordered:
        idx = knn(xyz, q, k=k, recall_target=recall_target)
    else:
        from .grouping import knn_set

        idx = knn_set(xyz, q, k=k, recall_target=recall_target)
    neighbors = index_points(xyz, idx)
    return neighbors - q[:, :, None, :], idx
