"""Point sampling ops: farthest point sampling (FPS) and random subset sampling.

Parity notes:
  - FPS (reference Highway_bridge/models/pointnet2_utils.py:63-80): iterative
    max-min. distance starts at 1e10; each step records the current farthest
    index, folds in distances to it with min(), then argmax picks the next.
    The reference seeds `farthest` with torch.randint; we take an explicit
    `start_idx` (int or [B] array) so runs are reproducible, defaulting to 0.
  - Random sampling (reference Highway_bridge/models/RandLANet.py:6-44):
    per-batch randperm subset of floor(N * ratio) points.

The jnp FPS compiles to a single fused XLA while-loop with the running distance
vector resident on-chip; a Pallas variant (ops/pallas_kernels/fps.py) keeps xyz
and the distance vector pinned in VMEM explicitly and is used on TPU.
"""

from __future__ import annotations

from typing import Union

import jax
import jax.numpy as jnp
from jax import lax


def farthest_point_sample(
    xyz: jax.Array,
    npoint: int,
    start_idx: Union[int, jax.Array] = 0,
    *,
    use_pallas: bool | None = None,
) -> jax.Array:
    """Iterative farthest point sampling.

    Args:
      xyz: [B, N, 3]
      npoint: number of points to select (static).
      start_idx: initial centroid index, int or [B] int array.
    Returns:
      [B, npoint] int32 indices into N.
    """
    # The Pallas kernel is ~6x faster than the jnp selection loop on v5e
    # (VMEM-resident distance vector + sublane-packed layout; 0.49 vs 2.8 ms
    # per 4096->1024 problem)
    # but hangs/mis-compiles when placed inside OUTER lax loops (fori/scan)
    # on the current remote-compile stack. Every shipped engine path (train
    # step, eval, block/vote inference, benches) calls models under plain
    # jit with python-level batching — verified kernel-safe — so the kernel
    # is DEFAULT ON for TPU (round 2). Embedding the model inside your own
    # lax.scan/fori_loop requires PCB_FPS_PALLAS=0 (or use_pallas=False).
    if use_pallas is None:
        import os

        use_pallas = (
            os.environ.get("PCB_FPS_PALLAS", "1") != "0"
            and jax.default_backend() == "tpu"
        )
    if use_pallas:
        try:
            from .pallas_kernels.fps import fps_pallas

            return fps_pallas(xyz, npoint, start_idx)
        except Exception:
            pass  # fall back to the jnp path (e.g. older jaxlib)
    return _fps_jnp(xyz, npoint, start_idx)


def _fps_jnp(
    xyz: jax.Array, npoint: int, start_idx: Union[int, jax.Array] = 0
) -> jax.Array:
    b, n, _ = xyz.shape
    xyz = xyz.astype(jnp.float32)
    if isinstance(start_idx, int):
        farthest0 = jnp.full((b,), start_idx, dtype=jnp.int32)
    else:
        farthest0 = jnp.asarray(start_idx, dtype=jnp.int32).reshape(b)

    centroids0 = jnp.zeros((b, npoint), dtype=jnp.int32)
    distance0 = jnp.full((b, n), 1e10, dtype=jnp.float32)

    def body(i, state):
        centroids, distance, farthest = state
        centroids = lax.dynamic_update_slice_in_dim(
            centroids, farthest[:, None], i, axis=1
        )
        centroid = jnp.take_along_axis(xyz, farthest[:, None, None], axis=1)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, d)
        farthest = jnp.argmax(distance, axis=-1).astype(jnp.int32)
        return centroids, distance, farthest

    centroids, _, _ = lax.fori_loop(
        0, npoint, body, (centroids0, distance0, farthest0)
    )
    return centroids


def random_sample_indices(
    key: jax.Array, n: int, npoint: int, batch: int
) -> jax.Array:
    """Per-batch random permutation subset (RandLA-style downsampling).

    Returns [batch, npoint] int32 indices, each row a distinct random subset.
    """
    keys = jax.random.split(key, batch)

    def one(k):
        return jax.random.permutation(k, n)[:npoint]

    return jax.vmap(one)(keys).astype(jnp.int32)


def density_weighted_sample_indices(
    key: jax.Array, xyz: jax.Array, npoint: int, k: int = 8
) -> jax.Array:
    """Density-weighted random sampling (RandLANet_ss.py:8-55): sampling
    probability inversely proportional to local density (mean kNN distance
    used as the inverse-density proxy), sampled without replacement via the
    Gumbel top-k trick.

    xyz: [B, N, 3] -> [B, npoint] int32.
    """
    from .grouping import knn_with_distance  # local import: avoid cycle

    d, _ = knn_with_distance(xyz, k=min(k + 1, xyz.shape[1]))
    # mean distance to neighbors (excluding self at slot 0) ~ 1/density
    sparsity = jnp.mean(jnp.sqrt(jax.nn.relu(d[..., 1:])), axis=-1)  # [B, N]
    logits = jnp.log(sparsity + 1e-8)
    gumbel = -jnp.log(-jnp.log(jax.random.uniform(key, logits.shape) + 1e-12))
    _, idx = jax.lax.top_k(logits + gumbel, npoint)
    return idx.astype(jnp.int32)
