"""Neighborhood grouping ops: ball query, kNN, sample-and-group, EdgeConv graphs.

Parity notes:
  - query_ball_point (reference Highway_bridge/models/pointnet2_utils.py:97-112):
    indices within radius in ascending order, first `nsample` taken, missing
    slots padded with the first hit (if there is no hit at all the reference
    yields index N for every slot, which downstream index_points clamps to N-1;
    we reproduce that).
  - knn (reference Highway_bridge/models/DGCNN.py:49-70): top-k smallest
    pairwise distances (self included).
  - sample_and_group (pointnet2_utils.py:42-60): FPS + ball query +
    center-relative concat.
  - edge_conv_graph_feature (DGCNN.py:72-109): gather k neighbors and emit
    (x_j - x_i, x_i) pairs, channel-last here ([B, N, K, 2C]).

TPU-first design: ball query avoids the reference's full [B,S,N] sort by
encoding "within radius, ascending index" as an integer key and running a
single top-k; XLA fuses the distance matmul (MXU) with the mask/key epilogue.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax import lax

from .core import index_points, square_distance
from .sampling import farthest_point_sample


def _approx_default() -> bool:
    """approx_max_k rides the TPU's hardware partial-reduction path and is
    ~4-25x faster than top_k's full sort at recall ~0.95; neighbor selection
    is distributionally equivalent (any in-radius point is a valid ball-query
    member; 3/4-NN weights degrade negligibly). Default ON for TPU, OFF
    elsewhere (CPU tests stay bit-exact vs oracles)."""
    return jax.default_backend() == "tpu"


def _eager_off_tpu(*arrays) -> bool:
    """True when we're in EAGER execution with an operand committed to a
    non-TPU device (e.g. model.init under jax.default_device(cpu) while the
    default backend is TPU) — a Pallas TPU kernel would fail at dispatch.
    Under jit the operands are Tracers and placement follows the jit device,
    so this returns False and the kernel path is used unguarded: compile-time
    Mosaic/VMEM errors must surface, not be swallowed (advisor round-2 — the
    old `except Exception: pass` both missed compile-time failures under an
    outer jit and masked genuine kernel regressions in eager mode)."""
    for a in arrays:
        if isinstance(a, jax.core.Tracer):
            return False
        if isinstance(a, jax.Array):
            try:
                if any(d.platform != "tpu" for d in a.devices()):
                    return True
            except Exception:
                return False
        else:
            # numpy/python operand in eager: placement follows the active
            # jax.default_device(...) context (e.g. model.init on CPU)
            dd = jax.config.jax_default_device
            if dd is not None and getattr(dd, "platform", "tpu") != "tpu":
                return True
    return False


# VMEM working-set cap for the ballq kernel: live tiles are x [3, N] plus
# ~3-4 [TQ=64, N] f32 intermediates (d2/mask/rank + shift temp). N=8192 keeps
# that ~8-10 MB — comfortably inside a ~16 MB VMEM core; beyond it we fall
# back to the XLA top-k path instead of failing at compile time.
_BALLQ_N_MAX = 8192


def _ballq_pallas_wanted(
    approx: bool | None, n: int, s: int, nsample: int = 32
) -> bool:
    """The fused Pallas ball query (pallas_kernels/ballq.py) is EXACT and
    never materializes the [B, S, N] distance matrix. Measured on v5e vs the
    XLA paths: 14-18x faster than exact top_k at every shape, and faster
    than approx_max_k below ~512 query centers (0.011 vs 0.030 ms at
    S=256/N=1024); at S=1024/N=4096 the kernel's cost scales with nsample
    (selection iterations), so it still wins at k<=16 (0.226 vs 0.275 ms)
    but loses ~2x at k=32 — auto mode keeps approx there. (A dual-radius
    kernel sharing one distance tile was sized up and rejected: the k=32
    selection dominates, so the shared distance saves < the k=32 loss.)
    PCB_BALLQ_PALLAS=0 disables, =1 forces it (still subject to the VMEM
    N cap)."""
    import os

    if jax.default_backend() != "tpu" or n < 2 or s < 2:
        return False
    if n > _BALLQ_N_MAX:
        return False
    flag = os.environ.get("PCB_BALLQ_PALLAS")
    if flag is not None:
        return flag not in ("0", "false", "")
    if approx is False:
        return True  # exact request: beats top_k's full sort everywhere
    return s <= 512 or (s <= 1024 and nsample <= 16)


def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    approx: bool | None = None,
    recall_target: float = 0.90,
) -> jax.Array:
    """Fixed-radius neighborhood query.

    Args:
      radius: ball radius.
      nsample: neighbors per ball (static).
      xyz: all points [B, N, 3].
      new_xyz: query centers [B, S, 3].
      recall_target: approx top-k recall (TPU only). The ball is an UNORDERED
        in-radius set whose misses are padded anyway, so a lower buffer
        target (0.90) trades a ~2% slot difference for ~2x cheaper
        aggregation; pass 1.0-ish (0.95+) for stricter parity runs.
    Returns:
      [B, S, nsample] int32 indices into N. Misses are padded with the first
      hit; if a ball is empty every slot holds N (clamped by index_points).
    """
    n = xyz.shape[1]
    s = new_xyz.shape[1]
    if _ballq_pallas_wanted(approx, n, s, nsample) and not _eager_off_tpu(
        xyz, new_xyz
    ):
        from .pallas_kernels.ballq import ball_query_pallas

        return ball_query_pallas(radius, nsample, xyz, new_xyz)
    sqrdists = square_distance(new_xyz, xyz)  # [B, S, N]
    arange = jnp.arange(n, dtype=jnp.int32)
    within = sqrdists <= radius * radius
    # Key: hits map to N - index (so larger key == smaller index), misses to 0.
    # Descending top-k over keys == ascending index order over hits.
    # (A sort-free cumsum+searchsorted variant was benchmarked on v5e and
    # lost to top_k by ~1.8x end-to-end — XLA's top_k fuses with the distance
    # matmul epilogue while the vmapped binary search lowers to serial
    # gathers. Keep top_k.)
    key = jnp.where(within, n - arange, 0)
    k_eff = min(nsample, n)
    if approx is None:
        approx = _approx_default()
    if approx and k_eff < n:
        keys_f, _ = lax.approx_max_k(
            key.astype(jnp.float32), k_eff, recall_target=recall_target
        )
        topk_keys = keys_f.astype(jnp.int32)  # keys <= N < 2^24: exact in f32
    else:
        topk_keys, _ = lax.top_k(key, k_eff)
    if k_eff < nsample:  # pad with misses (key 0 -> index N)
        pad = jnp.zeros(topk_keys.shape[:-1] + (nsample - k_eff,), topk_keys.dtype)
        topk_keys = jnp.concatenate([topk_keys, pad], axis=-1)
    idx = (n - topk_keys).astype(jnp.int32)  # miss (key 0) -> N
    first = idx[..., :1]
    hit = topk_keys > 0
    return jnp.where(hit, idx, jnp.broadcast_to(first, idx.shape))


def knn(
    xyz: jax.Array,
    query: Optional[jax.Array] = None,
    k: int = 20,
    approx: bool | None = None,
    recall_target: float = 0.95,
) -> jax.Array:
    """k nearest neighbors by squared Euclidean distance (self included).

    Args:
      xyz: [B, N, C] reference points.
      query: [B, S, C] query points; defaults to xyz.
      approx: use the TPU hardware top-k; defaults on for TPU.
      recall_target: expected recall of the approx top-k set. Controls the
        hardware partial-reduce buffer (L) that the final aggregation must
        sort: on v5e at N=4096, k=32, dropping 0.95 -> 0.90 halves L and cuts
        the aggregation from 3.1 ms to 0.7 ms. Callers that only consume
        neighborhood STATISTICS (e.g. BridgeStructureEncoding) pass 0.90.
    Returns:
      [B, S, k] int32 indices into N, nearest first.
    """
    return knn_with_distance(xyz, query, k, approx, recall_target)[1]


def knn_with_distance(
    xyz: jax.Array,
    query: Optional[jax.Array] = None,
    k: int = 20,
    approx: bool | None = None,
    recall_target: float = 0.95,
) -> Tuple[jax.Array, jax.Array]:
    """Like knn() but also returns the squared distances [B, S, k]."""
    if query is None:
        query = xyz
    if approx is None:
        approx = _approx_default()
    d = square_distance(query, xyz)
    if approx and k < xyz.shape[1]:
        neg, idx = lax.approx_max_k(-d, k, recall_target=recall_target)
    else:
        neg, idx = lax.top_k(-d, k)
    return (-neg), idx.astype(jnp.int32)


def knn_set(
    xyz: jax.Array,
    query: Optional[jax.Array] = None,
    k: int = 16,
    recall_target: float = 0.90,
) -> jax.Array:
    """k nearest neighbors, SET semantics (indices NOT distance-sorted).

    For permutation-invariant consumers (neighborhood statistics, mean- or
    max-pooled per-neighbor MLPs: BSE/EPE/EdgeConv) the distance ordering of
    `knn` is unused. The bit-bisection buffer-selection kernel
    (pallas_kernels/knnset.py) replaces approx_max_k's aggregation sort with
    an exact O(L) selection — but MEASURED NEUTRAL on v5e at rt 0.90 buffer
    sizes (same-run: k=16/L=256 0.98 vs 0.91 ms; k=32/L=512 1.51 vs
    1.46 ms): the 31 bisection compare+reduce passes cost what the L<=512
    sort does. Default OFF (PCB_KNNSET_PALLAS=1 opts in, e.g. for
    recall_target>=0.95 workloads where L doubles and the sort dominates);
    the op then falls back to `knn` (a sorted list is also a valid set).

    Returns [B, S, k] int32.
    """
    import os

    if query is None:
        query = xyz
    n = xyz.shape[1]
    wanted = (
        jax.default_backend() == "tpu"
        and os.environ.get("PCB_KNNSET_PALLAS", "0") not in ("0", "false")
        and k < n
        and k <= 64
        and not _eager_off_tpu(xyz, query)
    )
    if not wanted:
        return knn(xyz, query, k, recall_target=recall_target)
    from .pallas_kernels.knnset import topk_set_from_buffer

    d = square_distance(query, xyz)
    neg, idx = lax.approx_max_k(
        -d, k, recall_target=recall_target, aggregate_to_topk=False
    )
    if neg.shape[-1] > 1024:  # VMEM cap on the [TQ, L] selection tiles
        return knn(xyz, query, k, recall_target=recall_target)
    return topk_set_from_buffer(neg, idx, k)


def knn_stat_weighted(
    xyz: jax.Array, k: int = 16, approx: bool | None = None
) -> jax.Array:
    """RandLANet_ss's statistically re-weighted kNN
    (Highway_bridge/models/RandLANet_ss.py:58-97), vectorized.

    The reference takes the 2k nearest points, computes their mean/std,
    weights each candidate by exp(-||p - mean||^2 / mean(std + 1e-6)), and
    keeps the k candidates with the smallest weighted distance. (Its per-point
    Python loop is replaced by one batched top-k + sort — same selection.)

    Returns [B, N, k] int32 indices.
    """
    n = xyz.shape[1]
    k = min(k, n)
    k2 = min(2 * k, n)
    d2, idx2 = knn_with_distance(xyz, k=k2, approx=approx)  # ascending
    pts = index_points(xyz, idx2)  # [B, N, k2, 3]
    mean = jnp.mean(pts, axis=2, keepdims=True)
    std = jnp.std(pts, axis=2, ddof=1)  # [B, N, 3] (torch.std: unbiased)
    denom = jnp.mean(std + 1e-6, axis=-1, keepdims=True)
    w = jnp.exp(-jnp.sum((pts - mean) ** 2, axis=-1) / denom)  # [B, N, k2]
    order = jnp.argsort(d2 * w, axis=-1)[..., :k]
    return jnp.take_along_axis(idx2, order, axis=-1).astype(jnp.int32)


def group_points(
    xyz: jax.Array,
    new_xyz: jax.Array,
    idx: jax.Array,
    features: Optional[jax.Array] = None,
) -> jax.Array:
    """Gather neighborhoods and form center-relative features.

    Args:
      xyz: [B, N, 3]; new_xyz: [B, S, 3]; idx: [B, S, K] into N;
      features: optional [B, N, C].
    Returns:
      [B, S, K, 3] (xyz only) or [B, S, K, 3 + C] with features appended —
      same layout as reference sample_and_group (channel-last).
    """
    grouped_xyz = index_points(xyz, idx)  # [B, S, K, 3]
    grouped_xyz = grouped_xyz - new_xyz[:, :, None, :]
    if features is None:
        return grouped_xyz
    grouped_feats = index_points(features, idx)  # [B, S, K, C]
    return jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    features: Optional[jax.Array] = None,
    fps_start_idx=0,
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """FPS + ball query + center-relative grouping (pointnet2_utils.py:42-60).

    Returns (new_xyz [B,S,3], new_points [B,S,K,3(+C)], fps_idx [B,S]).
    """
    fps_idx = farthest_point_sample(xyz, npoint, fps_start_idx)
    new_xyz = index_points(xyz, fps_idx)
    idx = query_ball_point(radius, nsample, xyz, new_xyz)
    new_points = group_points(xyz, new_xyz, idx, features)
    return new_xyz, new_points, fps_idx


def edge_conv_graph_feature(
    x: jax.Array, k: int = 20, idx: Optional[jax.Array] = None
) -> jax.Array:
    """DGCNN dynamic-graph feature: (x_j - x_i, x_i) over k nearest neighbors.

    Args:
      x: [B, N, C] point features (graph is built in this feature space).
      idx: optional precomputed [B, N, k] neighbor indices.
    Returns:
      [B, N, k, 2C] — reference emits [B, 2C, N, k] (DGCNN.py:72-109); we are
      channel-last throughout.
    """
    if idx is None:
        idx = knn(x, k=k)
    neighbors = index_points(x, idx)  # [B, N, k, C]
    center = x[:, :, None, :]
    center_tiled = jnp.broadcast_to(center, neighbors.shape)
    return jnp.concatenate([neighbors - center_tiled, center_tiled], axis=-1)
