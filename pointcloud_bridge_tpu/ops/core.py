"""Core dense ops: pairwise squared distance and batched gather.

Parity notes (reference: Highway_bridge/models/pointnet2_utils.py):
  - square_distance (:7-14): computed as -2*src@dstT + |src|^2 + |dst|^2. We expose
    the same decomposition so XLA maps the dominant term onto the MXU.
  - index_points (:17-39): batched gather with clamp-to-valid semantics (the
    reference clamps indices into [0, N-1]; ball-query misses encode index N and
    rely on this clamp). We keep the clamp for identical behavior.

TPU fast path: 3-channel [B,S,K] gathers (grouped xyz / kNN relative
positions — the hot gathers in every PointNet++-family model) dispatch to the
fused Pallas two-level one-hot kernel (pallas_kernels/gather3.py), which is
bit-identical to the XLA gather and ~8x faster on v5e. Disable with
PCB_GATHER3_PALLAS=0. Backward pass = the same scatter-add XLA would emit for
take_along_axis, so training behaves identically.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp


def _gather3_enabled() -> bool:
    return (
        os.environ.get("PCB_GATHER3_PALLAS", "1") == "1"
        and jax.default_backend() == "tpu"
    )


@jax.custom_vjp
def _gather3(points: jax.Array, idx: jax.Array) -> jax.Array:
    from .pallas_kernels.gather3 import gather3_pallas

    return gather3_pallas(points, idx)


def _gather3_fwd(points, idx):
    return _gather3(points, idx), (idx, points)


def _gather3_bwd(res, g):
    idx, points = res  # points only provides static shape/dtype
    b = idx.shape[0]
    flat = idx.reshape(b, -1)
    g2 = g.reshape(b, -1, 3).astype(points.dtype)
    zeros = jnp.zeros_like(points)
    # same scatter-add XLA emits for take_along_axis's transpose
    dpoints = jax.vmap(lambda z, i, gg: z.at[i].add(gg))(zeros, flat, g2)
    return dpoints, None


_gather3.defvjp(_gather3_fwd, _gather3_bwd)


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """Pairwise squared Euclidean distance.

    Args:
      src: [B, N, C]
      dst: [B, M, C]
    Returns:
      [B, N, M] squared distances (may be slightly negative from fp cancellation,
      matching the reference's formula exactly).
    """
    # -2 * src @ dst^T rides the MXU; norms fuse into the epilogue.
    # HIGHEST precision: distance ordering feeds top-k/ball-query index
    # selection, where bf16 matmul error flips neighbor ranks.
    cross = jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    s2 = jnp.sum(src.astype(jnp.float32) ** 2, axis=-1)[:, :, None]
    d2 = jnp.sum(dst.astype(jnp.float32) ** 2, axis=-1)[:, None, :]
    return (-2.0 * cross + s2 + d2).astype(src.dtype)


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Batched gather: out[b, ...] = points[b, idx[b, ...], :].

    Args:
      points: [B, N, C]
      idx: int array [B, ...] (any trailing shape, e.g. [B,S] or [B,S,K])
    Returns:
      [B, *idx.shape[1:], C]
    """
    n = points.shape[1]
    idx = jnp.clip(idx, 0, n - 1)
    if (
        points.ndim == 3
        and points.shape[-1] == 3
        and idx.ndim == 3
        and points.dtype == jnp.float32
        and _gather3_enabled()
    ):
        try:
            return _gather3(points, idx)
        except Exception:
            pass  # e.g. eager execution placed on CPU (model.init)
    return jax.vmap(lambda p, i: p[i])(points, idx)
