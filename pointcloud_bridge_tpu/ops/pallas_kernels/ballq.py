"""Fused ball-query Pallas kernel.

Reference semantics (Highway_bridge/models/pointnet2_utils.py:97-112): for
each query center, the indices of the first `nsample` points (in ascending
index order) whose squared distance is within radius**2; misses are padded
with the first hit; an empty ball yields index N for every slot (downstream
index_points clamps to N-1).

The XLA path (ops/grouping.py::query_ball_point) materializes the [B, S, N]
distance matrix in HBM and runs a top-k over integer keys (hardware
approx_max_k on TPU, ~95% slot agreement at recall_target 0.90). This kernel
instead keeps everything in VMEM and is EXACT:

  1. distances: 3 VPU broadcast passes (x_c [1, N] vs q_c [TQ, 1]) — the
     [TQ, N] tile never leaves VMEM, so the kernel is compute- not HBM-bound;
  2. hit ranks: cumsum of the radius mask along N (minor/lane axis — cheap
     log-step register shifts);
  3. slot selection WITHOUT any sort: the k-th hit's index equals the number
     of positions whose inclusive hit-rank is <= k, so each output slot is
     one compare + one lane-reduction over N. Reference's "ascending index"
     order falls out of the cumsum for free.

Layout: queries on SUBLANES (TQ=64 per grid step), point axis N on LANES
(dynamic work — cumsum, compares, reductions — must ride the minor axis;
Mosaic handles lane-axis shifts/reduces natively). Output [B, S, K] is
written with k as a static lane index, so no dynamic lane stores occur.

Cost model (B=4, S=1024, N=4096, K=32): ~0.3 GVPU-ops total vs the XLA
path's 64 MB HBM round-trip + aggregation sort.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _cumsum_lanes(x: jax.Array) -> jax.Array:
    """Inclusive cumsum along the last (lane) axis via log-step shifts.

    jnp.cumsum lowers through lax.associative_scan which Mosaic rejects for
    some shapes; explicit shift-and-add compiles everywhere and is O(log N)
    passes over the tile.
    """
    n = x.shape[-1]
    shift = 1
    while shift < n:
        shifted = jnp.pad(x, ((0, 0), (shift, 0)))[:, :n]
        x = x + shifted
        shift *= 2
    return x


def _ballq_kernel(x_ref, q_ref, out_ref, *, r2: float, k: int, n: int):
    # x_ref: [3, N] f32 (points, lane-major); q_ref: [TQ, 3] f32 (queries on
    # sublanes); out_ref: [TQ, K] int32.
    tq = q_ref.shape[0]
    d2 = jnp.zeros((tq, n), jnp.float32)
    for c in range(3):
        diff = q_ref[:, c : c + 1] - x_ref[c : c + 1, :]  # [TQ, N]
        d2 = d2 + diff * diff
    mask = (d2 <= r2).astype(jnp.float32)  # [TQ, N]
    rank = _cumsum_lanes(mask)  # inclusive hit rank at each position
    total = rank[:, n - 1 : n]  # [TQ, 1] hits per ball
    # rank values above k+1 never matter; clamping keeps compares exact in f32
    rank = jnp.minimum(rank, jnp.float32(k + 1))
    cols = []
    for kk in range(k):
        # index of the (kk+1)-th hit == #positions with inclusive rank <= kk
        cnt = jnp.sum((rank <= jnp.float32(kk)).astype(jnp.float32),
                      axis=1, keepdims=True)  # [TQ, 1]
        cols.append(cnt)
    idx = jnp.concatenate(cols, axis=1)  # [TQ, K] f32 (exact ints, <= N)
    first = idx[:, 0:1]  # first hit (or N when the ball is empty)
    slot = jax.lax.broadcasted_iota(jnp.int32, (tq, k), 1).astype(jnp.float32)
    out = jnp.where(slot < total, idx, first)
    out_ref[:, :] = out.astype(jnp.int32)


@partial(jax.jit, static_argnames=("r2", "k", "tq", "interpret"))
def _ballq_call(x_t, q, r2: float, k: int, tq: int, interpret: bool = False):
    b, _, n = x_t.shape
    _, s, _ = q.shape
    return pl.pallas_call(
        partial(_ballq_kernel, r2=r2, k=k, n=n),
        out_shape=jax.ShapeDtypeStruct((b, s, k), jnp.int32),
        grid=(b, s // tq),
        in_specs=[
            pl.BlockSpec((None, 3, n), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tq, 3), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tq, k), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, q)


def ball_query_pallas(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in exact ball query: [B, N, 3] x [B, S, 3] -> [B, S, K] int32.

    Bit-identical to ops.grouping.query_ball_point(..., approx=False).
    """
    b, n, _ = xyz.shape
    _, s, _ = new_xyz.shape
    k = min(nsample, n)

    # pad N so misses stay misses: huge coords -> d2 = inf > r2
    n_pad = max(((n + 127) // 128) * 128, 128)
    if n_pad != n:
        xyz = jnp.pad(xyz.astype(jnp.float32), ((0, 0), (0, n_pad - n), (0, 0)),
                      constant_values=1e30)
    x_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]

    tq = 64 if s >= 64 else 8
    s_pad = ((s + tq - 1) // tq) * tq
    q = new_xyz.astype(jnp.float32)
    if s_pad != s:
        q = jnp.pad(q, ((0, 0), (0, s_pad - s), (0, 0)))

    idx = _ballq_call(x_t, q, float(radius) * float(radius), k, tq, interpret)
    idx = idx[:, :s, :]
    # positions counted into the padded region mean "miss" -> index n
    idx = jnp.where(idx >= n, n, idx)
    if k < nsample:  # more slots than points: reference pads with first hit
        first = idx[..., :1]
        pad = jnp.broadcast_to(first, (b, s, nsample - k))
        idx = jnp.concatenate([idx, pad], axis=-1)
    return idx
