"""Fused farthest-point-sampling Pallas kernel.

The jnp FPS (ops/sampling.py) compiles to an XLA while-loop whose per-
iteration state (the running min-distance vector) round-trips HBM and whose
tiny per-step ops each pay loop overhead — measured ~5.5 ms for 4096->1024 on
a v5e. This kernel keeps xyz (transposed to [B, 3, N], lane-major) and the
distance vector [B, N] resident in VMEM for the entire selection loop; each
iteration is a handful of VPU passes over [B*3, N].

Semantics are identical to the reference FPS (pointnet2_utils.py:63-80):
distance init 1e10, min-fold, argmax (first max wins), explicit start index.
The centroid gather is a masked lane-sum (one-hot times xyz) instead of a
dynamic lane slice, which Mosaic handles poorly.

Two layouts, bit-identical outputs (tests/test_pallas_kernels.py):
  - flat  [B, N]      — original; at B=4 only half the 8 sublanes are live.
  - packed [B, G, L]  — N folded onto (sublane, lane) = (G, N/G), full
    vector-unit occupancy for every elementwise pass; original point index is
    g * L + l. Used whenever N folds cleanly (G in {8,4,2}, L % 128 == 0);
    PCB_FPS_PACKED=0 reverts. Exactness holds because per-point distance
    arithmetic keeps the same association and max / first-max-index /
    one-hot-sum reductions are order-independent.
"""

from __future__ import annotations

from functools import partial
from typing import Union

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _fps_kernel(start_ref, xyz_ref, out_ref, dist_ref, *, npoint: int):
    # start_ref: VMEM [1, B] int32; xyz_ref: VMEM [B, 3, N] f32 (lane = N)
    # out_ref: VMEM [npoint, B] int32 (selection index on the SUBLANE axis —
    # Mosaic supports dynamic sublane stores but not dynamic lane stores)
    # dist_ref: VMEM scratch [B, N] f32
    b, _, n = xyz_ref.shape
    dist_ref[:] = jnp.full((b, n), 1e10, jnp.float32)
    lane_ids = jax.lax.broadcasted_iota(jnp.int32, (b, n), dimension=1)
    xyz = xyz_ref[:]  # [B, 3, N]
    far0 = start_ref[:]  # [1, B] — keep every value 2-D for Mosaic

    def body(i, far):
        out_ref[pl.ds(i, 1), :] = far
        far_col = far.reshape(b, 1)
        onehot = (lane_ids == far_col).astype(jnp.float32)  # [B, N]
        centroid = jnp.sum(xyz * onehot[:, None, :], axis=2)  # [B, 3]
        diff = xyz - centroid[:, :, None]
        d = jnp.sum(diff * diff, axis=1)  # [B, N]
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        # first-max argmax without index-typed reductions:
        m = jnp.max(dist, axis=1, keepdims=True)  # [B, 1]
        hit = jnp.where(dist >= m, lane_ids, n)
        return jnp.min(hit, axis=1, keepdims=True).reshape(1, b).astype(jnp.int32)

    jax.lax.fori_loop(0, npoint, body, far0)


def _fps2_kernel(start_ref, x_ref, out_ref, dist_ref, *, npoint: int, n: int):
    # Packed layout: N folded onto (sublane, lane) = (G, L) so every vector
    # pass runs at full 8-sublane occupancy — the flat [B, N] layout leaves
    # 8 - B sublanes idle at the common B=4. start_ref: VMEM [B, 1, 1] int32;
    # x_ref: VMEM [B, 3, G, L] f32 with original point index = g * L + l;
    # out_ref: VMEM [B * npoint, 1] int32 (selection i of batch b at row
    # b * npoint + i — the loop state stays a [B, 1, 1] COLUMN end to end:
    # Mosaic's layout inference rejects the [B,1]<->[1,B] transpose a
    # [npoint, B] row store would need, and dynamic lane stores are illegal,
    # so the row-major [B*npoint, 1] form keeps every store a dynamic
    # SUBLANE store of a [1, 1] tile); dist_ref: VMEM scratch [B, G, L] f32.
    #
    # Exactness: per-point distance arithmetic keeps the reference
    # association ((dx*dx + dy*dy) + dz*dz == sum over the coord axis, left
    # fold); max / first-max-index / one-hot centroid sums are all
    # order-independent reductions, so the packed layout is bit-identical to
    # the flat kernel (asserted by tests/test_pallas_kernels.py).
    b, _, g, l = x_ref.shape
    dist_ref[:] = jnp.full((b, g, l), 1e10, jnp.float32)
    ids = (
        jax.lax.broadcasted_iota(jnp.int32, (b, g, l), dimension=1) * l
        + jax.lax.broadcasted_iota(jnp.int32, (b, g, l), dimension=2)
    )
    x0 = x_ref[:, 0]
    x1 = x_ref[:, 1]
    x2 = x_ref[:, 2]
    far0 = start_ref[:]  # [B, 1, 1]

    def body(i, far):
        for b_i in range(b):  # static unroll: B unit stores on the sublane axis
            out_ref[pl.ds(b_i * npoint + i, 1), :] = far[b_i]
        onehot = (ids == far).astype(jnp.float32)  # [B, G, L]
        # single-axis keepdims reductions only (lane axis, then sublane axis)
        c0 = jnp.sum(jnp.sum(x0 * onehot, axis=2, keepdims=True), axis=1,
                     keepdims=True)  # [B, 1, 1]
        c1 = jnp.sum(jnp.sum(x1 * onehot, axis=2, keepdims=True), axis=1,
                     keepdims=True)
        c2 = jnp.sum(jnp.sum(x2 * onehot, axis=2, keepdims=True), axis=1,
                     keepdims=True)
        d0 = x0 - c0
        d1 = x1 - c1
        d2 = x2 - c2
        d = d0 * d0 + d1 * d1 + d2 * d2
        dist = jnp.minimum(dist_ref[:], d)
        dist_ref[:] = dist
        m = jnp.max(jnp.max(dist, axis=2, keepdims=True), axis=1,
                    keepdims=True)  # [B, 1, 1]
        hit = jnp.where(dist >= m, ids, n)
        return jnp.min(jnp.min(hit, axis=2, keepdims=True), axis=1,
                       keepdims=True).astype(jnp.int32)  # [B, 1, 1]

    jax.lax.fori_loop(0, npoint, body, far0)


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def _fps2_pallas_call(xyz_p, start, npoint: int, interpret: bool = False):
    b, _, g, l = xyz_p.shape
    n = g * l
    out = pl.pallas_call(
        partial(_fps2_kernel, npoint=npoint, n=n),
        out_shape=jax.ShapeDtypeStruct((b * npoint, 1), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, g, l), jnp.float32)],
        interpret=interpret,
    )(start, xyz_p)
    return out.reshape(b, npoint)


@partial(jax.jit, static_argnames=("npoint", "interpret"))
def _fps_pallas_call(xyz_t, start, npoint: int, interpret: bool = False):
    b, _, n = xyz_t.shape
    out = pl.pallas_call(
        partial(_fps_kernel, npoint=npoint),
        out_shape=jax.ShapeDtypeStruct((npoint, b), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((b, n), jnp.float32)],
        interpret=interpret,
    )(start, xyz_t)
    return out.T


def _packed_groups(n: int) -> int:
    """Largest G in {8,4,2} folding N onto full sublanes with lane dim a
    multiple of 128 (vreg width); 0 = packing not applicable."""
    for g in (8, 4, 2):
        if n % g == 0 and (n // g) % 128 == 0:
            return g
    return 0


def fps_pallas(
    xyz: jax.Array,
    npoint: int,
    start_idx: Union[int, jax.Array] = 0,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in Pallas FPS: xyz [B, N, 3] -> [B, npoint] int32."""
    import os

    b, n, _ = xyz.shape
    if isinstance(start_idx, int):
        start = jnp.full((1, b), start_idx, jnp.int32)
    else:
        start = jnp.asarray(start_idx, jnp.int32).reshape(1, b)
    g = _packed_groups(n)
    if g > 1 and os.environ.get("PCB_FPS_PACKED", "1") != "0":
        xyz_p = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1)).reshape(
            b, 3, g, n // g
        )
        return _fps2_pallas_call(
            xyz_p, start.reshape(b, 1, 1), npoint, interpret
        )
    xyz_t = jnp.transpose(xyz.astype(jnp.float32), (0, 2, 1))  # [B, 3, N]
    return _fps_pallas_call(xyz_t, start, npoint, interpret)
