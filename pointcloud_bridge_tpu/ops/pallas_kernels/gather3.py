"""Fused 3-channel neighbor gather Pallas kernel.

XLA lowers `index_points(xyz, idx)` ([B,S,K] rows of 12 B each) to the
hardware gather unit at ~3 ms for B=4, S=N=4096, K=32 on a v5e — the single
largest cost inside BridgeStructureEncoding (models/attention.py). This
kernel replaces it with a two-level one-hot selection that never leaves VMEM,
laid out transposed (queries on lanes, neighbor slot k on sublanes — sublane
blocks may be 8-divisible while lane blocks must be 128-divisible):

  j = hi*32 + lo        (hi in [0, N/32): the MXU contraction dim, 128 for
                         N=4096; lo in [0, 32): a 32-sublane VPU reduce)
  level 1 (MXU):  X [96, N/32] @ one_hot(hi) [N/32, TQ] -> m1 [96, TQ]
  level 2 (VPU):  sum(one_hot(lo) * m1[c*32:(c+1)*32, :], sublanes) -> [1, TQ]

One-hot selection is exact — but only at matmul precision HIGHEST (bf16x3
reconstructs f32 bitwise for a one-hot row; the MXU's default bf16 would
round coordinates, and relative positions of nearby points would cancel to
garbage). Output is bit-identical to jnp.take_along_axis.

Restrictions: 3-channel payload only (wide-feature gathers don't fit the m1
buffer in VMEM and XLA's native gather wins there).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gather3_kernel(idx_ref, x_ref, out_ref, *, kc: int, nh: int, tq: int):
    # idx_ref: [kc, TQ] int32; x_ref: [96, NH] f32; out_ref: [3, kc, TQ] f32
    iota_h = jax.lax.broadcasted_iota(jnp.int32, (nh, tq), 0)
    iota_l = jax.lax.broadcasted_iota(jnp.int32, (32, tq), 0)
    x_t = x_ref[:]  # [96, NH]
    for kk in range(kc):
        idx_row = idx_ref[kk : kk + 1, :]  # [1, TQ]
        hi = jax.lax.shift_right_logical(idx_row, 5)
        lo = jax.lax.bitwise_and(idx_row, 31)
        oh_hi = (iota_h == hi).astype(jnp.float32)  # [NH, TQ]
        m1 = jnp.dot(
            x_t, oh_hi, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )  # [96, TQ]
        oh_lo = (iota_l == lo).astype(jnp.float32)  # [32, TQ]
        for c in range(3):
            seg = m1[c * 32 : (c + 1) * 32, :]
            out_ref[c, kk : kk + 1, :] = jnp.sum(
                seg * oh_lo, axis=0, keepdims=True
            )


@partial(jax.jit, static_argnames=("interpret",))
def _gather3_call(x_planes_t, idx_t, interpret: bool = False):
    b, _, nh = x_planes_t.shape
    _, k, s = idx_t.shape
    tq = min(512, s)
    kc = 8 if k % 8 == 0 else k
    out = pl.pallas_call(
        partial(_gather3_kernel, kc=kc, nh=nh, tq=tq),
        out_shape=jax.ShapeDtypeStruct((b, 3, k, s), jnp.float32),
        grid=(b, s // tq, k // kc),
        in_specs=[
            pl.BlockSpec(
                (None, kc, tq), lambda bi, qi, ki: (bi, ki, qi),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (None, 96, nh), lambda bi, qi, ki: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (None, 3, kc, tq), lambda bi, qi, ki: (bi, 0, ki, qi),
            memory_space=pltpu.VMEM,
        ),
        interpret=interpret,
    )(idx_t, x_planes_t)
    return out


def gather3_pallas(
    xyz: jax.Array, idx: jax.Array, interpret: bool = False
) -> jax.Array:
    """Gather 3-channel points by neighbor index.

    Args:
      xyz: [B, N, 3] float32.
      idx: [B, S, K] int32 (values clamped to N-1, matching index_points).
    Returns:
      [B, S, K, 3] float32, bit-identical to index_points(xyz, idx).
    """
    b, n, _ = xyz.shape
    _, s, k = idx.shape
    n_pad = ((n + 31) // 32) * 32
    if n_pad != n:
        xyz = jnp.pad(xyz, ((0, 0), (0, n_pad - n), (0, 0)))
    nh = n_pad // 32
    # planes^T [B, 96, NH]: planes_t[b, c*32 + lo, hi] = xyz[b, hi*32 + lo, c]
    planes_t = (
        xyz.astype(jnp.float32)
        .reshape(b, nh, 32, 3)
        .transpose(0, 3, 2, 1)
        .reshape(b, 96, nh)
    )
    idx = jnp.minimum(idx.astype(jnp.int32), n - 1)
    tq = min(512, s)
    s_pad = ((s + tq - 1) // tq) * tq
    if s_pad != s:
        idx = jnp.pad(idx, ((0, 0), (0, s_pad - s), (0, 0)))
    idx_t = jnp.transpose(idx, (0, 2, 1))  # [B, K, S]
    out = _gather3_call(planes_t, idx_t, interpret)  # [B, 3, K, S_pad]
    return jnp.transpose(out[..., :s], (0, 3, 2, 1))
