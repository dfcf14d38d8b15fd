"""Fused k-NN inverse-distance interpolation Pallas kernel.

Reference semantics (Highway_bridge/models/pointnet2_utils.py:171-211): for
each destination point, the k(=3, EnhancedFP k=4) nearest source points by
squared distance, weights 1/(d2 + 1e-8) normalized, features blended.

The XLA path (ops/interpolate.py) materializes [B, N, S] distances in HBM,
runs approx_max_k over them (recall 0.95), then blends via a one-hot einsum
— three [B, N, S]-sized HBM round-trips (~200 MB at fp1 shapes). This
kernel keeps everything in VMEM and is EXACT (iterative first-min with
lowest-index tie-breaks, the reference's stable-sort order):

  1. distances: 3 VPU broadcast passes (q_c [TQ, 1] vs x_c [1, S]) — the
     [TQ, S] tile never leaves VMEM;
  2. selection: k rounds of (min, first-min-index, mask) — 2 lane
     reductions per round, no sort;
  3. blend: the weighted one-hot row [TQ, S] contracts with feats [S, D]
     on the MXU in one dot.

Measured v5e (B=4, N=4096, S=1024, D=256, k=3): 0.59 -> 0.42 ms vs the
one-hot-einsum XLA path (chains perturbing dst so the neighbor search can't
be hoisted; the blend dot at Mosaic's HIGHEST precision is ~half the kernel
time — Mosaic rejects Precision.HIGH). Layout: queries on sublanes, S on
lanes (dynamic compares/reductions ride the lane axis); D on lanes for the
MXU dot.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interp_kernel(x_ref, f_ref, q_ref, out_ref, *, k: int, s: int):
    # x_ref: [3, S] f32; f_ref: [S, D] f32; q_ref: [TQ, 3] f32;
    # out_ref: [TQ, D] f32
    blend = _blend_tile(x_ref, q_ref, k=k, s=s)
    out_ref[:, :] = jax.lax.dot_general(
        blend,
        f_ref[:, :],
        (((1,), (0,)), ((), ())),
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def _interp_call(x_t, feats, q, k: int, tq: int, interpret: bool = False):
    b, _, s = x_t.shape
    _, n, _ = q.shape
    d = feats.shape[-1]
    return pl.pallas_call(
        partial(_interp_kernel, k=k, s=s),
        out_shape=jax.ShapeDtypeStruct((b, n, d), jnp.float32),
        grid=(b, n // tq),
        in_specs=[
            pl.BlockSpec((None, 3, s), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, s, d), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tq, 3), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tq, d), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, feats, q)


def _blend_tile(x_ref, q_ref, *, k: int, s: int):
    """Recompute the weighted one-hot blend row [TQ, S] (shared fwd/bwd)."""
    tq = q_ref.shape[0]
    d2 = jnp.zeros((tq, s), jnp.float32)
    for c in range(3):
        diff = q_ref[:, c : c + 1] - x_ref[c : c + 1, :]
        d2 = d2 + diff * diff
    lane = jax.lax.broadcasted_iota(jnp.int32, (tq, s), 1)
    blend = jnp.zeros((tq, s), jnp.float32)
    wsum = jnp.zeros((tq, 1), jnp.float32)
    for _ in range(k):
        m = jnp.min(d2, axis=1, keepdims=True)
        hit = jnp.where(d2 <= m, lane, s)
        idx = jnp.min(hit, axis=1, keepdims=True)
        w = 1.0 / (m + 1e-8)
        blend = blend + jnp.where(lane == idx, w, 0.0)
        wsum = wsum + w
        d2 = jnp.where(lane == idx, jnp.float32(jnp.inf), d2)
    return blend / wsum


def _interp_bwd_kernel(x_ref, q_ref, g_ref, out_ref, *, k: int, s: int):
    # accumulates df [S, D] += blend^T @ g over the query-tile grid axis
    qi = pl.program_id(1)
    blend = _blend_tile(x_ref, q_ref, k=k, s=s)

    @pl.when(qi == 0)
    def _init():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    out_ref[:, :] += jax.lax.dot_general(
        blend,
        g_ref[:, :],
        (((0,), (0,)), ((), ())),  # [S, D]
        precision=lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


@partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def _interp_bwd_call(x_t, q, g, k: int, tq: int, interpret: bool = False):
    b, _, s = x_t.shape
    _, n, d = g.shape
    return pl.pallas_call(
        partial(_interp_bwd_kernel, k=k, s=s),
        out_shape=jax.ShapeDtypeStruct((b, s, d), jnp.float32),
        grid=(b, n // tq),
        in_specs=[
            pl.BlockSpec((None, 3, s), lambda bi, qi: (bi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tq, 3), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tq, d), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, s, d), lambda bi, qi: (bi, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x_t, q, g)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4))
def interpolate_pallas(
    xyz_dst: jax.Array,
    xyz_src: jax.Array,
    feats_src: jax.Array,
    k: int = 3,
    interpret: bool = False,
) -> jax.Array:
    """Drop-in exact k-NN interpolation: [B,N,3] x [B,S,3] x [B,S,D] -> [B,N,D].

    custom VJP: df = blend^T @ dout (recomputed in a second kernel — nothing
    [B,N,S]-shaped is ever saved); dxyz_* are zeros, which is exact for
    training here because FP-layer coordinates are gathers of the raw input
    cloud, never functions of parameters (pointnet2_utils.py:171-211 usage).
    """
    return _forward(xyz_dst, xyz_src, feats_src, k, interpret)


def _pad_xq(xyz_dst, xyz_src):
    """Shared fwd/bwd padding: sources to a 128-multiple (1e30 coords so
    pads are never nearest), queries to a tile multiple."""
    n, s = xyz_dst.shape[1], xyz_src.shape[1]
    s_pad = max(((s + 127) // 128) * 128, 128)
    x = xyz_src.astype(jnp.float32)
    if s_pad != s:
        x = jnp.pad(x, ((0, 0), (0, s_pad - s), (0, 0)), constant_values=1e30)
    x_t = jnp.transpose(x, (0, 2, 1))  # [B, 3, S]
    tq = 256 if n % 256 == 0 else (8 if n < 256 else 128)
    n_pad = ((n + tq - 1) // tq) * tq
    q = xyz_dst.astype(jnp.float32)
    if n_pad != n:
        q = jnp.pad(q, ((0, 0), (0, n_pad - n), (0, 0)))
    return x_t, q, tq, s_pad


def _forward(xyz_dst, xyz_src, feats_src, k, interpret):
    n = xyz_dst.shape[1]
    s = xyz_src.shape[1]
    d = feats_src.shape[-1]
    x_t, q, tq, s_pad = _pad_xq(xyz_dst, xyz_src)
    f = feats_src.astype(jnp.float32)
    if s_pad != s:
        f = jnp.pad(f, ((0, 0), (0, s_pad - s), (0, 0)))
    d_pad = ((d + 127) // 128) * 128
    if d_pad != d:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, d_pad - d)))
    out = _interp_call(x_t, f, q, k, tq, interpret)
    return out[:, :n, :d]


def _interp_fwd(xyz_dst, xyz_src, feats_src, k, interpret):
    out = _forward(xyz_dst, xyz_src, feats_src, k, interpret)
    return out, (xyz_dst, xyz_src)


def _interp_bwd(k, interpret, res, g):
    xyz_dst, xyz_src = res
    s = xyz_src.shape[1]
    d = g.shape[-1]
    x_t, q, tq, _ = _pad_xq(xyz_dst, xyz_src)
    n = xyz_dst.shape[1]
    gp = g.astype(jnp.float32)
    if q.shape[1] != n:  # padded query rows carry zero cotangent
        gp = jnp.pad(gp, ((0, 0), (0, q.shape[1] - n), (0, 0)))
    d_pad = ((d + 127) // 128) * 128
    if d_pad != d:
        gp = jnp.pad(gp, ((0, 0), (0, 0), (0, d_pad - d)))
    df = _interp_bwd_call(x_t, q, gp, k, tq, interpret)[:, :s, :d]
    return (jnp.zeros_like(xyz_dst), jnp.zeros_like(xyz_src), df)


interpolate_pallas.defvjp(_interp_fwd, _interp_bwd)
