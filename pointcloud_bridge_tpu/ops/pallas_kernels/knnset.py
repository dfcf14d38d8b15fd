"""Exact top-k selection from the hardware partial-reduce buffer (kNN SET).

Motivation (measured on v5e, B=4, S=N=4096): `lax.approx_max_k`'s cost is
almost entirely its final AGGREGATION SORT of the [B, S, L] candidate buffer
(k=16 rt0.90: full op 1.79 ms, the partial-reduce phase alone 0.6 ms). But
the hot consumers of kNN indices — BridgeStructureEncoding statistics,
EnhancedPositionalEncoding means, EdgeConv max-pooling — are permutation
INVARIANT: they need the neighbor SET, not distance-sorted order. This
kernel replaces the sort with an O(L) bit-bisection selection:

  1. d2 bits: nonnegative f32 bitcast to i32 is order-preserving, so the
     k-th smallest distance is found by 31-step binary search on the BIT
     value, each step one compare + one lane reduction over the [TQ, L]
     tile (no sort, nothing leaves VMEM);
  2. selection mask: d2 < tau, plus ties at tau taken in buffer order via a
     cumsum rank (exactly k selected — identical SET to sorting the buffer
     and taking k, ties broken by buffer position);
  3. extraction: the s-th selected original index is recovered by one
     compare + lane reduction per output slot (k <= 32).

The result is bit-identical as a SET to `lax.approx_max_k(..., k)` on the
same buffer — same recall semantics, no aggregation sort.

Layout: queries on sublanes, the L candidate axis on lanes (compares,
reductions, cumsum shifts all ride the lane axis); output slot k is a
static lane index (no dynamic lane stores).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .ballq import _cumsum_lanes


def _knnset_kernel(v_ref, i_ref, out_ref, *, k: int, l: int):
    # v_ref: [TQ, L] f32 squared distances (pads +inf); i_ref: [TQ, L] f32
    # original indices (exact integers); out_ref: [TQ, K] i32.
    v = v_ref[:, :]
    bits = pltpu.bitcast(v, jnp.int32)  # monotone for nonneg f32 (+inf pads)
    tq = v.shape[0]

    lo = jnp.full((tq, 1), -1, jnp.int32)
    hi = jnp.full((tq, 1), 0x7F800000, jnp.int32)  # +inf bits
    kf = jnp.float32(k)
    # invariant: cnt(bits <= lo) < k <= cnt(bits <= hi); 31 halvings close
    # the [−1, inf] bit range to hi == k-th smallest bit value
    for _ in range(31):
        mid = lo + jax.lax.shift_right_logical(hi - lo, 1)
        cnt = jnp.sum((bits <= mid).astype(jnp.float32), axis=1, keepdims=True)
        take = cnt >= kf
        hi = jnp.where(take, mid, hi)
        lo = jnp.where(take, lo, mid)
    tau = hi  # [TQ, 1]

    mask_lt = (bits < tau).astype(jnp.float32)
    mask_eq = (bits == tau).astype(jnp.float32)
    n_lt = jnp.sum(mask_lt, axis=1, keepdims=True)
    need = kf - n_lt  # how many ties to take, in buffer order
    rank_eq = _cumsum_lanes(mask_eq)
    sel = mask_lt + mask_eq * (rank_eq <= need).astype(jnp.float32)
    rank_sel = _cumsum_lanes(sel)  # 1..k at selected positions

    idxf = i_ref[:, :]
    for s in range(k):
        hit = (rank_sel == jnp.float32(s + 1)) & (sel > 0.0)
        col = jnp.sum(jnp.where(hit, idxf, 0.0), axis=1, keepdims=True)
        out_ref[:, s : s + 1] = col.astype(jnp.int32)


@partial(jax.jit, static_argnames=("k", "tq", "interpret"))
def _knnset_call(vals, idxf, k: int, tq: int, interpret: bool = False):
    b, s, l = vals.shape
    return pl.pallas_call(
        partial(_knnset_kernel, k=k, l=l),
        out_shape=jax.ShapeDtypeStruct((b, s, k), jnp.int32),
        grid=(b, s // tq),
        in_specs=[
            pl.BlockSpec((None, tq, l), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((None, tq, l), lambda bi, qi: (bi, qi, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((None, tq, k), lambda bi, qi: (bi, qi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(vals, idxf)


def topk_set_from_buffer(
    neg_d2: jax.Array, idx: jax.Array, k: int, interpret: bool = False
) -> jax.Array:
    """Select the k smallest-distance entries of a candidate buffer.

    Args:
      neg_d2: [B, S, L] f32 — NEGATED squared distances, as returned by
        `lax.approx_max_k(-d2, ..., aggregate_to_topk=False)`.
      idx: [B, S, L] int — original candidate indices for each buffer slot.
      k: how many to select (k <= L, k <= 32 recommended).
    Returns:
      [B, S, k] int32 — the selected ORIGINAL indices, in buffer order
      (NOT distance-sorted): set semantics only.
    """
    b, s, l = neg_d2.shape
    v = -neg_d2.astype(jnp.float32)  # d2 >= 0
    idxf = idx.astype(jnp.float32)  # exact for indices < 2^24
    tq = 256 if s % 256 == 0 else (8 if s < 256 else 128)
    s_pad = ((s + tq - 1) // tq) * tq
    if s_pad != s:
        pad = ((0, 0), (0, s_pad - s), (0, 0))
        v = jnp.pad(v, pad, constant_values=jnp.inf)
        idxf = jnp.pad(idxf, pad)
    out = _knnset_call(v, idxf, k, tq, interpret)
    return out[:, :s, :]
