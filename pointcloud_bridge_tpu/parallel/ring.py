"""Sequence-parallel ring attention over a mesh axis.

SURVEY §2.9 (SP/CP row): the reference handles long point sequences purely by
spatial chunking — 4096-pt blocks + sliding grid + vote aggregation
(Highway_bridge/utils/BridgeDataLoader.py:172-280). The TPU-native headroom
item is to shard the point axis itself across the mesh so PTv3's *global*
attention can span a whole scene without any device materializing the full
[N, N] score matrix.

This is blockwise online-softmax attention with K/V rotating around the mesh
axis via `lax.ppermute` (one ICI hop per step — the standard ring-attention
schedule). Each device keeps only its query shard's [B, H, Nl, D] accumulator
and a running (max, denominator) pair in f32, so memory is O(N/P) per device
and the collective traffic is the K/V tensors once around the ring.

Exact (up to float reassociation) vs `jax.nn.dot_product_attention` on the
gathered array — the online-softmax update is order-invariant.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def ring_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, axis_name: str
) -> jax.Array:
    """Global attention over an N axis sharded across `axis_name`.

    Args: q, k, v — [B, Nl, H, D] local shards (call inside shard_map with
    the N axis split over `axis_name`). Softmax scale 1/sqrt(D), matching
    jax.nn.dot_product_attention's default.

    Returns [B, Nl, H, D] — the local query shard's slice of the full-N
    attention output.
    """
    p = lax.psum(1, axis_name)  # static axis size
    d = q.shape[-1]
    # [B, H, Nl, D] layout keeps the blockwise matmuls MXU-shaped
    qf = jnp.transpose(q, (0, 2, 1, 3)).astype(jnp.float32) * (d**-0.5)
    kc = jnp.transpose(k, (0, 2, 1, 3))
    vc = jnp.transpose(v, (0, 2, 1, 3))

    b, h, nl, _ = qf.shape
    m = jnp.full((b, h, nl), -jnp.inf, jnp.float32)  # running row max
    den = jnp.zeros((b, h, nl), jnp.float32)  # running softmax denominator
    num = jnp.zeros((b, h, nl, d), jnp.float32)  # running weighted V sum
    fwd = [(i, (i + 1) % p) for i in range(p)]

    for step in range(p):
        s = jnp.einsum(
            "bhnd,bhmd->bhnm", qf, kc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        m_new = jnp.maximum(m, jnp.max(s, axis=-1))
        c = jnp.exp(m - m_new)  # rescale factor for the old accumulators
        w = jnp.exp(s - m_new[..., None])
        num = num * c[..., None] + jnp.einsum(
            "bhnm,bhmd->bhnd", w, vc.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        den = den * c + jnp.sum(w, axis=-1)
        m = m_new
        if step < p - 1:  # rotate K/V one hop around the ring
            kc = lax.ppermute(kc, axis_name, fwd)
            vc = lax.ppermute(vc, axis_name, fwd)

    out = num / den[..., None]
    return jnp.transpose(out, (0, 2, 1, 3)).astype(q.dtype)
