"""SuperPointTransformer — graph transformer over superpoints
(Highway_bridge/models/spt.py:7-49, transformer.py:29-121, layers.py:6-27).

Operates on one padded superpoint graph: node features x [S, F], edges
edge_index [2, E] (row 0 = source j, row 1 = target i), optional edge_attr
[E, A], with node/edge masks for fixed-shape jit.

Documented deltas from the reference:
  - attention normalizes over each node's INCOMING EDGES via segment softmax;
    the reference's `F.softmax(attn, dim=-1)` normalizes across heads
    (transformer.py:66) — a bug that destroys the attention semantics.
  - edge attributes are projected by a defined Dense layer; the reference
    references an undefined `self.edge_proj` (transformer.py:64) and would
    crash whenever edge_attr is passed.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn


def _segment_softmax(scores: jax.Array, segment_ids: jax.Array, num_segments: int):
    """Softmax over entries sharing a segment id. scores [E, H]."""
    mx = jax.ops.segment_max(scores, segment_ids, num_segments=num_segments)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)
    ex = jnp.exp(scores - mx[segment_ids])
    den = jax.ops.segment_sum(ex, segment_ids, num_segments=num_segments)
    return ex / jnp.maximum(den[segment_ids], 1e-12)


class GraphMLP(nn.Module):
    """layers.py MLP: Linear stack with BN+ReLU+Dropout between layers."""

    channels: Sequence[int]
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        n = len(self.channels)
        for i, c in enumerate(self.channels):
            x = nn.Dense(c, name=f"lin{i}")(x)
            if i < n - 1:
                x = nn.BatchNorm(
                    use_running_average=not train, momentum=0.9,
                    axis_name=self.axis_name, name=f"bn{i}",
                )(x)
                x = nn.relu(x)
                x = nn.Dropout(self.dropout, deterministic=not train)(x)
        return x


class GraphMultiHeadAttention(nn.Module):
    """Edge-wise MHA message passing with add-aggregation
    (transformer.py:29-76)."""

    channels: int
    num_heads: int
    dropout: float = 0.1

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask, train: bool = False):
        s = x.shape[0]
        h = self.num_heads
        d = self.channels // h
        src, dst = edge_index[0], edge_index[1]
        x_j = x[src]  # messages flow source -> target
        x_i = x[dst]
        q = nn.Dense(self.channels, name="q")(x_i).reshape(-1, h, d)
        k = nn.Dense(self.channels, name="k")(x_j).reshape(-1, h, d)
        v = nn.Dense(self.channels, name="v")(x_j).reshape(-1, h, d)
        attn = jnp.sum(q * k, axis=-1) / jnp.sqrt(d)  # [E, H]
        if edge_attr is not None:
            attn = attn + nn.Dense(h, name="edge_proj")(edge_attr)
        attn = jnp.where(edge_mask[:, None], attn, -1e9)
        w = _segment_softmax(attn, dst, s)  # normalize over incoming edges
        w = jnp.where(edge_mask[:, None], w, 0.0)
        w = nn.Dropout(self.dropout, deterministic=not train)(w)
        msgs = v * w[..., None]  # [E, H, D]
        agg = jax.ops.segment_sum(
            msgs.reshape(-1, self.channels), dst, num_segments=s
        )
        return nn.Dense(self.channels, name="o")(agg)


class GraphTransformerEncoder(nn.Module):
    """PreLN attention + FFN block (transformer.py:79-121)."""

    channels: int
    num_heads: int
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, edge_index, edge_attr, edge_mask, train: bool = False):
        r = x
        hx = nn.LayerNorm(name="norm1")(x)
        hx = GraphMultiHeadAttention(
            self.channels, self.num_heads, self.dropout, name="attn"
        )(hx, edge_index, edge_attr, edge_mask, train)
        hx = nn.Dropout(self.dropout, deterministic=not train)(hx)
        x = hx + r
        r = x
        hx = nn.LayerNorm(name="norm2")(x)
        hx = GraphMLP(
            (self.channels * 4, self.channels), self.dropout,
            self.axis_name, name="ffn",
        )(hx, train)
        hx = nn.Dropout(self.dropout, deterministic=not train)(hx)
        return hx + r


class SuperPointTransformer(nn.Module):
    """spt.py:7-49: input MLP -> num_layers graph-transformer encoders ->
    output MLP. Returns per-superpoint logits [S, num_classes]."""

    num_classes: int = 5
    hidden_channels: int = 128
    num_layers: int = 4
    num_heads: int = 8
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        edge_index: jax.Array,
        edge_attr: Optional[jax.Array] = None,
        edge_mask: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        if edge_mask is None:
            edge_mask = jnp.ones(edge_index.shape[1], bool)
        hc = self.hidden_channels
        x = GraphMLP((hc, hc), self.dropout, self.axis_name, name="input_proj")(
            x, train
        )
        for i in range(self.num_layers):
            x = GraphTransformerEncoder(
                hc, self.num_heads, self.dropout, self.axis_name,
                name=f"layer{i}",
            )(x, edge_index, edge_attr, edge_mask, train)
        return GraphMLP(
            (hc // 2, self.num_classes), self.dropout, self.axis_name,
            name="output_proj",
        )(x, train)
