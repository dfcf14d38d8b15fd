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


class SPTSegmenter(nn.Module):
    """Point-level SPT wrapper: superpoint partition -> SuperPointTransformer
    -> propagate logits back to points, the end-to-end wiring of
    Highway_bridge/archive/train.py:13-36 (+ datasets/pcd.py preprocessing),
    packaged as one engine-trainable module with the standard
    apply(vars, xyz, feats, train) -> [B, N, C] signature.

    Design delta (TPU-first): the reference partitions with host DBSCAN into
    a ragged number of superpoints (datasets/preprocessing/
    superpoint_generation.py:37-92). Dynamic node counts cannot jit, so this
    wrapper partitions with the same batched k-means used by our SPG
    (models/spg.py::kmeans_partition) into a FIXED S superpoints, builds the
    kNN superpoint graph with edge features [dist | feature diff | direction]
    matching graph_construction.py:5-45, and runs the whole batch as one
    flattened graph (node ids offset per element). Host DBSCAN partitioning
    remains available via data/superpoints.py for offline parity.
    """

    num_classes: int = 5
    superpoint_size: int = 50  # points per superpoint (S = N // this)
    hidden_channels: int = 128
    num_layers: int = 4
    num_heads: int = 8
    knn_k: int = 8
    kmeans_iters: int = 3
    dropout: float = 0.1
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array] = None,
        train: bool = False,
    ) -> jax.Array:
        from ..ops import knn
        from .spg import kmeans_partition, segment_stats

        b, n, _ = xyz.shape
        if features is None:
            features = xyz
        s = max(16, n // self.superpoint_size)

        assign, centroids, onehot = kmeans_partition(xyz, s, self.kmeans_iters)
        counts = jnp.sum(onehot, axis=1)  # [B, S]

        # node features ~ pcd.py superpoint features: centroid, mean/std of
        # point features, log size
        feats_in = jnp.concatenate([xyz, features], axis=-1)
        mx, mean, std = segment_stats(feats_in, onehot, assign)
        node_x = jnp.concatenate(
            [centroids, mean, std, mx, jnp.log1p(counts)[..., None]], axis=-1
        )  # [B, S, F]

        # kNN graph over centroids (graph_construction.py:5-45)
        k = min(self.knn_k + 1, s)
        nbr = knn(centroids, k=k)[..., 1:]  # [B, S, k-1] drop self
        kk = nbr.shape[-1]
        tgt = jnp.broadcast_to(jnp.arange(s)[None, :, None], (b, s, kk))
        src = nbr.astype(jnp.int32)
        # edge attributes: [dist | x_i - x_j | dir c_j - c_i]
        ci = centroids[:, :, None, :]  # [B, S, 1, 3]
        cj = jnp.take_along_axis(
            centroids, src.reshape(b, -1)[..., None], axis=1
        ).reshape(b, s, kk, 3)
        direction = cj - ci
        dist = jnp.linalg.norm(direction, axis=-1, keepdims=True)
        xi = node_x[:, :, None, :]
        xj = jnp.take_along_axis(
            node_x, src.reshape(b, -1)[..., None], axis=1
        ).reshape(b, s, kk, node_x.shape[-1])
        edge_attr = jnp.concatenate(
            [dist, xi - xj, direction], axis=-1
        )  # [B, S, kk, 1+F+3]

        # flatten the batch into one graph (node ids offset by element)
        offsets = (jnp.arange(b, dtype=jnp.int32) * s)[:, None, None]
        src_f = (src + offsets).reshape(-1)
        tgt_f = (tgt.astype(jnp.int32) + offsets).reshape(-1)
        edge_index = jnp.stack([src_f, tgt_f])  # [2, B*S*kk]
        x_flat = node_x.reshape(b * s, -1)
        attr_flat = edge_attr.reshape(b * s * kk, -1)

        sp_logits = SuperPointTransformer(
            self.num_classes, self.hidden_channels, self.num_layers,
            self.num_heads, self.dropout, self.axis_name, name="spt",
        )(x_flat, edge_index, attr_flat, None, train)  # [B*S, C]

        sp_logits = sp_logits.reshape(b, s, self.num_classes)
        return jnp.take_along_axis(sp_logits, assign[..., None], axis=1)
