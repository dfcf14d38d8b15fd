"""DGCNN semantic segmentation (Highway_bridge/models/DGCNN.py:6-172).

4 EdgeConv stages over dynamic feature-space kNN graphs (k=20; graph rebuilt
from the CURRENT features each stage), multi-scale local concat (320ch) ->
1024 global -> [local|global]=1344 per-point head. Uses LeakyReLU(0.2) and
bias-free edge convs, matching the reference. Only xyz enters the network
(DGCNN.py:129-132 ignores extra features).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import edge_conv_graph_feature


class EdgeConv(nn.Module):
    """One EdgeConv: graph feature (x_j - x_i, x_i) -> Dense(no bias)+BN+
    LeakyReLU -> max over neighbors."""

    features: int
    k: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        g = edge_conv_graph_feature(x, k=self.k)  # [B, N, k, 2C]
        h = nn.Dense(self.features, use_bias=False, name="conv")(g)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="bn",
        )(h)
        h = nn.leaky_relu(h, negative_slope=0.2)
        return jnp.max(h, axis=2)  # [B, N, features]


class DGCNN(nn.Module):
    num_classes: int = 5
    k: int = 20
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        del features  # reference uses coordinates only (DGCNN.py:129-132)
        n = xyz.shape[1]
        k = min(self.k, n - 1)
        ax = self.axis_name

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=ax, name=name,
            )

        x1 = EdgeConv(64, k, ax, name="conv1")(xyz, train)
        x2 = EdgeConv(64, k, ax, name="conv2")(x1, train)
        x3 = EdgeConv(64, k, ax, name="conv3")(x2, train)
        x4 = EdgeConv(128, k, ax, name="conv4")(x3, train)

        local = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 320]
        local_n = nn.leaky_relu(bn("local_bn")(local), negative_slope=0.2)

        g = nn.Dense(1024, use_bias=False, name="conv5")(local)
        g = nn.leaky_relu(bn("bn5")(g), negative_slope=0.2)
        global_feat = jnp.max(g, axis=1, keepdims=True)  # [B, 1, 1024]
        global_rep = jnp.broadcast_to(global_feat, (xyz.shape[0], n, 1024))

        x = jnp.concatenate([local_n, global_rep], axis=-1)  # [B, N, 1344]
        x = nn.leaky_relu(bn("bn_p1")(nn.Dense(512, name="point_conv1")(x)), 0.2)
        x = nn.leaky_relu(bn("bn_p2")(nn.Dense(256, name="point_conv2")(x)), 0.2)
        return nn.Dense(self.num_classes, name="point_conv3")(x)


class DGCNNGlobal(nn.Module):
    """The classification-style DGCNN variant the reference's benchmark CSV
    row was produced with (Highway_bridge/models/model.py:372-482, k=64
    default; the committed CSV row uses k=32 -> 1,546,245 params): 4 EdgeConvs
    (64/64/64/128) -> Dense 320->1024 -> global [max|avg] pool (2048) ->
    Linear 512 -> 256 -> C, logits repeated per point."""

    num_classes: int = 5
    k: int = 64
    axis_name: Optional[str] = None
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        del features  # reference slices x[:, :3, :] (model.py:444-446)
        b, n, _ = xyz.shape
        k = min(self.k, n - 1)
        ax = self.axis_name

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=ax, name=name,
            )

        x1 = EdgeConv(64, k, ax, name="conv1")(xyz, train)
        x2 = EdgeConv(64, k, ax, name="conv2")(x1, train)
        x3 = EdgeConv(64, k, ax, name="conv3")(x2, train)
        x4 = EdgeConv(128, k, ax, name="conv4")(x3, train)
        x = jnp.concatenate([x1, x2, x3, x4], axis=-1)  # [B, N, 320]

        x = nn.Dense(1024, use_bias=False, name="conv5")(x)
        x = nn.leaky_relu(bn("bn5")(x), negative_slope=0.2)
        g = jnp.concatenate(
            [jnp.max(x, axis=1), jnp.mean(x, axis=1)], axis=-1
        )  # [B, 2048]

        g = nn.leaky_relu(
            bn("bn6")(nn.Dense(512, use_bias=False, name="linear1")(g)), 0.2
        )
        g = nn.Dropout(self.dropout_rate, deterministic=not train)(g)
        g = nn.leaky_relu(bn("bn7")(nn.Dense(256, name="linear2")(g)), 0.2)
        g = nn.Dropout(self.dropout_rate, deterministic=not train)(g)
        logits = nn.Dense(self.num_classes, name="linear3")(g)
        return jnp.broadcast_to(logits[:, None, :], (b, n, self.num_classes))
