"""DGCNN semantic segmentation (Highway_bridge/models/DGCNN.py:6-172).

4 EdgeConv stages over dynamic feature-space kNN graphs (k=20; graph rebuilt
from the CURRENT features each stage), multi-scale local concat (320ch) ->
1024 global -> [local|global]=1344 per-point head. Uses LeakyReLU(0.2) and
bias-free edge convs, matching the reference. Only xyz enters the network
(DGCNN.py:129-132 ignores extra features).
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn
from jax import lax

from ..ops import edge_conv_graph_feature, index_points, knn, knn_set


def _edgeconv_fast_default() -> bool:
    """The restructured EdgeConv (see EdgeConv docstring) avoids building the
    [B, N, k, 2C] graph tensor; it is a large HBM-traffic win on TPU. CPU
    keeps the literal formulation (bit-matches the reference oracle tests).
    PCB_EDGECONV_FAST=0/1 overrides."""
    flag = os.environ.get("PCB_EDGECONV_FAST")
    if flag is not None:
        return flag not in ("0", "false", "")
    return jax.default_backend() == "tpu"


class _MomentBN(nn.Module):
    """BatchNorm evaluated from precomputed batch moments.

    Variable layout is identical to nn.BatchNorm (params scale/bias,
    batch_stats mean/var with flax's momentum update and biased variance), so
    checkpoints are interchangeable with the literal EdgeConv path. Returns
    the per-channel affine (a, c) such that BN(h) = a * h + c.
    """

    momentum: float = 0.9
    epsilon: float = 1e-5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, mu, mean2, train: bool):
        f = mu.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (f,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (f,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((f,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((f,), jnp.float32)
        )
        if train:
            if self.axis_name is not None:
                mu = lax.pmean(mu, self.axis_name)
                mean2 = lax.pmean(mean2, self.axis_name)
            var = mean2 - mu * mu
            if not self.is_initializing():
                m = self.momentum
                ra_mean.value = m * ra_mean.value + (1.0 - m) * mu
                ra_var.value = m * ra_var.value + (1.0 - m) * var
        else:
            mu, var = ra_mean.value, ra_var.value
        a = scale * lax.rsqrt(var + self.epsilon)
        return a, bias - mu * a


class EdgeConv(nn.Module):
    """One EdgeConv: graph feature (x_j - x_i, x_i) -> Dense(no bias)+BN+
    LeakyReLU -> max over neighbors (reference DGCNN.py:72-109 + conv/bn).

    Design delta (TPU fast path, PCB_EDGECONV_FAST): the literal formulation
    materializes [B, N, k, 2C] edge features plus [B, N, k, F] activations
    (~600 MB of HBM traffic per stage at B=4, N=4096, k=20, C=64). Because
    Dense is linear and BN+LeakyReLU are per-channel monotone affine maps at
    pooling time, the same function is computed as
        y = x @ W_a, z = x @ (W_b - W_a)          (project BEFORE gathering)
        h_j = y_j + z_i                            (never materialized)
        max_j LeakyReLU(a h_j + c)
          = LeakyReLU(a * where(a > 0, max_j y_j, min_j y_j) + a z + c)
    BN batch moments of h are recovered exactly from neighbor sums of y and
    y^2 (the gathered [B, N, k, F] y is the only large tensor left, and XLA
    fuses its max/min/moment reductions into one read). Matches the literal
    path to ~1e-5 (matmul-split rounding); same parameter tree.
    """

    features: int
    k: int
    axis_name: Optional[str] = None
    # 0.95 matches the knn() default so PCB_EDGECONV_FAST toggles a PURE
    # algebraic restructure (same neighbor graph on both paths — advisor
    # round-2: bundling a looser 0.90 recall into the flag confounded
    # accuracy-debugging attribution). Relaxing to 0.90 halves the TPU top-k
    # aggregation cost; opt in per-model via this knob.
    recall_target: float = 0.95

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if not _edgeconv_fast_default():
            idx = knn(x, k=self.k, recall_target=self.recall_target)
            g = edge_conv_graph_feature(x, k=self.k, idx=idx)  # [B, N, k, 2C]
            h = nn.Dense(self.features, use_bias=False, name="conv")(g)
            h = nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name="bn",
            )(h)
            h = nn.leaky_relu(h, negative_slope=0.2)
            return jnp.max(h, axis=2)  # [B, N, features]

        # max-pooled consumer: the neighbor SET suffices — knn_set skips the
        # approx-top-k aggregation sort on TPU (same recall semantics)
        idx = knn_set(x, k=self.k, recall_target=self.recall_target)
        dense = nn.Dense(self.features, use_bias=False, name="conv")
        zeros = jnp.zeros_like(x)
        # W rows [0:C] act on (x_j - x_i), rows [C:2C] on x_i
        y = dense(jnp.concatenate([x, zeros], axis=-1))  # x @ W_a
        z = dense(jnp.concatenate([-x, x], axis=-1))  # x @ (W_b - W_a)
        yg = index_points(y, idx)  # [B, N, k, F]
        mx = jnp.max(yg, axis=2)
        mn = jnp.min(yg, axis=2)
        if train:
            s1 = jnp.mean(yg, axis=2)  # [B, N, F] mean_j y_j
            mu = jnp.mean(s1, axis=(0, 1)) + jnp.mean(z, axis=(0, 1))
            mean2 = (
                jnp.mean(yg * yg, axis=(0, 1, 2))
                + 2.0 * jnp.mean(z * s1, axis=(0, 1))
                + jnp.mean(z * z, axis=(0, 1))
            )
        else:
            mu = mean2 = jnp.zeros((self.features,), jnp.float32)
        a, c = _MomentBN(
            momentum=0.9, axis_name=self.axis_name, name="bn"
        )(mu, mean2, train)
        m = jnp.where(a > 0, mx, mn)
        return nn.leaky_relu(a * (m + z) + c, negative_slope=0.2)


class DGCNN(nn.Module):
    num_classes: int = 5
    k: int = 20
    axis_name: Optional[str] = None
    # explicit model-level relaxation (decoupled from PCB_EDGECONV_FAST so
    # the fast-path flag is a pure restructure — advisor round-2): graph
    # kNN at recall 0.90 halves the TPU top-k aggregation cost; set 0.95+
    # for strict-parity runs.
    graph_recall: float = 0.90

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

        rc = self.graph_recall
        x1 = EdgeConv(64, k, ax, rc, name="conv1")(xyz, train)
        x2 = EdgeConv(64, k, ax, rc, name="conv2")(x1, train)
        x3 = EdgeConv(64, k, ax, rc, name="conv3")(x2, train)
        x4 = EdgeConv(128, k, ax, rc, name="conv4")(x3, train)

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
    graph_recall: float = 0.90  # see DGCNN.graph_recall

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

        rc = self.graph_recall
        x1 = EdgeConv(64, k, ax, rc, name="conv1")(xyz, train)
        x2 = EdgeConv(64, k, ax, rc, name="conv2")(x1, train)
        x3 = EdgeConv(64, k, ax, rc, name="conv3")(x2, train)
        x4 = EdgeConv(128, k, ax, rc, name="conv4")(x3, train)
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
