"""PointNet segmentation models.

  - TNet(k): spatial/feature transform regressor
    (Highway_bridge/models/pointnet.py TNet; Partsize STN3d/STNkd).
  - PointNetSeg: the proper segmentation variant
    (Highway_bridge/models/pointnet.py:59-173): TNet(3) on xyz, concat with
    features, 64-d feature transform, per-point seg head over
    [point_feat 64 | global 1024] = 1088. Exact param parity: 3,536,526 at
    num_classes=5, feature_dim=3 (model_performance_comparison.csv:2).
  - PointNetGlobalSeg: the global-classification variant that repeats scene
    logits per point (models/model.py:301-369).
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn


class TNet(nn.Module):
    """Transform regressor: shared MLP (k->64->128->1024) -> max -> FC
    (512, 256) -> k*k + identity."""

    k: int = 3
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        # x: [B, N, k]
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        h = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        h = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(h)))
        h = nn.relu(bn("bn3")(nn.Dense(1024, name="conv3")(h)))
        g = jnp.max(h, axis=1)  # [B, 1024]
        g = nn.relu(bn("bn4")(nn.Dense(512, name="fc1")(g)))
        g = nn.relu(bn("bn5")(nn.Dense(256, name="fc2")(g)))
        mat = nn.Dense(self.k * self.k, name="fc3")(g)
        eye = jnp.eye(self.k, dtype=mat.dtype).reshape(1, -1)
        return (mat + eye).reshape(-1, self.k, self.k)


class PointNetSeg(nn.Module):
    """PointNet semantic segmentation (pointnet.py:59-173).

    apply(xyz [B,N,3], features [B,N,F]|None) -> logits [B,N,C]; when
    `return_transform` the 64-d feature-transform matrix is also returned for
    the ||I - AA^T|| regularizer.
    """

    num_classes: int = 5
    feature_transform: bool = True
    axis_name: Optional[str] = None
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
        return_transform: bool = False,
    ):
        if features is None:
            features = xyz

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        trans_in = TNet(3, self.axis_name, name="input_transform")(xyz, train)
        xyz_t = jnp.einsum("bnk,bkj->bnj", xyz, trans_in)
        x = jnp.concatenate([xyz_t, features], axis=-1)

        x = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        x = nn.relu(bn("bn2")(nn.Dense(64, name="conv2")(x)))

        trans_feat = None
        if self.feature_transform:
            trans_feat = TNet(64, self.axis_name, name="feature_transform")(
                x, train
            )
            x = jnp.einsum("bnk,bkj->bnj", x, trans_feat)
        point_feat = x  # [B, N, 64]

        x = nn.relu(bn("bn3")(nn.Dense(64, name="conv3")(x)))
        x = nn.relu(bn("bn4")(nn.Dense(128, name="conv4")(x)))
        x = nn.relu(bn("bn5")(nn.Dense(1024, name="conv5")(x)))
        global_feat = jnp.max(x, axis=1, keepdims=True)  # [B, 1, 1024]
        n = xyz.shape[1]
        global_rep = jnp.broadcast_to(
            global_feat, (x.shape[0], n, global_feat.shape[-1])
        )
        x = jnp.concatenate([point_feat, global_rep], axis=-1)  # [B, N, 1088]

        x = nn.relu(bn("bn_seg1")(nn.Dense(512, name="seg_conv1")(x)))
        x = nn.relu(bn("bn_seg2")(nn.Dense(256, name="seg_conv2")(x)))
        x = nn.relu(bn("bn_seg3")(nn.Dense(128, name="seg_conv3")(x)))
        x = nn.Dropout(self.dropout_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="seg_conv4")(x)
        if return_transform:
            return logits, trans_feat
        return logits


class PointNetGlobalSeg(nn.Module):
    """Global-classification PointNet that repeats scene logits per point
    (models/model.py:301-369; used as 'PointNet' in some trainers)."""

    num_classes: int = 5
    axis_name: Optional[str] = None
    dropout_rate: float = 0.3

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        if features is not None:
            pc = jnp.concatenate([xyz, features], axis=-1)
        else:
            pc = xyz
        trans = TNet(3, self.axis_name, name="stn")(pc[..., :3], train)
        x = jnp.einsum("bnk,bkj->bnj", pc[..., :3], trans)

        x = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        # shared two-layer refinement applied twice (model.py:326-331,349-350)
        mlp64_d0 = nn.Dense(64, name="mlp64_dense0")
        mlp64_bn = bn("mlp64_bn")
        mlp64_d1 = nn.Dense(64, name="mlp64_dense1")
        for _ in range(2):
            x = mlp64_d1(nn.relu(mlp64_bn(mlp64_d0(x))))
        x = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Dense(256, name="conv3")(x)))
        x = nn.relu(bn("bn4")(nn.Dense(512, name="conv4")(x)))
        x = nn.relu(bn("bn5")(nn.Dense(2048, name="conv5")(x)))
        g = jnp.max(x, axis=1)  # [B, 2048]
        g = nn.relu(bn("bn6")(nn.Dense(512, name="fc1")(g)))
        g = nn.relu(bn("bn7")(nn.Dense(256, name="fc2")(g)))
        g = nn.Dropout(self.dropout_rate, deterministic=not train)(g)
        logits = nn.Dense(self.num_classes, name="fc3")(g)
        n = xyz.shape[1]
        return jnp.broadcast_to(logits[:, None, :], (xyz.shape[0], n, self.num_classes))


class PointNetSemSegPartsize(nn.Module):
    """Partsize-identical/models/pointnet_sem_seg.py: 9-channel S3DIS-format
    PointNet segmentation.

    PointNetEncoder(global_feat=False, feature_transform=True, channel=9)
    (Partsize-identical/models/pointnet.py:101-150): the input T-Net (STN3d)
    consumes ALL 9 channels but emits a 3x3 applied to coordinates only; one
    9->64 conv; 64-d feature transform; [global 1024 | point 64] = 1088 ->
    512 -> 256 -> 128 -> C head (BN+ReLU on the first three).

    Design delta: returns logits [B, N, C] instead of the reference's
    log_softmax — the engine's cross-entropy on logits equals the reference's
    NLLLoss on log-probs. `return_transform=True` also yields the 64-d
    feature-transform matrix for the ||I - AA^T|| regularizer
    (pointnet_sem_seg.py:45-55, scale 0.001).
    """

    num_classes: int = 5
    with_rgb: bool = True  # 9 channels (xyz-centered, rgb, normalized xyz)
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
        return_transform: bool = False,
    ):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        if self.with_rgb and features is not None:
            pc = jnp.concatenate([xyz, features], axis=-1)  # [B, N, 9]
        else:
            pc = xyz  # [B, N, 3]

        # STN3d on all channels -> 3x3 applied to coordinates only
        trans = TNet(3, self.axis_name, name="stn")(pc, train)
        # TNet's first Dense consumes pc's full channel count; its output is
        # k*k with k=3 exactly as STN3d(channel=9) does.
        coords = jnp.einsum("bnk,bkj->bnj", pc[..., :3], trans)
        x = jnp.concatenate([coords, pc[..., 3:]], axis=-1)

        x = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        trans_feat = TNet(64, self.axis_name, name="fstn")(x, train)
        x = jnp.einsum("bnk,bkj->bnj", x, trans_feat)
        point_feat = x  # [B, N, 64]

        x = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(x)))
        x = bn("bn3")(nn.Dense(1024, name="conv3")(x))  # no relu (ref :138)
        g = jnp.max(x, axis=1, keepdims=True)  # [B, 1, 1024]
        g = jnp.broadcast_to(g, (x.shape[0], x.shape[1], 1024))
        h = jnp.concatenate([g, point_feat], axis=-1)  # [B, N, 1088]

        h = nn.relu(bn("bn_h1")(nn.Dense(512, name="head1")(h)))
        h = nn.relu(bn("bn_h2")(nn.Dense(256, name="head2")(h)))
        h = nn.relu(bn("bn_h3")(nn.Dense(128, name="head3")(h)))
        logits = nn.Dense(self.num_classes, name="head4")(h)
        if return_transform:
            return logits, trans_feat
        return logits
