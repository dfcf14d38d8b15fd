"""Classification & Partsize segmentation extras
(Partsize-identical/models/: pointnet2_cls_ssg.py, pointnet2_cls_msg.py,
pointnet_cls.py, pointnet2_sem_seg.py — SURVEY.md §2.2 'Partsize extras').

Classification models return per-cloud logits [B, num_classes] (the reference
returns log-probs; losses here take logits).
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import (
    MultiScaleSetAbstractionMsg,
    SegHead,
    SetAbstraction,
    SharedMLP,
    FeaturePropagation,
)
from .pointnet import TNet


class GroupAllAbstraction(nn.Module):
    """group_all=True SA: one group containing every point
    (Partsize pointnet_util.py PointNetSetAbstraction group_all path)."""

    mlp: Sequence[int]
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        if features is not None:
            grouped = jnp.concatenate([xyz, features], axis=-1)
        else:
            grouped = xyz
        out = SharedMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            grouped[:, None], train=train
        )  # [B, 1, N, C]
        return jnp.max(out, axis=2)[:, 0]  # [B, C]


class PointNet2ClsSSG(nn.Module):
    """pointnet2_cls_ssg.get_model: SA(512,.2,32)+SA(128,.4,64)+group_all ->
    FC head."""

    num_classes: int = 5
    axis_name: Optional[str] = None
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        ax = self.axis_name
        l1_xyz, l1 = SetAbstraction(512, 0.2, 32, (64, 64, 128), ax, name="sa1")(
            xyz, features, train
        )
        l2_xyz, l2 = SetAbstraction(128, 0.4, 64, (128, 128, 256), ax, name="sa2")(
            l1_xyz, l1, train
        )
        g = GroupAllAbstraction((256, 512, 1024), ax, name="sa3")(l2_xyz, l2, train)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, axis_name=ax, name=name
            )

        h = nn.relu(bn("bn1")(nn.Dense(512, name="fc1")(g)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(bn("bn2")(nn.Dense(256, name="fc2")(h)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="fc3")(h)


class PointNet2ClsMSG(nn.Module):
    """pointnet2_cls_msg.get_model: 2x MSG SA + group_all -> FC head."""

    num_classes: int = 5
    axis_name: Optional[str] = None
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False):
        ax = self.axis_name
        l1_xyz, l1 = MultiScaleSetAbstractionMsg(
            512, (0.1, 0.2, 0.4), (16, 32, 128),
            ((32, 32, 64), (64, 64, 128), (64, 96, 128)), ax, name="sa1",
        )(xyz, features, train)
        l2_xyz, l2 = MultiScaleSetAbstractionMsg(
            128, (0.2, 0.4, 0.8), (32, 64, 128),
            ((64, 64, 128), (128, 128, 256), (128, 128, 256)), ax, name="sa2",
        )(l1_xyz, l1, train)
        g = GroupAllAbstraction((256, 512, 1024), ax, name="sa3")(l2_xyz, l2, train)

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, axis_name=ax, name=name
            )

        h = nn.relu(bn("bn1")(nn.Dense(512, name="fc1")(g)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(bn("bn2")(nn.Dense(256, name="fc2")(h)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="fc3")(h)


class PointNetCls(nn.Module):
    """pointnet_cls.get_model: TNet + shared MLP encoder -> global max ->
    FC head (with 64-d feature transform)."""

    num_classes: int = 5
    feature_transform: bool = True
    axis_name: Optional[str] = None
    dropout_rate: float = 0.4

    @nn.compact
    def __call__(self, xyz, features=None, train: bool = False,
                 return_transform: bool = False):
        ax = self.axis_name

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9, axis_name=ax, name=name
            )

        trans = TNet(3, ax, name="stn")(xyz, train)
        x = jnp.einsum("bnk,bkj->bnj", xyz, trans)
        if features is not None:
            x = jnp.concatenate([x, features], axis=-1)
        x = nn.relu(bn("bn1")(nn.Dense(64, name="conv1")(x)))
        trans_feat = None
        if self.feature_transform:
            trans_feat = TNet(64, ax, name="fstn")(x, train)
            x = jnp.einsum("bnk,bkj->bnj", x, trans_feat)
        x = nn.relu(bn("bn2")(nn.Dense(128, name="conv2")(x)))
        x = nn.relu(bn("bn3")(nn.Dense(1024, name="conv3")(x)))
        g = jnp.max(x, axis=1)
        h = nn.relu(bn("bn4")(nn.Dense(512, name="fc1")(g)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        h = nn.relu(bn("bn5")(nn.Dense(256, name="fc2")(h)))
        logits = nn.Dense(self.num_classes, name="fc3")(h)
        if return_transform:
            return logits, trans_feat
        return logits


class PointNet2SSGPartsize(nn.Module):
    """Partsize pointnet2_sem_seg.get_model: 4x SSG SA + 4x FP on 9-channel
    input (pointnet2_sem_seg.py:7-47)."""

    num_classes: int = 5
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        ax = self.axis_name
        l1_xyz, l1 = SetAbstraction(1024, 0.1, 32, (32, 32, 64), ax, name="sa1")(
            xyz, features, train
        )
        l2_xyz, l2 = SetAbstraction(256, 0.2, 32, (64, 64, 128), ax, name="sa2")(
            l1_xyz, l1, train
        )
        l3_xyz, l3 = SetAbstraction(64, 0.4, 32, (128, 128, 256), ax, name="sa3")(
            l2_xyz, l2, train
        )
        l4_xyz, l4 = SetAbstraction(16, 0.8, 32, (256, 256, 512), ax, name="sa4")(
            l3_xyz, l3, train
        )
        l3 = FeaturePropagation((256, 256), ax, name="fp4")(l3_xyz, l4_xyz, l3, l4, train)
        l2 = FeaturePropagation((256, 256), ax, name="fp3")(l2_xyz, l3_xyz, l2, l3, train)
        l1 = FeaturePropagation((256, 128), ax, name="fp2")(l1_xyz, l2_xyz, l1, l2, train)
        l0 = FeaturePropagation((128, 128, 128), ax, name="fp1")(xyz, l1_xyz, None, l1, train)
        return SegHead(self.num_classes, 128, axis_name=ax, name="head")(l0, train)
