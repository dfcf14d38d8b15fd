"""Older EnhancedPointNet2 variant (Highway_bridge/models/enhanced_pointnet2.py:11-98):
EnhancedPositionalEncoding + SSG PointNet++ stack.

The reference defines EnhancedAttention/Geometric/Boundary modules but the
forward comments them out (:70-86); `use_attention=True` here actually wires
them at each encoder level (capability superset of the dead code).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import (
    BoundaryAwareModule,
    EnhancedAttentionModule,
    EnhancedPositionalEncoding,
    GeometricFeatureExtraction,
)
from .common import FeaturePropagation, SegHead, SetAbstraction


class EnhancedPointNet2SSG(nn.Module):
    num_classes: int = 8
    pos_channels: int = 6
    use_attention: bool = False
    axis_name: Optional[str] = None
    sa_npoints: tuple = (1024, 256, 64)

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        if features is None:
            features = xyz
        pos_enc = EnhancedPositionalEncoding(
            self.pos_channels, axis_name=ax, name="pos_encoding"
        )(xyz, train)
        points = jnp.concatenate([features, pos_enc], axis=-1)

        n1, n2, n3 = self.sa_npoints
        l1_xyz, l1 = SetAbstraction(n1, 0.1, 32, (64, 64, 128), ax, name="sa1")(
            xyz, points, train
        )
        if self.use_attention:
            l1 = EnhancedAttentionModule(ax, name="attention1")(l1, train)
            l1 = GeometricFeatureExtraction(ax, name="geometric1")(l1, l1_xyz, train)
            l1 = BoundaryAwareModule(16, ax, name="boundary1")(l1, l1_xyz, train)
        l2_xyz, l2 = SetAbstraction(n2, 0.2, 32, (128, 128, 256), ax, name="sa2")(
            l1_xyz, l1, train
        )
        if self.use_attention:
            l2 = EnhancedAttentionModule(ax, name="attention2")(l2, train)
        l3_xyz, l3 = SetAbstraction(n3, 0.4, 32, (256, 256, 512), ax, name="sa3")(
            l2_xyz, l2, train
        )
        if self.use_attention:
            l3 = EnhancedAttentionModule(ax, name="attention3")(l3, train)

        l2 = FeaturePropagation((256, 256), ax, name="fp3")(
            l2_xyz, l3_xyz, l2, l3, train
        )
        l1 = FeaturePropagation((256, 128), ax, name="fp2")(
            l1_xyz, l2_xyz, l1, l2, train
        )
        l0 = FeaturePropagation((128, 128, 128), ax, name="fp1")(
            xyz, l1_xyz, None, l1, train
        )
        return SegHead(self.num_classes, 128, axis_name=ax, name="head")(l0, train)
