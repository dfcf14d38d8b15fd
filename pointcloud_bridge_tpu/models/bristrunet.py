"""BriStruNet / EnhancedPointNet2 — the reference's paper model
(Highway_bridge/models/model.py:58-147, input_ch=3 variant).

Pipeline: BridgeStructureEncoding(3ch) + ColorFeatureExtraction(6ch) ->
CompositeFeatureFusion(->3ch) -> 3x MultiScaleSetAbstraction (1024/512/128
pts, dual radii, shared mlp per scale) with GeometricFeatureExtraction at
l2/l3 -> 3x EnhancedFeaturePropagation -> MultiScaleFeatureFusion -> head.

The reference also defines a `cls_head` that the forward never uses
(model.py:101-112); omitted.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .attention import (
    BridgeStructureEncoding,
    ColorFeatureExtraction,
    CompositeFeatureFusion,
    GeometricFeatureExtraction,
    MultiScaleFeatureFusion,
)
from .common import EnhancedFeaturePropagation, MultiScaleSetAbstraction


class BriStruNet(nn.Module):
    """apply(xyz [B,N,3], features [B,N,3] rgb) -> logits [B,N,num_classes]."""

    num_classes: int = 5
    input_ch: int = 3
    axis_name: Optional[str] = None
    sa_npoints: tuple = (1024, 512, 128)  # reference sizes; shrink for tests
    dropout_rate: float = 0.5
    # sequence parallelism over a named mesh axis (parallel/sp.py with
    # shard_inputs=False): inputs arrive FULL on every shard; the per-query
    # hot path — BSE kNN/structure stats, MSA ball query/grouping/MLPs,
    # GFE, EnhancedFP interpolation/attention, MSFF, head — runs on 1/P
    # query slices with all_gathers between levels and one final logits
    # gather. FPS runs replicated (sequential + latency-bound). The cheap
    # pointwise color/fusion stages (3->32ch Dense gates, <2% of forward
    # FLOPs) stay replicated: sharding them would trade one collective for
    # no measurable compute. N and every sa_npoints entry must divide the
    # mesh axis. Set axis_name to include this axis for train-mode BN.
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        sp = self.sp_axis
        if features is None:
            features = xyz

        pos_enc = BridgeStructureEncoding(
            self.input_ch, 32, 4, axis_name=ax, sp_axis=sp, name="bri_enc"
        )(xyz, train)
        color = ColorFeatureExtraction(6, ax, name="color_encoder")(features, train)
        fused = CompositeFeatureFusion(self.input_ch, ax, name="feature_fusion")(
            pos_enc, color, train
        )  # [B, N, input_ch]

        n1, n2, n3 = self.sa_npoints
        l1_xyz, l1 = MultiScaleSetAbstraction(
            n1, (0.1, 0.2), (16, 32), (64, 64, 128), ax, sp, name="sa1"
        )(xyz, fused, train)  # [B, n1, 256]
        l2_xyz, l2 = MultiScaleSetAbstraction(
            n2, (0.2, 0.4), (16, 32), (128, 128, 256), ax, sp, name="sa2"
        )(l1_xyz, l1, train)  # [B, n2, 512]
        l2 = GeometricFeatureExtraction(ax, sp, name="geometric2")(
            l2, l2_xyz, train
        )
        l3_xyz, l3 = MultiScaleSetAbstraction(
            n3, (0.4, 0.8), (16, 32), (256, 256, 512), ax, sp, name="sa3"
        )(l2_xyz, l2, train)  # [B, n3, 1024]
        l3 = GeometricFeatureExtraction(ax, sp, name="geometric3")(
            l3, l3_xyz, train
        )

        l2 = EnhancedFeaturePropagation((1024, 256), ax, sp, name="fp3")(
            l2_xyz, l3_xyz, l2, l3, train
        )
        l1 = EnhancedFeaturePropagation((256, 256), ax, sp, name="fp2")(
            l1_xyz, l2_xyz, l1, l2, train
        )
        # fp1 output stays sharded through MSFF and the pointwise head;
        # logits gather once at the end
        l0 = EnhancedFeaturePropagation(
            (256, 128), ax, sp, sp_gather=False, name="fp1"
        )(xyz, l1_xyz, fused, l1, train)

        fused_ms = MultiScaleFeatureFusion(128, ax, sp, name="fusion")(
            [l2, l1, l0], train
        )  # [B, N(/P), 384]

        h = nn.Dense(128, name="final0")(fused_ms)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9, axis_name=ax,
            name="final_bn",
        )(h)
        h = nn.relu(h)
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        logits = nn.Dense(self.num_classes, name="final1")(h)
        if sp:
            logits = jax.lax.all_gather(logits, sp, axis=1, tiled=True)
        return logits
