"""PointNet++ segmentation models (SSG and MSG variants).

Capability parity:
  - PointNet2 (SSG): Highway_bridge/models/model.py:12-56 — 3x SA
    (1024/256/64 pts, r=.1/.2/.4, k=32) -> 3x FP -> seg head.
  - PointNet2MSG (9ch Partsize): Partsize-identical/models/
    pointnet2_sem_seg_msg.py:7-42 — 4x MSG SA + 4x FP + small head; the
    reference returns log-probs, we return logits (losses take logits).
  - PointNet2SSGPartsize: Partsize-identical/models/pointnet2_sem_seg.py.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from .common import (
    FeaturePropagation,
    MultiScaleSetAbstractionMsg,
    SegHead,
    SetAbstraction,
)


class PointNet2SSG(nn.Module):
    """PointNet++ SSG semantic segmentation (reference model.py:12-56).

    apply(xyz [B,N,3], features [B,N,3] rgb) -> logits [B,N,num_classes].
    """

    num_classes: int = 5
    axis_name: Optional[str] = None
    sa_npoints: tuple = (1024, 256, 64)  # reference sizes; shrink for tests
    dropout_rate: float = 0.5
    compute_dtype: str = "float32"  # "bfloat16" doubles MXU throughput
    # models/pointnet2.py:10-62 variant keeps the raw input features as the
    # fp1 skip connection (model.py:12-56 passes None)
    fp1_use_features: bool = False
    # sequence parallelism over a named mesh axis (parallel/sp.py with
    # shard_inputs=False): inputs arrive FULL on every shard; FPS runs
    # replicated (sequential + latency-bound: concurrent identical runs
    # cost no extra wall time) while ball query / grouping / MLPs / pooling
    # / interpolation / head shard over the query-point axis, with
    # all_gathers between levels and on the final logits. Set axis_name to
    # include this axis for train-mode BN.
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        sp = self.sp_axis
        dt = jnp.dtype(self.compute_dtype) if self.compute_dtype else None
        n1, n2, n3 = self.sa_npoints
        l1_xyz, l1 = SetAbstraction(
            n1, 0.1, 32, (64, 64, 128), ax, dt, sp, name="sa1"
        )(xyz, features, train)
        l2_xyz, l2 = SetAbstraction(
            n2, 0.2, 32, (128, 128, 256), ax, dt, sp, name="sa2"
        )(l1_xyz, l1, train)
        l3_xyz, l3 = SetAbstraction(
            n3, 0.4, 32, (256, 256, 512), ax, dt, sp, name="sa3"
        )(l2_xyz, l2, train)

        l2 = FeaturePropagation((256, 256), ax, dt, sp, name="fp3")(
            l2_xyz, l3_xyz, l2, l3, train
        )
        l1 = FeaturePropagation((256, 128), ax, dt, sp, name="fp2")(
            l1_xyz, l2_xyz, l1, l2, train
        )
        fp1_skip = features if self.fp1_use_features else None
        # the last FP stays sharded through the pointwise head; logits are
        # gathered once at the end
        l0 = FeaturePropagation(
            (128, 128, 128), ax, dt, sp, sp_gather=False, name="fp1"
        )(xyz, l1_xyz, fp1_skip, l1, train)
        logits = SegHead(
            self.num_classes, 128, self.dropout_rate, axis_name=ax,
            dtype=dt, name="head",
        )(l0, train)
        if sp:
            logits = jax.lax.all_gather(logits, sp, axis=1, tiled=True)
        return logits


class PointNet2MSG(nn.Module):
    """Partsize 9-channel PointNet++ MSG seg model
    (Partsize-identical/models/pointnet2_sem_seg_msg.py:7-42).

    Input features are the S3DIS-style 9 channels [x_c, y_c, z, r, g, b,
    x_norm, y_norm, z_norm]; xyz is columns 0:3 of the block.
    """

    num_classes: int = 5
    dropout_rate: float = 0.5  # head drop1 (pointnet2_sem_seg_msg.py:21)
    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None  # see PointNet2SSG.sp_axis

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        sp = self.sp_axis
        l1_xyz, l1 = MultiScaleSetAbstractionMsg(
            1024, (0.05, 0.1), (16, 32),
            ((16, 16, 32), (32, 32, 64)), ax, sp, name="sa1",
        )(xyz, features, train)
        l2_xyz, l2 = MultiScaleSetAbstractionMsg(
            256, (0.1, 0.2), (16, 32),
            ((64, 64, 128), (64, 96, 128)), ax, sp, name="sa2",
        )(l1_xyz, l1, train)
        l3_xyz, l3 = MultiScaleSetAbstractionMsg(
            64, (0.2, 0.4), (16, 32),
            ((128, 196, 256), (128, 196, 256)), ax, sp, name="sa3",
        )(l2_xyz, l2, train)
        l4_xyz, l4 = MultiScaleSetAbstractionMsg(
            16, (0.4, 0.8), (16, 32),
            ((256, 256, 512), (256, 384, 512)), ax, sp, name="sa4",
        )(l3_xyz, l3, train)

        l3 = FeaturePropagation((256, 256), ax, sp_axis=sp, name="fp4")(
            l3_xyz, l4_xyz, l3, l4, train
        )
        l2 = FeaturePropagation((256, 256), ax, sp_axis=sp, name="fp3")(
            l2_xyz, l3_xyz, l2, l3, train
        )
        l1 = FeaturePropagation((256, 128), ax, sp_axis=sp, name="fp2")(
            l1_xyz, l2_xyz, l1, l2, train
        )
        l0 = FeaturePropagation(
            (128, 128, 128), ax, sp_axis=sp, sp_gather=False, name="fp1"
        )(xyz, l1_xyz, None, l1, train)
        logits = SegHead(
            self.num_classes, 128, self.dropout_rate, axis_name=ax,
            name="head",
        )(l0, train)
        if sp:
            logits = jax.lax.all_gather(logits, sp, axis=1, tiled=True)
        return logits
