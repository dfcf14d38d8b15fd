"""Shared flax building blocks for the model zoo.

The reference's per-point Conv1d/Conv2d(kernel=1)+BatchNorm+ReLU stacks
(e.g. Highway_bridge/models/pointnet2_utils.py:115-156) are Dense layers over
the trailing channel axis here — identical math, and XLA maps them onto the
MXU as batched matmuls without layout shuffles.

BatchNorm semantics match the reference (normalize over every axis except
channels, i.e. over B·N(·K)); under data-parallel training pass `axis_name`
so statistics sync across the mesh (SURVEY.md §7 hard part #4).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    group_points,
    three_nn_interpolate,
)


class SharedMLP(nn.Module):
    """Stack of per-point Dense(+BN+ReLU) layers over the last axis.

    `dtype` sets the computation dtype (params stay f32): bfloat16 doubles
    MXU throughput on TPU; BatchNorm statistics are computed in f32 by flax.
    """

    features: Sequence[int]
    use_bn: bool = True
    last_activation: bool = True
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        n = len(self.features)
        if self.dtype is not None:
            x = x.astype(self.dtype)
        for i, f in enumerate(self.features):
            x = nn.Dense(f, dtype=self.dtype, name=f"dense_{i}")(x)
            last = i == n - 1
            if self.use_bn:
                x = nn.BatchNorm(
                    use_running_average=not train,
                    momentum=0.9,  # torch BatchNorm default (momentum=0.1)
                    axis_name=self.axis_name,
                    name=f"bn_{i}",
                )(x)
            if self.last_activation or not last:
                x = nn.relu(x)
        return x


def sp_shard_slice(t: jax.Array, axis_name: str) -> jax.Array:
    """This shard's contiguous block of t's axis 1 under a named mesh axis
    (sequence parallelism for neighborhood models: the query/point axis is
    split into P equal contiguous slices in axis-index order, so
    all_gather(..., axis=1, tiled=True) reconstructs the full axis)."""
    p = jax.lax.axis_size(axis_name)
    n = t.shape[1]
    if n % p:
        raise ValueError(
            f"sequence-parallel axis of length {n} must divide the mesh "
            f"axis size {p}"
        )
    s = n // p
    return jax.lax.dynamic_slice_in_dim(
        t, jax.lax.axis_index(axis_name) * s, s, axis=1
    )


class SetAbstraction(nn.Module):
    """PointNet++ single-scale set abstraction.

    Mirrors Highway_bridge/models/pointnet2_utils.py:115-156: FPS -> ball query
    -> center-relative concat -> shared MLP -> max over neighbors.
    Channel-last: features [B, N, C] -> ([B, npoint, 3], [B, npoint, mlp[-1]]).

    sp_axis (sequence parallelism, parallel/sp.py): inputs arrive FULL
    (replicated across the mesh axis); FPS runs replicated — it is a
    sequential global selection, and every device running the same
    latency-bound kernel concurrently costs no extra wall time — while the
    hot per-query work (ball query, neighbor grouping, shared MLP, pooling)
    runs on this shard's 1/P slice of the query axis; outputs are
    all_gathered back to full. Exact by construction: the sharded program
    computes the same per-query math on a partition of the queries. BN
    moments span the global query axis via axis_name (set it to include
    sp_axis when training).
    """

    npoint: int
    radius: float
    nsample: int
    mlp: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        q_xyz = sp_shard_slice(new_xyz, self.sp_axis) if self.sp_axis else new_xyz
        idx = query_ball_point(self.radius, self.nsample, xyz, q_xyz)
        grouped = group_points(xyz, q_xyz, idx, features)  # [B,S,K,3+C]
        out = SharedMLP(
            self.mlp, axis_name=self.axis_name, dtype=self.dtype, name="mlp"
        )(grouped, train=train)
        pooled = jnp.max(out, axis=2)
        if self.sp_axis:
            pooled = jax.lax.all_gather(
                pooled, self.sp_axis, axis=1, tiled=True
            )
        return new_xyz, pooled


class MultiScaleSetAbstraction(nn.Module):
    """PointNet++ MSG set abstraction (pointnet2_utils.py:302-360).

    One FPS; per-radius ball query + shared MLP + max-pool; concat over scales.
    Note the reference applies the SAME `mlp` width list to every scale and
    concatenates, so the output width is len(radius_list) * mlp[-1].
    """

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp: Sequence[int]
    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None  # same contract as SetAbstraction.sp_axis

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        q_xyz = sp_shard_slice(new_xyz, self.sp_axis) if self.sp_axis else new_xyz
        scale_feats = []
        for i, (radius, nsample) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            idx = query_ball_point(radius, nsample, xyz, q_xyz)
            grouped = group_points(xyz, q_xyz, idx, features)
            out = SharedMLP(self.mlp, axis_name=self.axis_name, name=f"mlp_{i}")(
                grouped, train=train
            )
            scale_feats.append(jnp.max(out, axis=2))
        out = jnp.concatenate(scale_feats, axis=-1)
        if self.sp_axis:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return new_xyz, out


class MultiScaleSetAbstractionMsg(nn.Module):
    """Partsize-style MSG SA with a DIFFERENT mlp per scale
    (Partsize-identical/models/pointnet_util.py:222-284)."""

    npoint: int
    radius_list: Sequence[float]
    nsample_list: Sequence[int]
    mlp_list: Sequence[Sequence[int]]
    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None  # same contract as SetAbstraction.sp_axis

    @nn.compact
    def __call__(
        self,
        xyz: jax.Array,
        features: Optional[jax.Array],
        train: bool = False,
    ) -> Tuple[jax.Array, jax.Array]:
        fps_idx = farthest_point_sample(xyz, self.npoint)
        new_xyz = index_points(xyz, fps_idx)
        q_xyz = sp_shard_slice(new_xyz, self.sp_axis) if self.sp_axis else new_xyz
        scale_feats = []
        for i, (radius, nsample) in enumerate(
            zip(self.radius_list, self.nsample_list)
        ):
            idx = query_ball_point(radius, nsample, xyz, q_xyz)
            grouped = group_points(xyz, q_xyz, idx, features)
            out = SharedMLP(
                self.mlp_list[i], axis_name=self.axis_name, name=f"mlp_{i}"
            )(grouped, train=train)
            scale_feats.append(jnp.max(out, axis=2))
        out = jnp.concatenate(scale_feats, axis=-1)
        if self.sp_axis:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return new_xyz, out


class FeaturePropagation(nn.Module):
    """PointNet++ decoder FP layer (pointnet2_utils.py:159-211).

    3-NN inverse-distance interpolation of coarse features onto fine points,
    concat with fine skip features, shared MLP.
    """

    mlp: Sequence[int]
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None
    # sequence parallelism: slice the FINE (target) point axis to this
    # shard's 1/P block; sources stay full. sp_gather=False leaves the
    # output sharded (the last FP feeds a pointwise head that can stay
    # sharded until the final logits all_gather).
    sp_axis: Optional[str] = None
    sp_gather: bool = True

    @nn.compact
    def __call__(
        self,
        xyz_fine: jax.Array,
        xyz_coarse: jax.Array,
        feats_fine: Optional[jax.Array],
        feats_coarse: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        if self.sp_axis:
            xyz_fine = sp_shard_slice(xyz_fine, self.sp_axis)
            if feats_fine is not None:
                feats_fine = sp_shard_slice(feats_fine, self.sp_axis)
        interp = three_nn_interpolate(
            xyz_fine, xyz_coarse, feats_coarse.astype(jnp.float32), k=3
        )
        if feats_fine is not None:
            interp = jnp.concatenate(
                [feats_fine.astype(jnp.float32), interp], axis=-1
            )
        out = SharedMLP(
            self.mlp, axis_name=self.axis_name, dtype=self.dtype, name="mlp"
        )(interp, train=train)
        if self.sp_axis and self.sp_gather:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return out


class EnhancedFeaturePropagation(nn.Module):
    """Attention/boundary-augmented FP (pointnet2_utils.py:214-298).

    4-NN interpolation; channel attention gate on the fused features; xyz-driven
    boundary MLP added residually; skip connection when widths line up.

    sp_axis / sp_gather: same contract as FeaturePropagation — slice the
    FINE (target) axis to this shard's 1/P block; coarse sources stay full;
    every stage below (interp, attention gate, MLPs, boundary MLP, residual)
    is per-fine-point.
    """

    mlp: Sequence[int]
    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None
    sp_gather: bool = True

    @nn.compact
    def __call__(
        self,
        xyz_fine: jax.Array,
        xyz_coarse: jax.Array,
        feats_fine: Optional[jax.Array],
        feats_coarse: jax.Array,
        train: bool = False,
    ) -> jax.Array:
        if self.sp_axis:
            xyz_fine = sp_shard_slice(xyz_fine, self.sp_axis)
            if feats_fine is not None:
                feats_fine = sp_shard_slice(feats_fine, self.sp_axis)
        interp = three_nn_interpolate(xyz_fine, xyz_coarse, feats_coarse, k=4)
        if feats_fine is not None:
            fused = jnp.concatenate([feats_fine, interp], axis=-1)
        else:
            fused = interp
        in_ch = fused.shape[-1]

        # channel attention (Conv1d/BN/ReLU/Conv1d/Sigmoid in the reference)
        attn = nn.Dense(in_ch // 4, name="attn_dense0")(fused)
        attn = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="attn_bn",
        )(attn)
        attn = nn.relu(attn)
        attn = nn.sigmoid(nn.Dense(in_ch, name="attn_dense1")(attn))
        fused = fused * attn

        identity = fused
        out = SharedMLP(self.mlp, axis_name=self.axis_name, name="mlp")(
            fused, train=train
        )
        if in_ch == self.mlp[-1]:
            out = out + identity

        boundary = SharedMLP(
            (16,), axis_name=self.axis_name, name="boundary_mlp0"
        )(xyz_fine, train=train)
        boundary = nn.Dense(self.mlp[-1], name="boundary_dense1")(boundary)
        out = out + boundary
        if self.sp_axis and self.sp_gather:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return out


class SegHead(nn.Module):
    """Per-point classification head: Dense+BN+ReLU+Dropout+Dense
    (model.py:27-30 / :52-55)."""

    num_classes: int
    hidden: int = 128
    dropout: float = 0.5
    axis_name: Optional[str] = None
    dtype: Optional[jnp.dtype] = None

    @nn.compact
    def __call__(self, x: jax.Array, train: bool = False) -> jax.Array:
        if self.dtype is not None:
            x = x.astype(self.dtype)
        x = nn.Dense(self.hidden, dtype=self.dtype, name="dense0")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="bn0",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        # logits in f32 for numerically stable losses
        return nn.Dense(self.num_classes, dtype=jnp.float32, name="dense1")(
            x.astype(jnp.float32)
        )
