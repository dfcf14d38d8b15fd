"""Attention & encoding modules for BriStruNet/EnhancedPointNet2
(Highway_bridge/models/attention_modules.py).

All modules are channel-last ([B, N, C]); the reference works in [B, C, N].
Documented behavioral deltas:
  - ColorFeatureExtraction: the reference gathers kNN neighbor color features
    and never uses them (attention_modules.py:736-743 dead code); omitted.
  - Structure features use the closed-form 3x3 eigensolver with the standard
    descending-eigenvalue convention (see ops/structure.py docstring).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import local_structure_features
from ..ops.structure import knn_relative_positions
from .common import sp_shard_slice


def _bn(train, axis_name, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, axis_name=axis_name, name=name
    )


class SinusoidalPositionalEncoding(nn.Module):
    """sin/cos frequency encoding of xyz -> linear projection
    (attention_modules.py:21-65). [B, N, 3] -> [B, N, channels]."""

    channels: int = 64
    freq_bands: int = 16

    @nn.compact
    def __call__(self, xyz: jax.Array) -> jax.Array:
        freqs = 2.0 ** jnp.linspace(0.0, self.freq_bands - 1, self.freq_bands)
        enc = []
        for f in freqs:
            enc.append(jnp.sin(xyz * f))
            enc.append(jnp.cos(xyz * f))
        enc = jnp.concatenate(enc, axis=-1)  # [B, N, 6*freq_bands]
        return nn.Dense(self.channels, name="proj")(enc)


class BridgeStructureEncoding(nn.Module):
    """Grid-quantized absolute sin/cos + kNN relative positions + 13-dim local
    structure stats -> per-neighbor MLP -> max over k
    (attention_modules.py:523-687). [B, N, 3] -> [B, N, channels]."""

    channels: int = 32
    k_neighbors: int = 16
    freq_bands: int = 4
    grid_size: float = 1.0
    axis_name: Optional[str] = None
    # sequence parallelism (parallel/sp.py shard_inputs=False): xyz arrives
    # FULL; the per-query work (kNN, structure stats, per-neighbor MLP, max)
    # runs on this shard's 1/P slice of the query axis. Exact: kNN rows of a
    # query slice equal the corresponding rows of the self-kNN. sp_gather
    # False leaves the output sharded for an enclosing sharded module.
    sp_axis: Optional[str] = None
    sp_gather: bool = True

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        n = xyz.shape[1]
        k = min(self.k_neighbors, n)
        q_xyz = sp_shard_slice(xyz, self.sp_axis) if self.sp_axis else xyz
        # absolute grid-quantized frequency encoding (:552-574)
        grid_xyz = jnp.floor(q_xyz / self.grid_size) * self.grid_size
        freqs = 2.0 ** jnp.linspace(0.0, self.freq_bands - 1, self.freq_bands)
        abs_enc = []
        for f in freqs:
            abs_enc.append(jnp.sin(grid_xyz * f))
            abs_enc.append(jnp.cos(grid_xyz * f))
        abs_enc = jnp.concatenate(abs_enc, axis=-1)  # [B, N, 6F]

        # recall 0.90 + ordered=False: the neighbors only feed
        # permutation-invariant statistics and a max-pooled MLP, so the SET
        # selection kernel (ops/grouping.py::knn_set) skips the approx-top-k
        # aggregation sort entirely on TPU.
        rel_pos, _ = knn_relative_positions(
            xyz, k, recall_target=0.90, ordered=False,
            query=q_xyz if self.sp_axis else None,
        )
        struct = local_structure_features(rel_pos)  # [B, N, 13]

        # The reference concatenates [abs_enc | rel_pos | struct] per neighbor
        # and applies one Dense (attention_modules.py:603-615). abs_enc and
        # struct are CONSTANT across the k neighbors, so we split that Dense
        # into a shared part on [B,N,·] plus a per-neighbor part on the 3-dim
        # rel_pos — mathematically identical (the Dense is linear; parameter
        # count unchanged) but the [B,N,k,·] matmul shrinks from
        # 6F+16 channels to 3, ~10x less compute and HBM traffic.
        shared_in = jnp.concatenate([abs_enc, struct], axis=-1)  # [B, N, 6F+13]
        shared = nn.Dense(self.channels, use_bias=False, name="mlp0_shared")(
            shared_in
        )
        per_neighbor = nn.Dense(self.channels, name="mlp0_rel")(rel_pos)
        h = shared[:, :, None, :] + per_neighbor  # [B, N, k, C]
        h = _bn(train, self.axis_name, "bn0")(h)
        h = nn.relu(h)
        h = nn.Dense(self.channels, name="mlp1")(h)
        out = jnp.max(h, axis=2)  # [B, N(/P), channels]
        if self.sp_axis and self.sp_gather:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return out


class EnhancedPositionalEncoding(nn.Module):
    """Relative frequency encoding + 22-dim covariance/PCA/curvature structure
    encoding (attention_modules.py:341-520). [B, N, 3] -> [B, N, channels]."""

    channels: int = 32
    freq_bands: int = 4
    k_neighbors: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz: jax.Array, train: bool = False) -> jax.Array:
        n = xyz.shape[1]
        k = min(self.k_neighbors, n)
        half = self.channels // 2
        # mean-pooled per-neighbor branch + statistics: set semantics suffice
        rel_pos, _ = knn_relative_positions(xyz, k, ordered=False)

        # relative branch (:380-404)
        dist = jnp.linalg.norm(rel_pos, axis=-1, keepdims=True)
        unit = rel_pos / (dist + 1e-8)
        freqs = 2.0 ** jnp.linspace(0.0, self.freq_bands - 1, self.freq_bands)
        enc = []
        for f in freqs:
            enc.append(jnp.sin(rel_pos * f))
            enc.append(jnp.cos(rel_pos * f))
        rel_feat = jnp.concatenate(enc + [dist, unit], axis=-1)
        h = nn.Dense(half, name="rel_mlp0")(rel_feat)
        h = _bn(train, self.axis_name, "rel_bn")(h)
        h = nn.Dense(half, name="rel_mlp1")(nn.relu(h))
        rel_encoding = jnp.mean(h, axis=2)  # [B, N, half]

        # structure branch (:406-482): 9 cov + 3 pca + 4 geom + 3 mean + 3 std
        kk = rel_pos.shape[2]
        cov = jnp.einsum("bnki,bnkj->bnij", rel_pos, rel_pos) / (kk - 1)
        cov_flat = cov.reshape(cov.shape[:2] + (9,))
        struct13 = local_structure_features(rel_pos)
        # map the 13-dim canonical stats onto the 22-dim layout
        pca = struct13[..., 0:3]
        center = jnp.mean(rel_pos, axis=2, keepdims=True)
        d_off = jnp.linalg.norm(rel_pos - center, axis=-1)
        local_radius = jnp.max(d_off, axis=-1)
        density = kk / (local_radius + 1e-8)
        sorted_d = jnp.sort(d_off, axis=-1)
        curvature = jnp.mean(sorted_d[..., 1:] - sorted_d[..., :-1], axis=-1)
        dir_consistency = struct13[..., 6]
        geom = jnp.stack([local_radius, density, curvature, dir_consistency], -1)
        mean = jnp.mean(rel_pos, axis=2)
        std = jnp.std(rel_pos, axis=2, ddof=1)
        struct22 = jnp.concatenate([cov_flat, pca, geom, mean, std], axis=-1)
        s = nn.Dense(half, name="struct_mlp0")(struct22)
        s = _bn(train, self.axis_name, "struct_bn")(s)
        s = nn.Dense(half, name="struct_mlp1")(nn.relu(s))

        return jnp.concatenate([rel_encoding, s], axis=-1)


class ColorFeatureExtraction(nn.Module):
    """Color MLP + channel attention + global context gate
    (attention_modules.py:690-753). [B, N, 3] -> [B, N, out_channels]."""

    out_channels: int = 32
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, colors: jax.Array, train: bool = False) -> jax.Array:
        h = nn.Dense(16, name="mlp0")(colors)
        h = nn.relu(_bn(train, self.axis_name, "bn0")(h))
        h = nn.Dense(self.out_channels, name="mlp1")(h)
        h = nn.relu(_bn(train, self.axis_name, "bn1")(h))

        a = nn.Dense(self.out_channels, name="attn0")(h)
        a = nn.relu(_bn(train, self.axis_name, "attn_bn")(a))
        a = nn.sigmoid(nn.Dense(self.out_channels, name="attn1")(a))
        enhanced = h * a

        ctx = jnp.mean(h, axis=1, keepdims=True)  # AdaptiveAvgPool1d(1)
        ctx = nn.relu(nn.Dense(self.out_channels // 2, name="ctx0")(ctx))
        ctx = nn.sigmoid(nn.Dense(self.out_channels, name="ctx1")(ctx))
        return enhanced * ctx


class CompositeFeatureFusion(nn.Module):
    """Concat + Dense+BN+ReLU (attention_modules.py:756-772)."""

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, spatial, color, train: bool = False):
        fused = jnp.concatenate([spatial, color], axis=-1)
        h = nn.Dense(self.out_channels, name="fusion")(fused)
        return nn.relu(_bn(train, self.axis_name, "bn")(h))


class GeometricFeatureExtraction(nn.Module):
    """Concat a 16-ch BridgeStructureEncoding of xyz, then 2-layer MLP
    (attention_modules.py:241-269). [B, N, C] -> [B, N, C].

    sp_axis: inputs arrive FULL; the inner BSE and the pointwise MLPs run on
    this shard's query slice, all_gathered back to full at the end."""

    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, x: jax.Array, xyz: jax.Array, train: bool = False):
        c = x.shape[-1]
        pos = BridgeStructureEncoding(
            16, axis_name=self.axis_name, sp_axis=self.sp_axis,
            sp_gather=False, name="br_pos",
        )(xyz, train)
        if self.sp_axis:
            x = sp_shard_slice(x, self.sp_axis)
        h = jnp.concatenate([x, pos], axis=-1)
        h = nn.Dense(c, name="mlp0")(h)
        h = nn.relu(_bn(train, self.axis_name, "bn0")(h))
        out = nn.Dense(c, name="mlp1")(h)
        if self.sp_axis:
            out = jax.lax.all_gather(out, self.sp_axis, axis=1, tiled=True)
        return out


class BoundaryAwareModule(nn.Module):
    """kNN feature-difference boundary attention
    (attention_modules.py:68-165). x [B, N, C], xyz [B, N, 3] -> [B, N, C]."""

    k: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, xyz, train: bool = False):
        from ..ops import index_points, knn

        c = x.shape[-1]
        idx = knn(xyz, k=min(self.k, xyz.shape[1]))
        knn_xyz = index_points(xyz, idx)
        rel = knn_xyz - xyz[:, :, None, :]
        rel_d = jnp.linalg.norm(rel, axis=-1, keepdims=True)
        spatial = jnp.concatenate(
            [jnp.mean(rel, axis=2), jnp.mean(rel_d, axis=2)], axis=-1
        )  # [B, N, 4]
        s = nn.Dense(32, name="spatial0")(spatial)
        s = nn.relu(_bn(train, self.axis_name, "spatial_bn")(s))
        s = nn.Dense(64, name="spatial1")(s)

        knn_feats = index_points(x, idx)  # [B, N, k, C]
        local_diff = knn_feats - x[:, :, None, :]
        boundary = jnp.concatenate([x, jnp.max(local_diff, axis=2)], axis=-1)
        b = nn.Dense(c, name="boundary0")(boundary)
        b = nn.relu(_bn(train, self.axis_name, "boundary_bn0")(b))
        b = nn.Dense(c, name="boundary1")(b)
        b = nn.relu(_bn(train, self.axis_name, "boundary_bn1")(b))

        a = nn.Dense(c // 2, name="attn0")(jnp.concatenate([x, s], axis=-1))
        a = nn.relu(_bn(train, self.axis_name, "attn_bn")(a))
        a = nn.sigmoid(nn.Dense(c, name="attn1")(a))
        return x + b * a


class StructuralAwareModule(nn.Module):
    """Global-context gated structure features (attention_modules.py:168-197)."""

    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        h = nn.Dense(c, name="struct0")(x)
        h = nn.relu(_bn(train, self.axis_name, "struct_bn")(h))
        h = nn.Dense(c, name="struct1")(h)
        ctx = jnp.max(x, axis=1, keepdims=True)
        ctx = nn.Dense(c // 4, name="ctx0")(ctx)
        ctx = nn.relu(_bn(train, self.axis_name, "ctx_bn")(ctx))
        ctx = nn.sigmoid(nn.Dense(c, name="ctx1")(ctx))
        return x + h * ctx


class EnhancedAttentionModule(nn.Module):
    """Channel + spatial attention (attention_modules.py:202-239)."""

    axis_name: Optional[str] = None
    dropout: float = 0.5

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        ca = jnp.mean(x, axis=1, keepdims=True)
        ca = nn.relu(nn.Dense(c // 4, name="ca0")(ca))
        ca = nn.Dropout(self.dropout, deterministic=not train)(ca)
        ca = nn.sigmoid(nn.Dense(c, name="ca1")(ca))
        x_ca = x * ca
        sa = nn.Dense(c // 4, name="sa0")(x_ca)
        sa = nn.relu(_bn(train, self.axis_name, "sa_bn")(sa))
        sa = nn.Dropout(self.dropout, deterministic=not train)(sa)
        sa = nn.sigmoid(nn.Dense(1, name="sa1")(sa))
        return x + x_ca * sa


class MultiScaleFeatureFusion(nn.Module):
    """Interpolate each feature map to N points (nearest, like the reference's
    default-mode F.interpolate, model.py:149-167), per-scale Dense+BN+ReLU,
    concat.

    sp_axis contract (sequence parallelism): the LAST entry of features_list
    is this shard's 1/P slice of the fine point axis (it comes from an
    sp_gather=False FP); earlier entries are FULL coarse maps, which are
    nearest-resized to the full fine length and then sliced — exact, because
    nearest resize maps each output row independently. The fused output
    stays SHARDED (the pointwise head consumes it; logits gather once at the
    model's end)."""

    out_channels: int = 128
    axis_name: Optional[str] = None
    sp_axis: Optional[str] = None

    @nn.compact
    def __call__(self, features_list, train: bool = False):
        n = features_list[-1].shape[1]
        if self.sp_axis:
            n = n * jax.lax.axis_size(self.sp_axis)  # full fine length
        outs = []
        last = len(features_list) - 1
        for i, feat in enumerate(features_list):
            pre_sharded = self.sp_axis is not None and i == last
            if not pre_sharded and feat.shape[1] != n:
                b, _, c = feat.shape
                feat = jax.image.resize(feat, (b, n, c), method="nearest")
            if self.sp_axis and not pre_sharded:
                feat = sp_shard_slice(feat, self.sp_axis)
            h = nn.Dense(self.out_channels, name=f"conv{i}")(feat)
            h = nn.relu(_bn(train, self.axis_name, f"bn{i}")(h))
            outs.append(h)
        return jnp.concatenate(outs, axis=-1)
