"""RandLA-Net-style encoder/decoder segmentation model
(Highway_bridge/models/RandLANet.py:302-443).

Structure: fc_start(->8) -> 4x [random sampling (ratios .35/.25/.25/.25) +
LocalFeatureAggregation (2x LocalSpatialEncoding + 2x AttentivePooling +
DilatedResidualBlock, k=16)] with dims [16, 64, 128, 256] -> 4x upsampling
decoder. The reference upsamples with 1-D linear interpolation over the point
axis (RandLANet.py:284-287) — NOT 3-NN — reproduced here via jax.image.resize
(half-pixel centers == align_corners=False).

Random sampling uses a jax PRNG key threaded through apply via the 'sampling'
rng collection (train) or a deterministic arange subset (eval) — the
reference uses unseeded torch.randperm; parity is distributional.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import index_points, knn
from ..ops.grouping import knn_stat_weighted
from ..ops.sampling import random_sample_indices


class LocalSpatialEncoding(nn.Module):
    """Relative pos + dist (+ neighbor feats) -> Dense(no bias)+BN+ReLU
    (RandLANet.py:77-132). Output [B, N, k, out]."""

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, neighbors_idx, train: bool = False):
        neighbors_xyz = index_points(xyz, neighbors_idx)  # [B, N, k, 3]
        rel = neighbors_xyz - xyz[:, :, None, :]
        dist = jnp.linalg.norm(rel, axis=-1, keepdims=True)
        enc = jnp.concatenate([rel, dist], axis=-1)  # [B, N, k, 4]
        if features is not None:
            nf = index_points(features, neighbors_idx)
            enc = jnp.concatenate([enc, nf], axis=-1)
        h = nn.Dense(self.out_channels, use_bias=False, name="mlp")(enc)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="bn",
        )(h)
        return nn.relu(h)


class AttentivePooling(nn.Module):
    """Softmax attention over neighbors -> weighted sum -> Dense+BN+ReLU
    (RandLANet.py:136-168). In [B, N, k, C] -> out [B, N, out]."""

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        c = x.shape[-1]
        s = nn.Dense(c, use_bias=False, name="score0")(x)
        s = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="score_bn",
        )(s)
        s = nn.Dense(1, name="score1")(nn.relu(s))  # [B, N, k, 1]
        scores = jax.nn.softmax(s, axis=2)
        pooled = jnp.sum(x * scores, axis=2)  # [B, N, C]
        h = nn.Dense(self.out_channels, use_bias=False, name="mlp")(pooled)
        h = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="mlp_bn",
        )(h)
        return nn.relu(h)


class DilatedResidualBlock(nn.Module):
    """Two 1x1 convs + shortcut (RandLANet.py:172-203)."""

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        shortcut = x
        if x.shape[-1] != self.out_channels:
            shortcut = bn("sc_bn")(
                nn.Dense(self.out_channels, use_bias=False, name="sc")(x)
            )
        h = nn.relu(bn("bn1")(nn.Dense(self.out_channels, use_bias=False, name="mlp1")(x)))
        h = bn("bn2")(nn.Dense(self.out_channels, use_bias=False, name="mlp2")(h))
        return nn.relu(h + shortcut)


class LocalFeatureAggregation(nn.Module):
    """2x (LSE + AttentivePooling) + DRB, k=16 (RandLANet.py:206-258)."""

    out_channels: int
    k: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        half = self.out_channels // 2
        idx = knn(xyz, k=min(self.k, xyz.shape[1]))
        f1 = LocalSpatialEncoding(half, self.axis_name, name="lse1")(
            xyz, features, idx, train
        )
        a1 = AttentivePooling(half, self.axis_name, name="ap1")(f1, train)
        f2 = LocalSpatialEncoding(half, self.axis_name, name="lse2")(
            xyz, features, idx, train
        )
        a2 = AttentivePooling(half, self.axis_name, name="ap2")(f2, train)
        agg = jnp.concatenate([a1, a2], axis=-1)
        return DilatedResidualBlock(self.out_channels, self.axis_name, name="drb")(
            agg, train
        )


def _linear_upsample(x: jax.Array, n_out: int) -> jax.Array:
    """1-D linear interpolation over the point axis of [B, N, C]
    (torch F.interpolate(mode='linear', align_corners=False) equivalent)."""
    b, n, c = x.shape
    if n == n_out:
        return x
    return jax.image.resize(x, (b, n_out, c), method="linear")


class RandLANet(nn.Module):
    num_classes: int = 5
    d_in: int = 3
    k: int = 16
    encoder_dims: Sequence[int] = (16, 64, 128, 256)
    decoder_dims: Sequence[int] = (256, 128, 64, 32)
    sampling_ratios: Sequence[float] = (0.35, 0.25, 0.25, 0.25)
    sampling: str = "random"  # "density" = RandLANet_ss density-weighted mode
    axis_name: Optional[str] = None
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        b, n, _ = xyz.shape
        if features is None:
            inp = xyz[..., : self.d_in]
        else:
            inp = jnp.concatenate([xyz, features], axis=-1)[..., : self.d_in]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        x = nn.relu(bn("bn_start")(nn.Dense(8, name="fc_start")(inp)))

        enc_xyz = [xyz]
        enc_feats = [x]
        cur_n = n
        for i, dim in enumerate(self.encoder_dims):
            s = max(1, int(cur_n * self.sampling_ratios[i]))
            if train and self.has_rng("sampling"):
                key = self.make_rng("sampling")
                if self.sampling == "density":
                    from ..ops.sampling import density_weighted_sample_indices

                    idx = density_weighted_sample_indices(key, enc_xyz[-1], s)
                else:
                    idx = random_sample_indices(key, cur_n, s, b)
            else:
                # deterministic stride subset at eval
                stride = max(1, cur_n // s)
                idx = jnp.tile(
                    (jnp.arange(s) * stride % cur_n)[None, :], (b, 1)
                ).astype(jnp.int32)
            xyz_d = index_points(enc_xyz[-1], idx)
            feat_d = index_points(enc_feats[-1], idx)
            agg = LocalFeatureAggregation(
                dim, self.k, self.axis_name, name=f"lfa{i}"
            )(xyz_d, feat_d, train)
            enc_xyz.append(xyz_d)
            enc_feats.append(agg)
            cur_n = s

        dec = enc_feats[-1]
        for i, dim in enumerate(self.decoder_dims):
            xyz_skip = enc_xyz[-(i + 2)]
            feat_skip = enc_feats[-(i + 2)]
            up = _linear_upsample(dec, xyz_skip.shape[1])
            cat = jnp.concatenate([up, feat_skip], axis=-1)
            h = nn.relu(
                bn(f"up{i}_bn1")(nn.Dense(dim, use_bias=False, name=f"up{i}_d1")(cat))
            )
            dec = nn.relu(
                bn(f"up{i}_bn2")(nn.Dense(dim, use_bias=False, name=f"up{i}_d2")(h))
            )

        h = nn.relu(bn("head_bn")(nn.Dense(64, use_bias=False, name="head_d0")(dec)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="head_d1")(h)


class LocalFeatureAggregationSS(nn.Module):
    """RandLANet_ss's single shared-MLP LFA
    (Highway_bridge/models/RandLANet_ss.py:121-163): statistically re-weighted
    kNN, concat [center feats | feature diffs | centered xyz] (2C+3 channels),
    3-layer Dense(no bias)+BN+ReLU MLP (out/2, out/2, out), max over k.

    The reference also constructs an AttentivePooling member that its forward
    never calls (RandLANet_ss.py:138,163) — omitted (dead code)."""

    out_channels: int
    k: int = 16
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, xyz, features, train: bool = False):
        idx = knn_stat_weighted(xyz, k=min(self.k, xyz.shape[1]))
        neighbors_xyz = index_points(xyz, idx)
        xyz_centered = neighbors_xyz - xyz[:, :, None, :]
        if features is not None:
            nf = index_points(features, idx)
            f_centered = nf - features[:, :, None, :]
            center = jnp.broadcast_to(features[:, :, None, :], nf.shape)
            h = jnp.concatenate([center, f_centered, xyz_centered], axis=-1)
        else:
            h = xyz_centered

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        half = self.out_channels // 2
        h = nn.relu(bn("bn0")(nn.Dense(half, use_bias=False, name="mlp0")(h)))
        h = nn.relu(bn("bn1")(nn.Dense(half, use_bias=False, name="mlp1")(h)))
        h = nn.relu(
            bn("bn2")(nn.Dense(self.out_channels, use_bias=False, name="mlp2")(h))
        )
        return jnp.max(h, axis=2)  # [B, N, out]


class RandLANetSS(nn.Module):
    """The RandLANet_ss variant architecture (RandLANet_ss.py:210-322):
    density-weighted random sampling (ratio 0.25 each layer), per-layer
    dynamic k = max(min(16, 16//(i+1)), 4), single shared-MLP LFA, decoder
    dims [128, 64, 32, 32] with linear-interpolation upsampling."""

    num_classes: int = 5
    d_in: int = 3
    encoder_dims: Sequence[int] = (16, 64, 128, 256)
    decoder_dims: Sequence[int] = (128, 64, 32, 32)
    sampling_ratios: Sequence[float] = (0.25, 0.25, 0.25, 0.25)
    axis_name: Optional[str] = None
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        b, n, _ = xyz.shape
        if features is None:
            inp = xyz[..., : self.d_in]
        else:
            inp = jnp.concatenate([xyz, features], axis=-1)[..., : self.d_in]

        def bn(name):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.9,
                axis_name=self.axis_name, name=name,
            )

        x = nn.relu(bn("bn_start")(nn.Dense(8, name="fc_start")(inp)))

        enc_xyz = [xyz]
        enc_feats = [x]
        cur_n = n
        for i, dim in enumerate(self.encoder_dims):
            s = max(1, int(cur_n * self.sampling_ratios[i]))
            k_i = max(min(16, 16 // (i + 1)), 4)  # RandLANet_ss.py:227
            if train and self.has_rng("sampling"):
                from ..ops.sampling import density_weighted_sample_indices

                key = self.make_rng("sampling")
                idx = density_weighted_sample_indices(key, enc_xyz[-1], s)
            else:
                stride = max(1, cur_n // s)
                idx = jnp.tile(
                    (jnp.arange(s) * stride % cur_n)[None, :], (b, 1)
                ).astype(jnp.int32)
            xyz_d = index_points(enc_xyz[-1], idx)
            feat_d = index_points(enc_feats[-1], idx)
            agg = LocalFeatureAggregationSS(
                dim, k_i, self.axis_name, name=f"lfa{i}"
            )(xyz_d, feat_d, train)
            enc_xyz.append(xyz_d)
            enc_feats.append(agg)
            cur_n = s

        dec = enc_feats[-1]
        for i, dim in enumerate(self.decoder_dims):
            xyz_skip = enc_xyz[-(i + 2)]
            feat_skip = enc_feats[-(i + 2)]
            up = _linear_upsample(dec, xyz_skip.shape[1])
            cat = jnp.concatenate([up, feat_skip], axis=-1)
            h = nn.relu(
                bn(f"up{i}_bn1")(nn.Dense(dim, use_bias=False, name=f"up{i}_d1")(cat))
            )
            dec = nn.relu(
                bn(f"up{i}_bn2")(nn.Dense(dim, use_bias=False, name=f"up{i}_d2")(h))
            )

        h = nn.relu(bn("head_bn")(nn.Dense(64, use_bias=False, name="head_d0")(dec)))
        h = nn.Dropout(self.dropout_rate, deterministic=not train)(h)
        return nn.Dense(self.num_classes, name="head_d1")(h)
