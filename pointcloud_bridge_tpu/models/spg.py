"""Superpoint Graph model (Highway_bridge/models/spg.py:8-840), TPU-native.

Capability parity with the reference pipeline: point encoder -> k-means-style
superpoint partition -> per-superpoint statistical pooling -> superpoint graph
with 18-dim edge features -> 3x gated/attentive graph convolutions + 2x top-k
hierarchical pooling -> context-aware global pooling -> classifier ->
propagation back to points.

TPU-first deltas (the reference deliberately uses per-node Python loops,
spg.py:485-557):
  - the partition is batched k-means (argmin over a cdist matrix + one-hot
    matmul centroid updates) seeded by FPS instead of randperm (deterministic);
  - superpoint stats are EXACT, including the reference's index-based
    median/quartile picks (spg.py:343-356): its per-superpoint Python loop +
    torch.sort becomes one batched 2-key (segment, value) lexicographic sort
    per channel (segment_quantile_stats; oracle-tested);
  - graph convolution is dense masked attention over [B, S, S] (S ~ N/50),
    identical math to the reference's neighbor loops;
  - the try/except zero-logit fallback (spg.py:413-435) is dropped — fixed
    shapes cannot fail at runtime.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn

from ..ops import farthest_point_sample, index_points
from ..ops.core import square_distance
from ..ops.structure import eigh3x3, min_eigvec3x3
from .common import SharedMLP


def _bn(train, axis_name, name):
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.9, axis_name=axis_name, name=name
    )


def kmeans_partition(xyz: jax.Array, num_superpoints: int, iters: int = 3):
    """Batched k-means: returns (assignments [B, N] int32,
    centroids [B, S, 3], onehot [B, N, S] f32)."""
    seeds = farthest_point_sample(xyz, num_superpoints)
    centroids = index_points(xyz, seeds)
    onehot = None
    for _ in range(iters):
        d = square_distance(xyz, centroids)  # [B, N, S]
        assign = jnp.argmin(d, axis=-1)
        onehot = jax.nn.one_hot(assign, num_superpoints, dtype=jnp.float32)
        counts = jnp.sum(onehot, axis=1)  # [B, S]
        sums = jnp.einsum("bns,bnc->bsc", onehot, xyz)
        new_centroids = sums / jnp.maximum(counts[..., None], 1.0)
        # empty clusters keep their previous centroid
        centroids = jnp.where(counts[..., None] > 0, new_centroids, centroids)
    return assign.astype(jnp.int32), centroids, onehot


def segment_stats(feats: jax.Array, onehot: jax.Array, assign: jax.Array):
    """Exact per-superpoint max/mean/std of point features.

    feats [B, N, C], onehot [B, N, S], assign [B, N] -> each [B, S, C].
    """
    s = onehot.shape[-1]
    counts = jnp.maximum(jnp.sum(onehot, axis=1), 1.0)  # [B, S]
    mean = jnp.einsum("bns,bnc->bsc", onehot, feats) / counts[..., None]
    meansq = jnp.einsum("bns,bnc->bsc", onehot, feats**2) / counts[..., None]
    std = jnp.sqrt(jax.nn.relu(meansq - mean**2) + 1e-12)

    def seg_max(f, ids):
        return jax.ops.segment_max(f, ids, num_segments=s)

    mx = jax.vmap(seg_max)(feats, assign)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # empty segments -> 0
    return mx, mean, std


def _quantile_pick(vals: jax.Array, segk: jax.Array,
                   med_i: jax.Array, q75_i: jax.Array):
    """Index-based per-segment median/q75 picks with a custom VJP.

    vals [B, C, N] float, segk [B, C, N] int32 segment keys, med_i/q75_i
    [B, S] int32 positions into the (segment, value)-sorted order; returns
    (med, q75) each [B, C, S].

    Perf design (spgq_probe on v5e, B=4 N=4096 C=256 S=81): the naive
    differentiable 2-key sort costs 1.3 ms fwd but 41.9 ms fwd+bwd —
    lax.sort's VJP tracks the permutation and its transpose scatters the
    full [B, C, N] payload twice. Gathering the picked values from the
    ORIGINAL features at sort-recovered source indices fixes the backward
    (5.7 ms) but costs 4.9 ms fwd: per-channel [B, C, S]-indexed general
    gathers replace the sorted array's broadcast-index gathers. This
    custom_vjp takes the best half of each: the FORWARD reads the sorted
    values at broadcast positions (and records the picked points' original
    indices from an iota payload riding the same sort); the BACKWARD
    scatter-adds the cotangents straight to those indices — exactly the
    a.e. derivative of an index pick ("1 on the selected element"), at
    [B, C, S] scatter cost. Measured 1.7 ms fwd / 2.3 ms fwd+bwd.
    """
    b, c, n = vals.shape

    def parts(v):
        iota = jax.lax.broadcasted_iota(jnp.int32, (b, c, n), 2)
        _, sv, src = jax.lax.sort((segk, v, iota), dimension=-1, num_keys=2)
        med = jnp.take_along_axis(sv, med_i[:, None, :], axis=2)
        q75 = jnp.take_along_axis(sv, q75_i[:, None, :], axis=2)
        med_src = jnp.take_along_axis(src, med_i[:, None, :], axis=2)
        q75_src = jnp.take_along_axis(src, q75_i[:, None, :], axis=2)
        return med, q75, med_src, q75_src

    @jax.custom_vjp
    def pick(v):
        med, q75, _, _ = parts(v)
        return med, q75

    dtype = vals.dtype  # static at trace time; residuals stay JAX arrays

    def pick_fwd(v):
        med, q75, med_src, q75_src = parts(v)
        return (med, q75), (med_src, q75_src)

    def pick_bwd(res, cts):
        med_src, q75_src = res
        dmed, dq75 = cts
        bi = jnp.arange(b)[:, None, None]
        ci = jnp.arange(c)[None, :, None]
        dv = jnp.zeros((b, c, n), dtype)
        dv = dv.at[bi, ci, med_src].add(dmed.astype(dtype))
        dv = dv.at[bi, ci, q75_src].add(dq75.astype(dtype))
        return (dv,)

    pick.defvjp(pick_fwd, pick_bwd)
    return pick(vals)


def segment_quantile_stats(feats: jax.Array, onehot: jax.Array,
                           assign: jax.Array):
    """EXACT per-superpoint [max, mean, std, median, q75] matching the
    reference's stat pooling semantics (spg.py:322-357):

      - std is torch.std: unbiased (ddof=1) + 1e-6, and 0 when count <= 1;
      - "median"/"q75" are the reference's INDEX-based sorted picks
        sorted[min(cnt//2, cnt-1)] and sorted[min(3*cnt//4, cnt-1)]
        (no interpolation);
      - fully-empty superpoints contribute 0 for every statistic (the
        reference leaves their feature row zero).

    TPU-first: the reference's per-superpoint Python loop + torch.sort
    becomes ONE batched 2-key lexicographic sort per channel — sort N
    points by (segment id, value), then each segment's sorted run is the
    contiguous rows [start_s, start_s + cnt_s) and the quantile picks are
    broadcast-index gathers at static offsets, with an index-routed custom
    VJP so the backward never differentiates the sort (_quantile_pick).
    O(C * N log N) total, no [S, N] masks materialized.

    feats [B, N, C], onehot [B, N, S], assign [B, N] -> each [B, S, C].
    """
    b, n, c = feats.shape
    s = onehot.shape[-1]
    counts = jnp.sum(onehot, axis=1)  # [B, S] float
    cnt = counts.astype(jnp.int32)
    safe = jnp.maximum(counts, 1.0)

    ssum = jnp.einsum("bns,bnc->bsc", onehot, feats)
    mean = ssum / safe[..., None]
    sq = jnp.einsum("bns,bnc->bsc", onehot, feats**2)
    var = (sq - ssum * mean) / jnp.maximum(counts - 1.0, 1.0)[..., None]
    std = jnp.sqrt(jax.nn.relu(var)) + 1e-6
    std = jnp.where(cnt[..., None] > 1, std, 0.0)

    def seg_max(f, ids):
        return jax.ops.segment_max(f, ids, num_segments=s)

    mx = jax.vmap(seg_max)(feats, assign)
    mx = jnp.where(jnp.isfinite(mx), mx, 0.0)  # empty segments -> 0

    segk = jnp.broadcast_to(
        assign[:, None, :].astype(jnp.int32), (b, c, n)
    )
    vals = jnp.swapaxes(feats, 1, 2)  # [B, C, N]
    start = jnp.cumsum(cnt, axis=-1) - cnt  # [B, S] exclusive prefix
    last = jnp.maximum(cnt - 1, 0)
    med_i = start + jnp.minimum(cnt // 2, last)
    q75_i = start + jnp.minimum(3 * cnt // 4, last)
    med, q75 = _quantile_pick(vals, segk, med_i, q75_i)  # [B, C, S]
    med = jnp.swapaxes(med, 1, 2)  # [B, S, C]
    q75 = jnp.swapaxes(q75, 1, 2)
    nonempty = cnt[..., None] > 0
    med = jnp.where(nonempty, med, 0.0)
    q75 = jnp.where(nonempty, q75, 0.0)
    mean = jnp.where(nonempty, mean, 0.0)
    return mx, mean, std, med, q75


class EnhancedGraphConv(nn.Module):
    """Gated attentive graph conv (spg.py:440-557), dense-masked."""

    out_channels: int
    axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x, adjacency, edge_features, train: bool = False):
        # x [B, S, C], adjacency [B, S, S], edge_features [B, S, S, 18]
        b, s, c = x.shape
        self_feat = nn.Dense(self.out_channels, name="self_transform")(x)
        tn = nn.Dense(self.out_channels, name="neighbor_transform")(x)  # [B,S,Co]

        eh = nn.Dense(32, name="edge_mlp0")(edge_features)
        eh = nn.relu(eh)
        eh = nn.relu(nn.Dense(32, name="edge_mlp1")(eh))  # [B, S, S, 32]

        xi = jnp.broadcast_to(x[:, :, None, :], (b, s, s, c))
        xj = jnp.broadcast_to(x[:, None, :, :], (b, s, s, c))
        attn_in = jnp.concatenate([xi, xj, eh], axis=-1)
        a = nn.Dense(32, name="attn0")(attn_in)
        a = nn.Dense(1, name="attn1")(nn.relu(a))[..., 0]  # [B, S, S]
        a = jnp.where(adjacency > 0, a, -1e9)
        a = jax.nn.softmax(a, axis=-1)
        a = jnp.where(adjacency > 0, a, 0.0)  # isolated rows -> zero messages

        gate_in = jnp.concatenate([xj, eh], axis=-1)
        g = nn.Dense(64, name="gate0")(gate_in)
        g = nn.sigmoid(nn.Dense(self.out_channels, name="gate1")(nn.relu(g)))

        msgs = jnp.einsum(
            "bij,bijc->bic", a, tn[:, None, :, :] * g
        )  # sum over neighbors j
        h = jnp.concatenate([self_feat, msgs], axis=-1)
        h = nn.relu(nn.Dense(self.out_channels, name="combine0")(h))
        return nn.Dense(self.out_channels, name="combine1")(h)


class HierarchicalGraphPooling(nn.Module):
    """Top-k node pooling by learned score (spg.py:560-640)."""

    ratio: float = 0.5

    @nn.compact
    def __call__(self, x, adjacency, edge_features):
        b, s, c = x.shape
        h = nn.relu(nn.Dense(64, name="score0")(x))
        h = nn.relu(nn.Dense(16, name="score1")(h))
        scores = nn.Dense(1, name="score2")(h)[..., 0]  # [B, S]
        k = max(4, int(s * self.ratio))
        k = min(k, s)
        _, idx = jax.lax.top_k(scores, k)  # [B, k]
        feats = index_points(x, idx)
        adj = jax.vmap(lambda a, i: a[i][:, i])(adjacency, idx)
        ef = jax.vmap(lambda e, i: e[i][:, i])(edge_features, idx)
        return feats, adj, ef


class ContextAwareGraphPooling(nn.Module):
    """Attention-weighted global pooling (spg.py:643-723)."""

    out_channels: int = 1024

    @nn.compact
    def __call__(self, x, adjacency):
        a = nn.relu(nn.Dense(64, name="attn0")(x))
        a = nn.Dense(1, name="attn1")(a)[..., 0]
        a = jax.nn.softmax(a, axis=-1)
        pooled = jnp.einsum("bs,bsc->bc", a, x)
        h = nn.relu(nn.Dense(512, name="global0")(pooled))
        return nn.relu(nn.Dense(self.out_channels, name="global1")(h))


class SuperpointGraph(nn.Module):
    num_classes: int = 5
    superpoint_size: int = 50
    emb_dims: int = 1024
    kmeans_iters: int = 3
    knn_k: int = 32
    axis_name: Optional[str] = None
    dropout_rate: float = 0.5

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        ax = self.axis_name
        b, n, _ = xyz.shape
        if features is None:
            features = xyz
        x_in = jnp.concatenate([xyz, features], axis=-1)

        point_feats = SharedMLP((64, 128, 256, 256), axis_name=ax, name="point_encoder")(
            x_in, train=train
        )  # [B, N, 256]

        s = max(32, n // self.superpoint_size)
        assign, centroids, onehot = kmeans_partition(xyz, s, self.kmeans_iters)
        counts = jnp.sum(onehot, axis=1)  # [B, S]

        # statistical pooling (spg.py:322-357): weighted [max, mean, std,
        # median, q75] with the reference's exact index-based quantiles
        # (segment_quantile_stats; round-4 replacement of the earlier
        # mean + 0.675*sigma Gaussian approximation)
        mx, mean, std, med, q75 = segment_quantile_stats(
            point_feats, onehot, assign
        )
        sp_feats = (
            0.5 * mx + 0.2 * mean + 0.1 * std + 0.1 * med + 0.1 * q75
        )
        sp_feats = SharedMLP((256, 256, 256), axis_name=ax, name="sp_encoder")(
            sp_feats, train=train
        )

        # shape descriptor per superpoint (spg.py:226-254): eigvals (3),
        # principal direction (3), std x/y (2)
        xyz_mean = jnp.einsum("bns,bnc->bsc", onehot, xyz) / jnp.maximum(
            counts[..., None], 1.0
        )
        xyz_sq = jnp.einsum("bns,bnc->bsc", onehot, xyz**2) / jnp.maximum(
            counts[..., None], 1.0
        )
        var = jax.nn.relu(xyz_sq - xyz_mean**2)
        # covariance (full) via E[xy] - E[x]E[y]
        exy = jnp.einsum("bns,bni,bnj->bsij", onehot, xyz, xyz) / jnp.maximum(
            counts[..., None, None], 1.0
        )
        cov = exy - jnp.einsum("bsi,bsj->bsij", xyz_mean, xyz_mean)
        ev = eigh3x3(cov)  # descending [B, S, 3]
        # principal direction = min-eigvec of (trace*I - cov), i.e. max-eigvec
        tr = cov[..., 0, 0] + cov[..., 1, 1] + cov[..., 2, 2]
        eye = jnp.eye(3, dtype=cov.dtype)
        flipped = tr[..., None, None] * eye - cov
        principal = min_eigvec3x3(flipped)
        shape_feats = jnp.concatenate(
            [ev, principal, jnp.sqrt(var[..., :2] + 1e-12)], axis=-1
        )  # [B, S, 8]

        # graph: kNN over centroids (spg.py:256-263)
        dmat = square_distance(centroids, centroids)
        k = min(self.knn_k + 1, s)
        _, nbr = jax.lax.top_k(-dmat, k)  # includes self
        adj = jnp.sum(jax.nn.one_hot(nbr, s, dtype=jnp.float32), axis=2)  # [B,S,S]

        # 18-dim edge features (spg.py:265-283)
        dirs = centroids[:, None, :, :] - centroids[:, :, None, :]  # [B,S,S,3]
        sf_i = jnp.broadcast_to(shape_feats[:, :, None, :], (b, s, s, 8))
        sf_j = jnp.broadcast_to(shape_feats[:, None, :, :], (b, s, s, 8))
        combined6 = jnp.concatenate([sf_j, sf_i], axis=-1)[..., :6]
        edge_feats = jnp.concatenate(
            [jnp.sqrt(jax.nn.relu(dmat))[..., None], dirs, sf_j - sf_i, combined6],
            axis=-1,
        )  # [B, S, S, 18]

        h = EnhancedGraphConv(256, ax, name="gconv1")(sp_feats, adj, edge_feats, train)
        h = nn.relu(_bn(train, ax, "gbn1")(h))
        h, adj1, ef1 = HierarchicalGraphPooling(0.5, name="gpool1")(h, adj, edge_feats)
        h = EnhancedGraphConv(384, ax, name="gconv2")(h, adj1, ef1, train)
        h = nn.relu(_bn(train, ax, "gbn2")(h))
        h, adj2, ef2 = HierarchicalGraphPooling(0.5, name="gpool2")(h, adj1, ef1)
        h = EnhancedGraphConv(512, ax, name="gconv3")(h, adj2, ef2, train)
        h = nn.relu(_bn(train, ax, "gbn3")(h))
        g = ContextAwareGraphPooling(self.emb_dims, name="gpooling")(h, adj2)

        # classifier (spg.py:75-86)
        c = nn.relu(_bn(train, ax, "cls_bn1")(nn.Dense(512, name="cls_fc1")(g)))
        c = nn.Dropout(self.dropout_rate, deterministic=not train)(c)
        c = nn.relu(_bn(train, ax, "cls_bn2")(nn.Dense(256, name="cls_fc2")(c)))
        c = nn.Dropout(self.dropout_rate, deterministic=not train)(c)
        global_logits = nn.Dense(self.num_classes, name="cls_fc3")(c)  # [B, nc]

        # point feature propagation (spg.py:727-840)
        p = nn.relu(nn.Dense(128, name="pfp_mlp0")(point_feats))
        p = nn.relu(nn.Dense(64, name="pfp_mlp1")(p))
        gl = jnp.broadcast_to(
            global_logits[:, None, :], (b, n, self.num_classes)
        )
        p = jnp.concatenate([p, gl], axis=-1)
        p = nn.relu(nn.Dense(128, name="pfp_comb0")(p))
        p = nn.relu(nn.Dense(64, name="pfp_comb1")(p))
        return nn.Dense(self.num_classes, name="pfp_comb2")(p)
