"""True-PTv3 hierarchical encoder-decoder (beyond reference — VERDICT r4 #5).

The reference's PointTransformerV3 (Highway_bridge/models/PointTransformerV3.py
:173-304) is a simplified flat ViT: no serialization, no pooling. The real
PTv3 design (Wu et al., CVPR 2024) is a U-Net over a SERIALIZED point axis:
Morton-order the points, attend within fixed windows, and between stages pool
to a coarser resolution (grid pooling) so most attention blocks run on
geometrically fewer points; a decoder unpools back up with skip connections.

TPU-first redesign of the pooling (the "Design delta" vs the paper): the
paper's grid pooling produces DATA-DEPENDENT point counts per cloud, which is
hostile to XLA's static-shape compilation. We pool by FIXED STRIDE on the
Morton-sorted axis instead — after serialization, `stride` consecutive points
form a spatially compact cell (that is exactly what a space-filling curve
buys), so a [B, N, C] -> [B, N/s, s, C] reshape + max over the cell is the
static-shape equivalent of grid pooling: one reshape and one reduction, no
scatter, no ragged segments, fully fusible. PTv3's own serialized-pooling
ablation (paper §4) validates this as quality-equivalent to grid pooling.
Unpooling is the exact inverse mapping — each fine point's parent is its
Morton segment — a broadcast (repeat) plus a linear-projected skip sum.

Shares PointTransformerBlock / morton_code with the flat model (models/
ptv3.py), so the tuned flash-attention path and the remat trade apply
unchanged. Head matches the flat model (256-BN-relu-drop-classes,
PointTransformerV3.py:221-227) so checkpoints stay comparable.

Constraints (static shapes under jit): N must be divisible by
prod(strides), and each level's point count by that level's window size.
MoE is not wired here (the flat model covers it).

Sequence parallelism (round 5, `sp_axis`): the shard_inputs=False contract
of the flat windowed model, extended per level. Fixed-stride pooling on the
Morton axis is LOCAL to a contiguous slice (a shard's children pool to
exactly that shard's parents), so each U-Net level runs in one of two exact
states: SHARDED — the sorted axis split into P contiguous window-aligned
slices, attention/pool/unpool all on the 1/P slice — whenever the level's
per-shard count holds complete windows; or FULL — the (tiny, coarse) level
all_gathered and computed replicated on every shard, bit-identical to
single-device math by construction. Levels transition with one tiled
all_gather (sharded -> full) or one dynamic slice (full -> sharded); logits
are all_gathered once before the inverse permutation. Exactness: every
level is either a partition or a replica of the single-device computation
(equality-tested on the 8-way CPU mesh in tests/test_ptv3_pooled.py). Set
axis_name to the same axis so train-mode head BatchNorm moments span the
full N.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import flax.linen as nn

from .ptv3 import PointTransformerBlock, morton_code


class SerializedPool(nn.Module):
    """Grid pooling on the serialized axis: [B, N, C] -> [B, N/s, dim_out].

    Linear proj -> max over each stride-s Morton segment -> LayerNorm
    (projection-before-max mirrors PTv3's pooling MLP; max is the paper's
    pooling reduction). xyz is pooled by the segment mean (cell centroid).
    """

    stride: int
    dim_out: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, xyz):
        b, n, _ = x.shape
        s = self.stride
        g = n // s
        h = nn.Dense(self.dim_out, dtype=self.dtype, name="proj")(x)
        h = jnp.max(h.reshape(b, g, s, self.dim_out), axis=2)
        h = nn.LayerNorm(epsilon=1e-6, name="norm")(h.astype(jnp.float32))
        xyz_c = jnp.mean(xyz.reshape(b, g, s, 3), axis=2)
        return h, xyz_c


class SerializedUnpool(nn.Module):
    """Inverse of SerializedPool: broadcast each parent cell back to its s
    children and fuse with the encoder skip — linear(up) + linear(skip),
    then LayerNorm (PTv3's unpooling is the same sum-of-projections)."""

    stride: int
    dim_out: int
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x_coarse, skip):
        b, g, _ = x_coarse.shape
        up = jnp.repeat(x_coarse, self.stride, axis=1)
        h = nn.Dense(self.dim_out, dtype=self.dtype, name="proj_up")(up)
        h = h + nn.Dense(self.dim_out, dtype=self.dtype, name="proj_skip")(skip)
        return nn.LayerNorm(epsilon=1e-6, name="norm")(h.astype(jnp.float32))


class PointTransformerV3Pooled(nn.Module):
    """Hierarchical serialized PTv3: encoder levels at N, N/s0, N/(s0*s1), ...
    with windowed attention per level, decoder unpooling back with skips.

    dims/enc_depths have one entry per level; strides/dec_depths have
    len(dims)-1 (dec_depths[j] blocks run at level j after its unpool).
    A level uses windowed attention while its point count exceeds
    window_size, global attention once at-or-below it (the coarse levels are
    small enough that global IS the window).
    """

    num_classes: int = 5
    d_in: int = 6
    dims: Tuple[int, ...] = (64, 128, 256)
    enc_depths: Tuple[int, ...] = (2, 2, 2)
    dec_depths: Tuple[int, ...] = (1, 1)
    strides: Tuple[int, ...] = (4, 4)
    head_dim: int = 32  # per-level num_heads = dims[i] // head_dim
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.1
    head_drop_rate: float = 0.5  # head matches PointTransformerV3.py:226
    window_size: int = 1024
    axis_name: Optional[str] = None
    # sequence parallelism (round 5): shard_inputs=False contract — full
    # inputs on every shard, per-level sharded/full states (module
    # docstring). Set axis_name to the same axis for train-mode BN.
    sp_axis: Optional[str] = None
    compute_dtype: Optional[str] = None
    stream_dtype: Optional[str] = None
    remat: bool = False

    def _level_window(self, level_n: int) -> int:
        if self.window_size and level_n > self.window_size:
            if level_n % self.window_size:
                raise ValueError(
                    f"level point count {level_n} not divisible by "
                    f"window_size {self.window_size}"
                )
            return self.window_size
        return 0  # global attention over the (small) level

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        if not (
            len(self.dims) == len(self.enc_depths)
            and len(self.strides) == len(self.dims) - 1
            and len(self.dec_depths) == len(self.dims) - 1
        ):
            raise ValueError(
                "dims/enc_depths must share a length L and strides/dec_depths "
                "have L-1 entries"
            )
        b, n, _ = xyz.shape
        total_stride = 1
        for s in self.strides:
            total_stride *= s
        if n % total_stride:
            raise ValueError(
                f"N={n} must be divisible by prod(strides)={total_stride}"
            )

        if features is None:
            x = xyz
        else:
            x = jnp.concatenate([xyz, features], axis=-1)
        d = x.shape[-1]
        if d < self.d_in:  # same input contract as the flat model
            x = jnp.concatenate(
                [x, jnp.zeros((b, n, self.d_in - d), x.dtype)], axis=-1
            )
        elif d > self.d_in:
            x = x[..., : self.d_in]

        # serialize ONCE; every level inherits the order (a stride-s segment
        # of a Morton order is a compact cell at every scale)
        code = morton_code(xyz)
        order = jnp.argsort(code, axis=1)
        inv_order = jnp.argsort(order, axis=1)
        x = jnp.take_along_axis(x, order[..., None], axis=1)
        # x's first 3 channels ARE xyz (concat'd above; padding appends,
        # truncation keeps a prefix) — slice the already-permuted rows
        # instead of a second per-row-bound [B,N,3] gather (bit-identical;
        # gathers dominate the 11-13% serialization share, pooled_break.json).
        if self.d_in >= 3:
            xyz_full = x[..., :3]
        else:
            xyz_full = jnp.take_along_axis(xyz, order[..., None], axis=1)

        # --- sequence-parallel level states (module docstring) -------------
        levels = len(self.dims)
        n_lv = [n]
        for s in self.strides:
            n_lv.append(n_lv[-1] // s)
        sp = self.sp_axis
        if sp:
            from .common import sp_shard_slice

            p = jax.lax.axis_size(sp)

        def _mode(lv: int) -> str:
            # "sharded": this level's per-shard slice holds complete windows
            # (a partition of the same per-window math); "full": the level
            # runs replicated on every shard (exact for the small coarse
            # levels, and the fallback when windows would span shards).
            if not sp:
                return "single"
            win = self._level_window(n_lv[lv])
            if win and n_lv[lv] % p == 0 and (n_lv[lv] // p) % win == 0:
                return "sharded"
            return "full"

        modes = [_mode(lv) for lv in range(levels)]

        def _to_mode(t, cur: str, want: str):
            # one collective (or slice) per level transition
            if cur == "full" and want == "sharded":
                return sp_shard_slice(t, sp)
            if cur == "sharded" and want == "full":
                return jax.lax.all_gather(t, sp, axis=1, tiled=True)
            return t

        def _level_xyz(lv: int):
            xyz_lvl = xyz_lv[lv]
            if modes[lv] == "sharded":
                return sp_shard_slice(xyz_lvl, sp)
            return xyz_lvl

        # per-level xyz stays FULL on every shard (pooling it is one tiny
        # parameter-free segment mean); sliced on demand for pos embeddings
        xyz_lv = [xyz_full]
        for lv, s in enumerate(self.strides):
            xyz_lv.append(
                jnp.mean(xyz_lv[-1].reshape(b, n_lv[lv + 1], s, 3), axis=2)
            )

        if modes[0] == "sharded":  # embed only this shard's slice
            x = sp_shard_slice(x, sp)

        x = nn.Dense(self.dims[0], dtype=self.compute_dtype,
                     name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="patch_norm")(
            x.astype(jnp.float32)
        )

        sdt = jnp.dtype(self.stream_dtype) if self.stream_dtype else None
        block_cls = (
            nn.remat(PointTransformerBlock, static_argnums=(3,))
            if self.remat
            else PointTransformerBlock
        )

        def run_blocks(x, lv, count, tag):
            dim = self.dims[lv]
            pos = nn.Dense(dim, dtype=self.compute_dtype,
                           name=f"{tag}_pos")(_level_xyz(lv))
            if sdt is not None:
                x = x.astype(sdt)
                pos = pos.astype(sdt)
            # window from the GLOBAL level count (a sharded level's local
            # slice holds complete windows of the same size — exact)
            win = self._level_window(n_lv[lv])
            heads = max(1, dim // self.head_dim)
            for i in range(count):
                x = block_cls(
                    dim,
                    heads,
                    self.mlp_ratio,
                    self.qkv_bias,
                    self.drop_rate,
                    self.attn_drop_rate,
                    win,
                    None,  # never ring: windows/full levels need no halo
                    self.compute_dtype,
                    stream_dtype=self.stream_dtype,
                    name=f"{tag}_block{i}",
                )(x, pos, train)
            return x.astype(jnp.float32) if sdt is not None else x

        skips = []  # encoder output per level (in that level's mode)
        for lv in range(levels):
            x = run_blocks(x, lv, self.enc_depths[lv], f"enc{lv}")
            if lv < levels - 1:
                skips.append(x)
                if modes[lv] == "sharded" and x.shape[1] % self.strides[lv]:
                    raise ValueError(
                        f"sp pooling: per-shard count {x.shape[1]} not "
                        f"divisible by stride {self.strides[lv]}"
                    )
                x, _ = SerializedPool(
                    self.strides[lv], self.dims[lv + 1], self.compute_dtype,
                    name=f"pool{lv}",
                )(x, _level_xyz(lv))
                if sp:
                    x = _to_mode(x, modes[lv], modes[lv + 1])

        for lv in range(levels - 2, -1, -1):
            if sp:
                # a shard's children pool to exactly that shard's parents
                # (contiguous nesting), so the child level's parent slice IS
                # the coarse level's shard slice
                x = _to_mode(x, modes[lv + 1], modes[lv])
            x = SerializedUnpool(
                self.strides[lv], self.dims[lv], self.compute_dtype,
                name=f"unpool{lv}",
            )(x, skips[lv])
            x = run_blocks(x, lv, self.dec_depths[lv], f"dec{lv}")

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x)
        x = nn.Dense(256, name="head_fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="head_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.head_drop_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="head_fc2")(x)
        if sp and modes[0] == "sharded":
            logits = jax.lax.all_gather(logits, sp, axis=1, tiled=True)
        return jnp.take_along_axis(logits, inv_order[..., None], axis=1)
