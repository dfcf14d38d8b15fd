"""PointTransformerV3 (the reference's simplified variant:
Highway_bridge/models/PointTransformerV3.py:173-304 — plain global attention
over all points of a block; no serialization/windowing, which the reference
also lacks).

PreLN blocks {MHA with learnable xyz pos-enc added pre-QKV (:96-99), GEGLU
FFN (:8-38)}, LN + head with BatchNorm over B*N (:221-227). Attention runs
through jax.nn.dot_product_attention so XLA lowers it to the fused TPU
attention path (the reference uses F.scaled_dot_product_attention, :100-105).

An optional serialized-window mode (`window_size > 0`) sorts points along a
space-filling curve (Morton/Z-order) and applies attention within fixed-size
windows — the real PTv3 design, O(N·W) instead of O(N^2); windows are exact
power-of-two partitions so shapes stay static under jit.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import flax.linen as nn


def morton_code(xyz: jax.Array, bits: int = 10) -> jax.Array:
    """Z-order curve key for [B, N, 3] -> [B, N] uint32. Coordinates are
    min-max normalized per cloud before quantization."""
    mn = jnp.min(xyz, axis=1, keepdims=True)
    mx = jnp.max(xyz, axis=1, keepdims=True)
    q = (xyz - mn) / jnp.maximum(mx - mn, 1e-9)
    grid = (q * ((1 << bits) - 1)).astype(jnp.uint32)

    def spread(v):
        # interleave bits with two zero gaps (supports bits <= 10)
        v = (v | (v << 16)) & jnp.uint32(0x030000FF)
        v = (v | (v << 8)) & jnp.uint32(0x0300F00F)
        v = (v | (v << 4)) & jnp.uint32(0x030C30C3)
        v = (v | (v << 2)) & jnp.uint32(0x09249249)
        return v

    x, y, z = grid[..., 0], grid[..., 1], grid[..., 2]
    return spread(x) | (spread(y) << 1) | (spread(z) << 2)


class GEGLU(nn.Module):
    dim_out: int
    dtype: Optional[str] = None  # compute dtype of the Dense matmuls

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.dim_out * 2, dtype=self.dtype, name="proj")(x)
        a, gate = jnp.split(h, 2, axis=-1)
        return a * nn.gelu(gate)


class FeedForward(nn.Module):
    hidden_dim: int
    dim: int
    dropout: float = 0.0
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = GEGLU(self.hidden_dim, self.dtype, name="geglu")(x)
        x = nn.Dropout(self.dropout, deterministic=not train)(x)
        x = nn.Dense(self.dim, dtype=self.dtype, name="out")(x)
        return nn.Dropout(self.dropout, deterministic=not train)(x)


_flash_fallback_logged = False


def _attention(q, k, v, is_global: bool = True):
    """Multi-head attention on [B, N, H, D] tensors.

    Global attention at N=4096 is HBM-bound on the [B, H, N, N] score matrix
    (~3 passes x 1.6 GB per layer for the big config) — the XLA lowering
    materializes it. The Pallas flash-attention kernel with TUNED block
    sizes (q=512, k_major=1024, k=512; the library defaults are ~2x SLOWER
    than XLA here) keeps score tiles in VMEM: measured 1.55 vs 6.66 ms/layer
    at B=4, H=6, N=4096, D=64 on v5e (4.3x). head_dim > 128 must be a
    multiple of 128, so D=192 (the d8h2 config) is zero-padded to 256 —
    exact: zero q/k lanes contribute zero score, padded v lanes are sliced
    off. Default ON for TPU global attention; PCB_FLASH_ATTN=0 restores the
    XLA path. Model-level on v5e (B=4, N=4096): d8h2 24.9 -> 18.7 ms
    (874k pts/s), d12h6 90.1 -> 37.7 ms (435k pts/s, 2.4x); argmax parity
    1.000 / 0.994 vs the XLA path (softmax reassociation only).
    """
    import os

    n = q.shape[1]
    # Flash is gated on GLOBAL attention explicitly (advisor round-2): the
    # tuned block sizes target the global N=4096 regime; a windowed model
    # with window_size >= 1024 would otherwise slip into an untested
    # shape/perf regime purely via the length check.
    # A `jax.default_device(cpu)` context (the init-params-on-CPU pattern —
    # CLAUDE.md) must skip the kernel even though the default BACKEND is
    # still TPU: under nn.remat the block body is traced to a jaxpr first,
    # so a Pallas-on-CPU failure would surface at eval time OUTSIDE the
    # try/except below.
    dd = getattr(jax.config, "jax_default_device", None)
    # Windowed attention (is_global=False, n == window size after the
    # [B*nw, W, ...] fold): flash is DEFAULT-ON at W=1024 and opt-in
    # (PCB_FLASH_WINDOWED=1) at W=512; PCB_FLASH_WINDOWED=0 disables both.
    # The split is measured, not guessed (round 5, /tmp->PARITY §6):
    # - W=512 d8h2 (flat model, D=192->256 pad): flash 16.8 vs XLA 10.6
    #   ms/fwd (0.63x, bench/winflash_probe.py) — the folded score tiles
    #   aren't HBM-bound and the pad costs; XLA stays that default.
    # - W=1024 (ptv3_pooled, D=32, no pad): the XLA path materializes
    #   [B*nw, H, 1024, 1024] scores (~2 GB/layer at N=65536) and flash is
    #   a clean win — pooled fwd 2.64 -> 1.40 ms at N=4096 (1.9x), 82.1 ->
    #   54.7 ms at N=65536 (1.5x), fwd+bwd 9.24 -> 6.68 ms (1.38x); argmax
    #   agreement 0.996, max|dlogit| 0.017 (softmax reassociation only,
    #   same band as the global flash default).
    fw_env = os.environ.get("PCB_FLASH_WINDOWED", "")
    flash_windowed = (
        not is_global
        and fw_env != "0"
        and (n == 1024 or (fw_env == "1" and n == 512))
    )
    if (
        os.environ.get("PCB_FLASH_ATTN", "1") != "0"
        and jax.default_backend() == "tpu"
        and not (dd is not None and dd.platform == "cpu")
        and (
            (
                is_global
                and n % 512 == 0
                and n >= 1024  # tiny-N (tests/CPU) keeps the XLA path
            )
            or flash_windowed
        )
    ):
        try:
            from jax.experimental.pallas.ops.tpu.flash_attention import (
                BlockSizes,
                flash_attention,
            )

            d = q.shape[-1]
            qt, kt, vt = (t.transpose(0, 2, 1, 3) for t in (q, k, v))
            if d > 128 and d % 128:
                pad = ((d + 127) // 128) * 128 - d
                qt, kt, vt = (
                    jnp.pad(t, ((0, 0), (0, 0), (0, 0), (0, pad)))
                    for t in (qt, kt, vt)
                )
            bq, bkm, bk = min(512, n), min(1024, n), min(512, n)
            bs = BlockSizes(
                block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
                # backward blocks mirror the forward tiling; without them the
                # VJP raises at transpose time (training would die)
                block_q_major_dkv=bq, block_k_major_dkv=bkm,
                block_k_dkv=bk, block_q_dkv=bq,
                block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
            )
            out = flash_attention(
                qt, kt, vt, sm_scale=1.0 / (d**0.5), block_sizes=bs
            )
            return out.transpose(0, 2, 1, 3)[..., :d]
        except Exception as e:  # pragma: no cover - depends on kernel build
            global _flash_fallback_logged
            if not _flash_fallback_logged:
                _flash_fallback_logged = True
                import logging

                logging.getLogger(__name__).warning(
                    "flash attention unavailable at shape %s, falling back "
                    "to XLA attention: %s", tuple(q.shape), e
                )
    return jax.nn.dot_product_attention(q, k, v)


class PointAttention(nn.Module):
    dim: int
    num_heads: int
    qkv_bias: bool = True
    attn_drop: float = 0.0
    proj_drop: float = 0.0
    window_size: int = 0  # 0 = global attention over the block
    sp_axis: Optional[str] = None  # mesh axis the N dim is sharded over
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos_encoding=None, train: bool = False):
        b, n, c = x.shape
        h = self.num_heads
        if pos_encoding is not None:
            x = x + pos_encoding
        qkv = nn.Dense(
            c * 3, use_bias=self.qkv_bias, dtype=self.dtype, name="qkv"
        )(x)
        qkv = qkv.reshape(b, n, 3, h, c // h)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # [B, N, H, D]
        if self.sp_axis and not self.window_size:
            # sequence-parallel GLOBAL attention: N is a shard of the global
            # point axis; run as ring attention over the mesh axis.
            # (Windowed + sp_axis needs NO ring: the model slices the
            # Morton-sorted axis on window boundaries, so this shard's
            # windows are complete and the plain windowed branch below is
            # exact — see PointTransformerV3.sp_axis docstring.)
            from ..parallel.ring import ring_attention

            out = ring_attention(q, k, v, self.sp_axis)
        elif self.window_size and n % self.window_size == 0:
            w = self.window_size
            nw = n // w

            def win(t):
                return t.reshape(b * nw, w, h, c // h)

            out = _attention(win(q), win(k), win(v), is_global=False)
            out = out.reshape(b, n, h, c // h)
        else:
            out = _attention(q, k, v)
        out = out.reshape(b, n, c)
        out = nn.Dense(c, dtype=self.dtype, name="proj")(out)
        return nn.Dropout(self.proj_drop, deterministic=not train)(out)


class PointTransformerBlock(nn.Module):
    dim: int
    num_heads: int
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop: float = 0.0
    attn_drop: float = 0.0
    window_size: int = 0
    sp_axis: Optional[str] = None
    dtype: Optional[str] = None
    # Mixture-of-Experts FFN (beyond reference; models/moe.py): >0 replaces
    # this block's dense GEGLU with num_experts expert copies behind a
    # top-k router. Expert params stack on a leading E axis (`experts_*`)
    # that parallel/ep.py shards over an `expert` mesh axis.
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    # bf16 residual stream (stream_dtype="bfloat16"): the WHOLE inter-block
    # tensor traffic — residuals, LN I/O, QKV layout transposes — moves at
    # half the HBM bytes. Distinct from the per-matmul `dtype` cast variant
    # (measured NEGATIVE round-2: cast traffic around each Dense outweighed
    # the matmul saving); here there are no casts inside the block at all.
    # LN statistics use use_fast_variance=False in bf16 (E[(x-mu)^2], not
    # E[x^2]-mu^2 — the fast form catastrophically cancels in half precision).
    stream_dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, pos_encoding=None, train: bool = False):
        # LayerNorms stay f32 (dtype=None inherits the f32 residual stream)
        # unless stream_dtype is set; only the wide matmuls run in the
        # compute dtype — mixed-precision PreLN, stable across depth.
        sdt = jnp.dtype(self.stream_dtype) if self.stream_dtype else None
        ln_kw = dict(epsilon=1e-6)
        if sdt is not None:
            ln_kw.update(dtype=sdt, use_fast_variance=False)
        cdt = sdt if sdt is not None else self.dtype
        h = nn.LayerNorm(**ln_kw, name="norm1")(x)
        x = x + PointAttention(
            self.dim,
            self.num_heads,
            self.qkv_bias,
            self.attn_drop,
            self.drop,
            self.window_size,
            self.sp_axis,
            cdt,
            name="attn",
        )(h, pos_encoding, train)
        h = nn.LayerNorm(**ln_kw, name="norm2")(x)
        if self.num_experts > 0:
            from .moe import MoEFeedForward

            x = x + MoEFeedForward(
                num_experts=self.num_experts,
                hidden_dim=int(self.dim * self.mlp_ratio),
                dim=self.dim,
                top_k=self.moe_top_k,
                capacity_factor=self.moe_capacity_factor,
                dropout=self.drop,
                dtype=cdt,
                name="moe_mlp",
            )(h, train)
        else:
            x = x + FeedForward(
                int(self.dim * self.mlp_ratio), self.dim, self.drop, cdt,
                name="mlp",
            )(h, train)
        return x


class PointTransformerV3(nn.Module):
    num_classes: int = 5
    d_in: int = 6
    embed_dim: int = 384
    depth: int = 8
    num_heads: int = 2
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_rate: float = 0.1
    attn_drop_rate: float = 0.1
    head_drop_rate: float = 0.5  # reference PointTransformerV3.py:226
    window_size: int = 0  # >0 enables serialized windowed attention
    axis_name: Optional[str] = None
    # sequence-parallel mode (SURVEY §2.9 SP row). GLOBAL attention
    # (window_size=0): the caller shard_maps the forward with the N axis
    # split over this mesh axis (shard_inputs=True); attention runs as ring
    # attention (parallel/ring.py) and everything else is pointwise over N.
    # WINDOWED (window_size>0, round 4): windows are independent, so no
    # ring — the model runs in the shard_inputs=False contract (full
    # inputs): Morton sort replicated, the sorted axis sliced on
    # window-aligned boundaries, trunk+head on the 1/P slice, one logits
    # all_gather before the inverse permutation. Set axis_name to the same
    # axis for train-mode BatchNorm so head moments span the full N.
    sp_axis: Optional[str] = None
    # Compute dtype for the wide matmuls (qkv/proj/GEGLU/patch embed).
    # Params and the residual stream stay f32 (LayerNorm/softmax/BN too), so
    # checkpoints are interchangeable with the f32 model. MEASURED NEGATIVE
    # on v5e at the big config (bf16 146.9 vs f32 89.7 ms/forward): XLA's
    # default TPU matmul precision already feeds the MXU a truncated-mantissa
    # path (a raw f32 [16k,384]x[384,3072] chain measures 271 TFLOP/s, far
    # above the f32 peak), so explicit bf16 only adds cast traffic between
    # the f32 residual stream and each matmul. Kept for HBM-constrained
    # multi-chip serving where halving activation bytes matters.
    compute_dtype: Optional[str] = None
    # Mixture-of-Experts FFN (beyond reference — models/moe.py): >0 swaps
    # the dense GEGLU FFN for num_experts routed experts in every
    # `moe_every`-th block (every other block by default, Switch-style; the
    # dense blocks keep the token-local path cheap). Expert params carry a
    # leading E axis that parallel/ep.py shards over an `expert` mesh axis.
    num_experts: int = 0
    moe_top_k: int = 2
    moe_capacity_factor: float = 1.25
    moe_every: int = 2
    # bf16 RESIDUAL STREAM (distinct from compute_dtype's per-matmul casts):
    # the inter-block activations themselves are bf16 — residual adds, LN
    # I/O, QKV transposes, attention I/O all move half the HBM bytes with NO
    # casts inside the blocks. Params stay f32 (checkpoint-compatible);
    # patch embed + head bracket the stream with one cast each. The
    # non-attention ~15 ms of ptv3_big is HBM-bound elementwise traffic
    # (PARITY speed-of-light), which this targets directly.
    stream_dtype: Optional[str] = None
    # Rematerialization (gradient checkpointing): wrap every trunk block in
    # jax.checkpoint so the backward pass saves only the [B, N, C] block
    # boundaries and recomputes each block's internals — activation memory
    # O(depth·B·N·C) instead of O(depth·B·H·N·N + ...), the standard TPU
    # trade of MXU FLOPs for HBM (scaling-book recipe). Same param tree
    # (checkpoint-compatible) and same math — grads are identical up to
    # recompute reassociation (tested). Blocks hold no BatchNorm (the head
    # BN sits outside), so no mutable collections cross the remat boundary.
    remat: bool = False

    @nn.compact
    def __call__(
        self, xyz: jax.Array, features: Optional[jax.Array], train: bool = False
    ) -> jax.Array:
        b, n, _ = xyz.shape
        if features is None:
            x = xyz
        else:
            x = jnp.concatenate([xyz, features], axis=-1)
        d = x.shape[-1]
        if d < self.d_in:  # zero-pad (PointTransformerV3.py:243-272)
            x = jnp.concatenate(
                [x, jnp.zeros((b, n, self.d_in - d), x.dtype)], axis=-1
            )
        elif d > self.d_in:
            x = x[..., : self.d_in]

        order = inv_order = None
        sp_windowed = bool(self.sp_axis) and self.window_size > 0
        if sp_windowed:
            # Windowed SEQUENCE PARALLELISM (round 4): windows are
            # independent, so no ring attention is needed — the model runs
            # in the shard_inputs=False contract (inputs arrive FULL on
            # every shard): Morton-serialize the full cloud replicated
            # (cheap: one sort of N keys), slice the sorted point axis on
            # WINDOW-ALIGNED boundaries (each shard holds complete
            # windows), run the whole trunk + head on the 1/P slice, and
            # all_gather the logits once before the inverse permutation.
            # Exact by construction: a partition of the same per-window
            # math. Requires (N / P) % window_size == 0.
            p = jax.lax.axis_size(self.sp_axis)
            if (n // p) % self.window_size:
                raise ValueError(
                    f"windowed sp: per-shard point count {n // p} must be "
                    f"a multiple of window_size {self.window_size}"
                )
        if self.window_size:
            # serialize: sort points along the Morton curve so windows are
            # spatially compact (real-PTv3 serialization)
            code = morton_code(xyz)
            order = jnp.argsort(code, axis=1)
            inv_order = jnp.argsort(order, axis=1)
            x = jnp.take_along_axis(x, order[..., None], axis=1)
            # x's first 3 channels ARE xyz (concat'd above; padding appends,
            # truncation keeps a prefix), so slice the already-permuted rows
            # instead of paying a second per-row-bound [B,N,3] gather
            # (bit-identical; the gathers are 11-13% of the pooled forward —
            # benchmark_results/pooled_break.json).
            if self.d_in >= 3:
                xyz = x[..., :3]
            else:
                xyz = jnp.take_along_axis(xyz, order[..., None], axis=1)
        if sp_windowed:
            from .common import sp_shard_slice

            x = sp_shard_slice(x, self.sp_axis)
            xyz = sp_shard_slice(xyz, self.sp_axis)

        x = nn.Dense(self.embed_dim, dtype=self.compute_dtype,
                     name="patch_embed")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="patch_norm")(
            x.astype(jnp.float32)
        )
        pos = nn.Dense(self.embed_dim, dtype=self.compute_dtype,
                       name="pos_embed")(xyz)

        sdt = jnp.dtype(self.stream_dtype) if self.stream_dtype else None
        if sdt is not None:  # enter the half-precision residual stream
            x = x.astype(sdt)
            pos = pos.astype(sdt)

        # static_argnums counts (self, x, pos_encoding, train): train (3)
        # feeds Python control flow (deterministic=) so it must stay static
        block_cls = (
            nn.remat(PointTransformerBlock, static_argnums=(3,))
            if self.remat
            else PointTransformerBlock
        )
        for i in range(self.depth):
            moe_here = (
                self.num_experts > 0 and i % self.moe_every == self.moe_every - 1
            )
            x = block_cls(
                self.embed_dim,
                self.num_heads,
                self.mlp_ratio,
                self.qkv_bias,
                self.drop_rate,
                self.attn_drop_rate,
                self.window_size,
                self.sp_axis,
                self.compute_dtype,
                num_experts=self.num_experts if moe_here else 0,
                moe_top_k=self.moe_top_k,
                moe_capacity_factor=self.moe_capacity_factor,
                stream_dtype=self.stream_dtype,
                name=f"block{i}",
            )(x, pos, train)

        x = nn.LayerNorm(epsilon=1e-6, name="norm")(x.astype(jnp.float32))
        x = nn.Dense(256, name="head_fc1")(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.9,
            axis_name=self.axis_name, name="head_bn",
        )(x)
        x = nn.relu(x)
        x = nn.Dropout(self.head_drop_rate, deterministic=not train)(x)
        logits = nn.Dense(self.num_classes, name="head_fc2")(x)

        if sp_windowed:
            logits = jax.lax.all_gather(
                logits, self.sp_axis, axis=1, tiled=True
            )
        if inv_order is not None:
            logits = jnp.take_along_axis(logits, inv_order[..., None], axis=1)
        return logits
