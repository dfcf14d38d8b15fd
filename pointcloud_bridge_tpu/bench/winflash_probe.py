"""Measure flash vs XLA attention for the WINDOWED PTv3 config.

The tuned flash kernel's 4.3x/layer win was measured on GLOBAL attention
(N=4096), where the [B, H, N, N] score matrix is HBM-bound. The windowed
config (window_size=512, the real-PTv3-style upgrade path; sweep row
"ptv3 windowed w=512" = 1.5M pts/s) folds to [B*nw, W, H, D] attention with
an 8x smaller score footprint — a different regime the round-2 advisor
flagged as unmeasured. This probe times the whole windowed model and the
folded attention op standalone, XLA vs PCB_FLASH_WINDOWED=1, with the
amortized chained-jit method (CLAUDE.md), and checks numerics agreement.

Verdict (v5e): flash 0.63x XLA at w=512 d8h2 — XLA stays the w=512
default. Round 5 re-measured the w=1024/D=32 fold (ptv3_pooled's regime,
`winflash_pooled.py`) and flash WINS there (1.9x fwd at N=4096), so w=1024
windows take flash by default while w=512 stays opt-in.

Usage: python -m pointcloud_bridge_tpu.bench.winflash_probe
"""

from __future__ import annotations

import os

import numpy as np

from .ptv3_break import amortized_seconds


def main(b: int = 4, n: int = 4096, w: int = 512, c: int = 384,
         h: int = 2, depth: int = 8, stream_dtype: str | None = None) -> None:
    import jax
    import jax.numpy as jnp

    from ..models import get_model

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    xyz = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)
    feats = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)

    model = get_model(
        "ptv3", num_classes=5, embed_dim=c, depth=depth, num_heads=h,
        window_size=w, stream_dtype=stream_dtype,
    )
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), np.asarray(xyz[:1]), np.asarray(feats[:1]),
            train=False,
        )
    variables = jax.device_put(variables, dev)

    def fwd(x):
        return model.apply(variables, x, feats, train=False)

    results = {}
    outs = {}
    sd = stream_dtype or "f32"
    for label, flag in (("xla", "0"), ("flash", "1")):
        os.environ["PCB_FLASH_WINDOWED"] = flag
        sec = amortized_seconds(fwd, xyz, iters=12, reps=5)
        outs[label] = np.asarray(fwd(xyz), np.float32)
        results[label] = sec * 1e3
        print(f"windowed model w={w} d{depth}h{h} {sd} [{label:5s}]: "
              f"{sec * 1e3:7.2f} ms/fwd  "
              f"({b * n / sec / 1e6:6.2f}M pts/s)")

    diff = float(np.max(np.abs(outs["xla"] - outs["flash"])))
    agree = float(
        (outs["xla"].argmax(-1) == outs["flash"].argmax(-1)).mean()
    )
    print(f"logits max|diff| {diff:.3e}, argmax agreement {agree:.4f}")
    speedup = results["xla"] / results["flash"]
    print(f"flash/XLA speedup on the windowed model: {speedup:.2f}x")
    os.environ.pop("PCB_FLASH_WINDOWED", None)


if __name__ == "__main__":
    import sys

    main(stream_dtype="bfloat16" if "--bf16" in sys.argv else None)
