"""Windowed+bf16 PTv3 serving-batch probe (VERDICT r3 #6).

Round-3 sweep: ptv3_win_bf16 (w=512, d8h2, bf16 stream) gains +24% at B=4
(1.91M pts/s) but REGRESSES at B=8 (1.46M), while every other serving
config gains at B=8. This probe decomposes the forward at B in {2,4,8,16}
into its scaling components to localize the regime shift:

  - full model forward (ms and pts/s per B);
  - the folded window attention standalone ([B*nw, 512, H, D] via
    jax.nn.dot_product_attention, bf16) — nw=8 windows per block;
  - the Morton serialization standalone (morton_code + argsort + inverse +
    two gathers);
  - a pointwise-MLP proxy (Dense 384->1536->384 GEGLU shape, bf16) that
    must scale linearly if the MXU is healthy.

Per-point cost (ms / (B*N) * 1e6) is flat for linear scaling; the
component whose per-point cost jumps from B=4 to B=8 is the culprit.

Usage: python -m pointcloud_bridge_tpu.bench.winb8_probe
"""

from __future__ import annotations

import numpy as np

from .ptv3_break import amortized_seconds


def main(n: int = 4096, w: int = 512, c: int = 384, h: int = 2,
         depth: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from ..models.ptv3 import morton_code

    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    results = {}

    for b in (2, 4, 8, 16):
        xyz = jax.device_put(
            jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)
        feats = jax.device_put(
            jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)

        model = get_model(
            "ptv3", num_classes=5, embed_dim=c, depth=depth, num_heads=h,
            window_size=w, stream_dtype="bfloat16",
        )
        with jax.default_device(cpu):
            variables = model.init(
                jax.random.PRNGKey(0), np.asarray(xyz[:1]),
                np.asarray(feats[:1]), train=False,
            )
        variables = jax.device_put(variables, dev)

        def fwd(x):
            return model.apply(variables, x, feats, train=False)

        ms = amortized_seconds(fwd, xyz, iters=10, reps=4) * 1e3
        results[f"model_b{b}"] = ms
        print(f"model  B={b:<2} {ms:8.3f} ms  {b * n / ms * 1e3:>12,.0f} "
              f"pts/s  ({ms / (b * n) * 1e6:.1f} ns/pt)", flush=True)

        # folded attention standalone: one layer's QK^T+softmax+AV at the
        # exact folded shape, bf16 I/O like the stream
        nw = n // w
        d = c // h
        q = jax.device_put(jnp.asarray(
            rng.standard_normal((b * nw, w, h, d)).astype(np.float32)
        ).astype(jnp.bfloat16), dev)

        def attn(t):
            return jax.nn.dot_product_attention(t, t, t)

        ms_a = amortized_seconds(attn, q, iters=16, reps=4) * 1e3
        results[f"attn_b{b}"] = ms_a
        print(f"  attn  [{b * nw:>3},{w},{h},{d}] {ms_a:8.3f} ms/layer "
              f"(x{depth} = {ms_a * depth:6.2f})", flush=True)

        # Morton serialization standalone (sort + inverse + 2 gathers)
        def serialize(p):
            code = morton_code(p)
            order = jnp.argsort(code, axis=1)
            inv = jnp.argsort(order, axis=1)
            s = jnp.take_along_axis(p, order[..., None], axis=1)
            return jnp.take_along_axis(s, inv[..., None], axis=1)

        ms_s = amortized_seconds(serialize, xyz, iters=16, reps=4) * 1e3
        results[f"serialize_b{b}"] = ms_s
        print(f"  morton serialize {ms_s:8.3f} ms", flush=True)

        # pointwise MXU proxy: GEGLU-shaped Dense pair in bf16
        k1 = jax.device_put(jnp.asarray(
            rng.standard_normal((c, 4 * c)).astype(np.float32)
        ).astype(jnp.bfloat16), dev)
        k2 = jax.device_put(jnp.asarray(
            rng.standard_normal((2 * c, c)).astype(np.float32)
        ).astype(jnp.bfloat16), dev)
        xb = jax.device_put(jnp.asarray(
            rng.standard_normal((b, n, c)).astype(np.float32)
        ).astype(jnp.bfloat16), dev)

        def mlp(t):
            hdn = t @ k1
            a, g = jnp.split(hdn, 2, axis=-1)
            return (a * jax.nn.gelu(g)) @ k2

        ms_m = amortized_seconds(mlp, xb, iters=16, reps=4) * 1e3
        results[f"mlp_b{b}"] = ms_m
        print(f"  geglu mlp {ms_m:8.3f} ms/layer", flush=True)

    print()
    print("per-point scaling (ns/pt; flat = linear):")
    for comp in ("model", "attn", "serialize", "mlp"):
        row = "  " + comp.ljust(10)
        for b in (2, 4, 8, 16):
            ms = results[f"{comp}_b{b}"]
            row += f" B={b}: {ms / (b * n) * 1e6:7.1f}"
        print(row, flush=True)
    print(results)


if __name__ == "__main__":
    main()
