"""PTv3 component time accounting (the ptv3_big_bf16 speed-of-light table in
PARITY §7).

Times each transformer-block component standalone at the exact big-config
shapes (B=4, N=4096, C=384, H=6, bf16 residual stream) with the amortized
chained-jit method (CLAUDE.md: single-dispatch wall clocks measure the relay,
not the device). Round-3 finding: the model is ATTENTION-BOUND — 21.6 of
28.1 ms sits in the flash kernel, which is at its softmax-VPU floor (exp
over B*H*N^2 score elements); LN/residual traffic is resolved by the bf16
stream (stream_dtype="bfloat16").

Usage: python -m pointcloud_bridge_tpu.bench.ptv3_break
"""

from __future__ import annotations

import time

import numpy as np


def amortized_seconds(fn, x, iters: int = 16, reps: int = 5) -> float:
    import jax
    import jax.numpy as jnp

    def chained(x, count):
        acc = jnp.float32(0.0)
        for _ in range(count):
            out = fn(x)
            s = jnp.sum(out.astype(jnp.float32)) * jnp.float32(1e-6)
            x = x + jnp.tanh(s).astype(x.dtype) * jnp.asarray(1e-3, x.dtype)
            acc = acc + s
        return acc

    run = jax.jit(chained, static_argnums=(1,))
    np.asarray(run(x, iters))
    np.asarray(run(x, 1))
    tk = t1 = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        np.asarray(run(x, iters))
        tk = min(tk, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(x, 1))
        t1 = min(t1, time.perf_counter() - t0)
    return max((tk - t1) / (iters - 1), 0.0)


def main(b: int = 4, n: int = 4096, c: int = 384, h: int = 6,
         depth: int = 12) -> None:
    import flax.linen as nn
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from ..models.ptv3 import (FeedForward, PointAttention,
                               PointTransformerBlock, _attention)

    bf = jnp.bfloat16
    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    x = jax.device_put(
        jnp.asarray(rng.normal(size=(b, n, c)).astype(np.float32)).astype(bf),
        dev,
    )

    def module(mod, *args, **kw):
        with jax.default_device(cpu):
            small = tuple(np.asarray(a[:1], np.float32) for a in args)
            variables = mod.init(jax.random.PRNGKey(0), *small, **kw)
        variables = jax.device_put(variables, dev)
        return lambda a: mod.apply(variables, a, **kw)

    rows = []
    model = get_model("ptv3", num_classes=5, embed_dim=c, depth=depth,
                      num_heads=h, stream_dtype="bfloat16")
    xyz = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)
    feats = jax.device_put(
        jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32)), dev)
    with jax.default_device(cpu):
        mv = model.init(jax.random.PRNGKey(0), np.asarray(xyz[:1]),
                        np.asarray(feats[:1]), train=False)
    mv = jax.device_put(mv, dev)
    rows.append((
        "FULL ptv3_big_bf16 forward",
        amortized_seconds(lambda a: model.apply(mv, a, feats, train=False),
                          xyz), 1,
    ))

    blk = PointTransformerBlock(dim=c, num_heads=h, stream_dtype="bfloat16")
    rows.append((f"block (x{depth})",
                 amortized_seconds(module(blk, x, train=False), x), depth))
    ln = nn.LayerNorm(epsilon=1e-6, dtype=bf, use_fast_variance=False)
    rows.append((f"LN (x{2 * depth})",
                 amortized_seconds(module(ln, x), x), 2 * depth))
    ff = FeedForward(int(c * 4.0), c, dtype=bf)
    rows.append((f"mlp GEGLU (x{depth})",
                 amortized_seconds(module(ff, x, train=False), x), depth))
    att = PointAttention(c, h, dtype=bf)
    rows.append((f"attention module (x{depth})",
                 amortized_seconds(module(att, x, train=False), x), depth))
    q = jax.device_put(
        jnp.asarray(
            rng.normal(size=(b, h, n, c // h)).astype(np.float32)
        ).astype(bf), dev)
    rows.append((
        f"flash kernel+transposes (x{depth})",
        amortized_seconds(
            lambda t: _attention(t.transpose(0, 2, 1, 3),
                                 t.transpose(0, 2, 1, 3),
                                 t.transpose(0, 2, 1, 3)), q), depth,
    ))
    rows.append((f"residual add (x{2 * depth})",
                 amortized_seconds(
                     lambda a: a + a * jnp.asarray(0.5, bf), x), 2 * depth))

    import jax as _j
    print("backend:", _j.default_backend())
    for name, t, mult in rows:
        print(f"{name:34s} {t*1e3:7.3f} ms  x{mult} = {t*1e3*mult:7.2f} ms")


if __name__ == "__main__":
    main()
