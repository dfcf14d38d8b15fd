"""ptv3_pooled component accounting: where does the forward go, and does the
serialization (Morton code + sorts + permutation gathers) explain the
per-point cost growth at large N (0.35 -> 0.83 us/pt from 4k to 65k with
the w=1024 windowed-flash default — PARITY §6 pooled paragraph)?

Measures, chained-jit amortized (CLAUDE.md methodology), at B=4:
- morton:      morton_code(xyz)
- sort:        argsort(code)              (the serialization order)
- inv_sort:    argsort(order)             (current inverse-permutation path)
- inv_scatter: zeros.at[order].set(iota)  (candidate replacement: one sort
                                           fewer; exact — a permutation
                                           scatter IS the inverse)
- gathers:     take_along_axis of the [B,N,6] features + [B,N,5] logits (the
               two in-model permutation applications; the xyz gather was
               eliminated in round 5 — the sorted features' first 3 channels
               ARE xyz, so the model slices instead: 86.6 -> 82.2 ms at 65k)
- model:       the full ptv3_pooled forward (prod config)

Run on the real TPU, solo. Writes benchmark_results/pooled_break.json.

Usage: python -m pointcloud_bridge_tpu.bench.pooled_break [N ...]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from .ptv3_break import amortized_seconds

B = 4
POOLED = {"dims": (64, 128, 256), "enc_depths": (2, 2, 6),
          "dec_depths": (1, 1), "strides": (4, 4), "window_size": 1024}


def probe(n: int) -> dict:
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from ..models.ptv3 import morton_code

    rng = np.random.default_rng(0)
    dev = jax.devices()[0]
    xyz = jax.device_put(
        jnp.asarray(rng.uniform(size=(B, n, 3)).astype(np.float32)), dev)
    code = morton_code(xyz)
    order = jnp.argsort(code, axis=1)
    feats6 = jnp.concatenate([xyz, xyz], axis=-1)
    logits = jnp.tile(xyz, (1, 1, 2))[..., :5]

    rows = {}

    def t(label, fn, x, iters=24):
        sec = amortized_seconds(fn, x, iters=iters, reps=5)
        rows[label] = round(sec * 1e3, 4)
        print(f"  {label:12s}: {sec * 1e3:8.3f} ms", flush=True)

    # each fn maps its perturbed first arg -> output so iterations serialize
    t("morton", lambda x: morton_code(x).astype(jnp.float32)[..., None], xyz)
    c0 = code.astype(jnp.float32)
    t("sort", lambda c: jnp.argsort(c, axis=1).astype(jnp.float32)[..., None],
      c0[..., None] if c0.ndim == 2 else c0)
    of = order.astype(jnp.float32)

    def inv_sort(o):
        return jnp.argsort(o[..., 0].astype(jnp.int32), axis=1).astype(
            jnp.float32)[..., None]

    t("inv_sort", inv_sort, of[..., None])

    iota = jnp.broadcast_to(jnp.arange(n, dtype=jnp.int32)[None, :], (B, n))

    def inv_scatter(o):
        # scatter iota at the order positions: exact inverse of a
        # permutation, one sort fewer than argsort(order)
        oi = jnp.clip(o[..., 0].astype(jnp.int32), 0, n - 1)
        z = jnp.zeros((B, n), jnp.int32)
        inv = z.at[jnp.arange(B)[:, None], oi].set(iota)
        return inv.astype(jnp.float32)[..., None]

    t("inv_scatter", inv_scatter, of[..., None])

    def gathers(o):
        # both in-model permutation applications derive their indices from
        # the perturbed input so XLA cannot hoist them out of the chain
        # (xyz is sliced from the sorted features since round 5, not
        # re-gathered — models/ptv3_pooled.py)
        oi = jnp.clip(o[..., 0].astype(jnp.int32), 0, n - 1)[..., None]
        g1 = jnp.take_along_axis(feats6, oi, axis=1)
        g3 = jnp.take_along_axis(logits, oi, axis=1)
        return g1 + jnp.pad(g3, ((0, 0), (0, 0), (0, 1)))

    t("gathers", gathers, of[..., None])

    model = get_model("ptv3_pooled", num_classes=5, **POOLED)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), np.asarray(xyz[:1]),
            np.asarray(xyz[:1]), train=False,
        )
    variables = jax.device_put(variables, dev)
    t("model", lambda x: model.apply(variables, x, xyz, train=False), xyz,
      iters=12)

    ser = rows["morton"] + rows["sort"] + rows["inv_sort"] + rows["gathers"]
    rows["serialization_total"] = round(ser, 4)
    rows["serialization_frac_of_model"] = round(ser / rows["model"], 3)
    print(f"  serialization {ser:.3f} ms = "
          f"{100 * ser / rows['model']:.1f}% of the forward", flush=True)
    return rows


def main(*ns: int) -> None:
    ns = ns or (4096, 65536)
    out = {}
    for n in ns:
        print(f"N={n}:", flush=True)
        out[str(n)] = probe(n)
    os.makedirs("benchmark_results", exist_ok=True)
    with open(os.path.join("benchmark_results", "pooled_break.json"),
              "w") as f:
        json.dump({"B": B, "by_n": out}, f, indent=1)
    print("wrote benchmark_results/pooled_break.json")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
