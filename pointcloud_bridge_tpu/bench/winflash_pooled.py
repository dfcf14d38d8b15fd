"""Windowed flash attention at ptv3_pooled's w=1024 fold — flash vs XLA.

The earlier windowed-flash probe (`winflash_probe.py`) measured w=512 on the
flat model (D=192->256 pad) and found flash 0.63x XLA — so XLA stayed the
windowed default through round 4. ptv3_pooled's windows are the opposite
regime: w=1024 folds to [B*nw, 1024, H, D=32] (no pad), where the XLA
lowering materializes [B*nw, H, 1024, 1024] score matrices (~2 GB/layer at
N=65536) and attention is HBM-bound on them — exactly the regime where the
tuned flash kernel won 4.3x for global attention.

Measured on v5e (round 5, solo, amortized chained-jit — CLAUDE.md
methodology), full ptv3_pooled forward (prod config 64/128/256, enc 2/2/6,
w=1024), toggling PCB_FLASH_WINDOWED at trace time:

    fwd     N=4096 : XLA 2.64 ms -> flash 1.40 ms (1.9x)
    fwd     N=65536: XLA 82.1 ms -> flash 54.7 ms (1.5x)
    fwd+bwd N=4096 : XLA 9.24 ms -> flash 6.68 ms (1.38x)
    argmax agreement 0.996, max|dlogit| 0.017 (softmax reassociation only,
    the same numerics band as the global-attention flash default)

Outcome: w=1024 windowed attention takes the flash kernel BY DEFAULT
(`models/ptv3.py::_attention`); w=512 keeps the measured-negative XLA
default (PCB_FLASH_WINDOWED=1 opts in, =0 disables both).

Usage: python -m pointcloud_bridge_tpu.bench.winflash_pooled
Writes benchmark_results/winflash_pooled.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .ptv3_break import amortized_seconds

B = 4
POOLED = {"dims": (64, 128, 256), "enc_depths": (2, 2, 6),
          "dec_depths": (1, 1), "strides": (4, 4), "window_size": 1024}


def _build(n):
    import jax
    import jax.numpy as jnp

    from ..models import get_model

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    xyz = jax.device_put(
        jnp.asarray(rng.uniform(size=(B, n, 3)).astype(np.float32)), dev)
    feats = jax.device_put(
        jnp.asarray(rng.uniform(size=(B, n, 3)).astype(np.float32)), dev)
    model = get_model("ptv3_pooled", num_classes=5, **POOLED)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), np.asarray(xyz[:1]), np.asarray(feats[:1]),
            train=False)
    return model, jax.device_put(variables, dev), xyz, feats


def main() -> None:
    import jax
    import jax.numpy as jnp

    rows = {}
    prev = os.environ.get("PCB_FLASH_WINDOWED")
    try:
        for n in (4096, 65536):
            model, variables, xyz, feats = _build(n)

            def fwd(x):
                return model.apply(variables, x, feats, train=False)

            # env is read at TRACE time inside _attention, so toggling it
            # between jit constructions selects the lowering per graph
            for env in ("0", "1"):
                os.environ["PCB_FLASH_WINDOWED"] = env
                sec = amortized_seconds(fwd, xyz, iters=10, reps=5)
                key = f"fwd_n{n}_flashwin{env}"
                rows[key] = round(sec * 1e3, 3)
                print(f"{key}: {sec * 1e3:8.2f} ms", flush=True)

        model, variables, xyz, feats = _build(4096)
        params = variables["params"]
        bstats = variables["batch_stats"]

        def step(x):
            def loss_fn(p):
                out = model.apply(
                    {"params": p, "batch_stats": bstats}, x, feats,
                    train=False)
                # squared loss: backward cotangents can't constant-fold
                return jnp.mean(out.astype(jnp.float32) ** 2)

            l, g = jax.value_and_grad(loss_fn)(params)
            # fold grads into the chained scalar so nothing is DCEd
            return (l + sum(jnp.sum(t) for t in jax.tree.leaves(g))
                    * 1e-9)[None]

        for env in ("0", "1"):
            os.environ["PCB_FLASH_WINDOWED"] = env
            sec = amortized_seconds(step, xyz, iters=8, reps=5)
            key = f"fwdbwd_n4096_flashwin{env}"
            rows[key] = round(sec * 1e3, 3)
            print(f"{key}: {sec * 1e3:8.2f} ms", flush=True)

        os.environ["PCB_FLASH_WINDOWED"] = "0"
        ref = np.asarray(jax.jit(
            lambda x: model.apply(variables, x, feats, train=False))(xyz))
        os.environ["PCB_FLASH_WINDOWED"] = "1"
        new = np.asarray(jax.jit(
            lambda x: model.apply(variables, x, feats, train=False))(xyz))
        rows["argmax_agreement"] = float(
            (ref.argmax(-1) == new.argmax(-1)).mean())
        rows["max_abs_logit_delta"] = float(np.abs(ref - new).max())
        print("argmax agreement:", rows["argmax_agreement"],
              "max|dlogit|:", rows["max_abs_logit_delta"], flush=True)
    finally:
        if prev is None:
            os.environ.pop("PCB_FLASH_WINDOWED", None)
        else:
            os.environ["PCB_FLASH_WINDOWED"] = prev

    os.makedirs("benchmark_results", exist_ok=True)
    path = os.path.join("benchmark_results", "winflash_pooled.json")
    with open(path, "w") as f:
        json.dump(rows, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
