"""Measure the remat memory trade on the real TPU: XLA static memory
analysis (temp + argument bytes) and amortized step time of the ptv3_big
TRAIN step, remat off vs on.

Run: python -m pointcloud_bridge_tpu.bench.remat_mem  (TPU; compiles two
train steps, minutes)
"""

from __future__ import annotations

import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    b, n = 4, 4096
    rng = np.random.default_rng(0)
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    opt = make_optimizer()
    cpu = jax.devices("cpu")[0]
    kw = dict(num_classes=5, embed_dim=384, depth=12, num_heads=6)

    for label, extra in (("remat=off", {}), ("remat=on", {"remat": True})):
        model = get_model("ptv3", **kw, **extra)
        with jax.default_device(cpu):
            state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
        state = jax.device_put(state, jax.devices()[0])
        step = make_train_step(model, cfg.loss, opt, donate=False)
        jb = {k: jnp.asarray(v) for k, v in batch.items()}
        cw = jnp.ones(5, jnp.float32)
        key = jax.random.PRNGKey(1)

        # make_train_step returns the jitted step — lower it directly
        compiled = step.lower(state, jb, jnp.float32(1e-3), cw, key).compile()
        ma = compiled.memory_analysis()
        temp_mb = ma.temp_size_in_bytes / 1e6
        arg_mb = ma.argument_size_in_bytes / 1e6
        out_mb = ma.output_size_in_bytes / 1e6

        # amortized step time: run the compiled step in a python chain with a
        # blocking fetch only at the ends (relay methodology — CLAUDE.md)
        s, m = compiled(state, jb, jnp.float32(1e-3), cw, key)
        jax.block_until_ready(m["loss"])
        reps = 8
        t0 = time.perf_counter()
        for _ in range(reps):
            s, m = compiled(s, jb, jnp.float32(1e-3), cw, key)
        _ = float(np.asarray(m["loss"]))
        dt = (time.perf_counter() - t0) / reps * 1e3
        print(
            f"{label}: temp={temp_mb:.0f} MB args={arg_mb:.0f} MB "
            f"out={out_mb:.0f} MB  step~{dt:.1f} ms (dispatch-pipelined)"
        )


if __name__ == "__main__":
    main()
