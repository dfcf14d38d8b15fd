"""Model smoke test CLI (tools/debug_module.py:6-101): random-input forward,
parameter count, and a per-batch-size timing/memory sweep."""

from __future__ import annotations

import argparse


def smoke_test(
    name: str,
    num_classes: int = 5,
    num_points: int = 4096,
    batch_sizes=(1, 2, 4, 8),
    model_kwargs=None,
):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from ..models import get_model
    from ..utils.profiling import live_memory, points_per_second

    model = get_model(name, num_classes=num_classes, **(model_kwargs or {}))
    rng = np.random.default_rng(0)
    key = jax.random.PRNGKey(0)
    results = {"model": name}
    xyz1 = jnp.asarray(rng.uniform(size=(1, num_points, 3)), jnp.float32)
    feats1 = jnp.asarray(rng.uniform(size=(1, num_points, 3)), jnp.float32)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v = model.init(
            {"params": key, "dropout": key, "sampling": key},
            xyz1, feats1, train=False,
        )
    v = jax.device_put(v, jax.devices()[0])
    n_params = sum(x.size for x in jax.tree.leaves(v["params"]))
    results["params"] = int(n_params)
    out = model.apply(v, xyz1, feats1, train=False)
    results["output_shape"] = tuple(out.shape)
    print(f"{name}: params={n_params:,} out={tuple(out.shape)}", flush=True)

    for b in batch_sizes:
        xyz = jnp.asarray(rng.uniform(size=(b, num_points, 3)), jnp.float32)
        feats = jnp.asarray(rng.uniform(size=(b, num_points, 3)), jnp.float32)

        def fwd(x, f=feats, v=v):
            return model.apply(v, x, f, train=False)

        try:
            pps = points_per_second(fwd, xyz, iters=6)
            mem = live_memory()
            peak = max(
                (m.get("peak_bytes_in_use", 0) for m in mem.values()), default=0
            )
            results[f"b{b}_points_per_sec"] = round(pps, 1)
            print(f"  B={b}: {pps:,.0f} pts/s peak_mem={peak:.0f}MB", flush=True)
        except Exception as e:
            print(f"  B={b}: failed ({str(e)[:120]})", flush=True)
            results[f"b{b}_error"] = str(e)[:200]
    return results


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="model smoke test")
    ap.add_argument("model")
    ap.add_argument("--num-classes", type=int, default=5)
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--batch-sizes", default="1,2,4,8")
    args = ap.parse_args(argv)
    smoke_test(
        args.model,
        args.num_classes,
        args.num_points,
        tuple(int(x) for x in args.batch_sizes.split(",")),
    )


if __name__ == "__main__":
    main()
