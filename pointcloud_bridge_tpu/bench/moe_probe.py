"""MoE dispatch probe: grouped one-hot einsum dispatch vs index dispatch.

Measures a single MoEFeedForward layer at the ptv3_moe hot shape
(B=4, N=4096 tokens, dim=384, hidden=1536, E=8, top-2, capacity 1.25 —
registry `ptv3_moe` defaults) plus the full ptv3_moe forward, under both
dispatch implementations (PCB_MOE_DENSE_DISPATCH toggles; see
models/moe.py). Amortized chained-jit method per CLAUDE.md (single-dispatch
wall clocks measure the relay, not the device).

Usage: python -m pointcloud_bridge_tpu.bench.moe_probe
"""

from __future__ import annotations

import os

import numpy as np

from .ptv3_break import amortized_seconds


def main(b: int = 4, n: int = 4096, d: int = 384, hid: int = 1536,
         experts: int = 8) -> None:
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from ..models.moe import MoEFeedForward

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((b, n, d)), jnp.float32)

    cpus = jax.devices("cpu")
    results = {}
    for mode, env in (("index", "0"), ("dense", "1")):
        os.environ["PCB_MOE_DENSE_DISPATCH"] = env
        layer = MoEFeedForward(num_experts=experts, hidden_dim=hid, dim=d,
                               top_k=2, capacity_factor=1.25)
        with jax.default_device(cpus[0]):
            variables = layer.init(jax.random.PRNGKey(0), x)
        variables = jax.device_put(variables, jax.devices()[0])
        ms = amortized_seconds(
            lambda t: layer.apply(variables, t), x) * 1e3
        results[f"layer_{mode}"] = ms
        print(f"moe layer fwd     [{mode:>5}] {ms:8.3f} ms", flush=True)

        # TRAIN cost (advisor r3 medium): fwd+bwd wrt params AND input —
        # the backward of the index path's two take_along_axis gathers is a
        # scatter-add, which this probe prices against the dense einsums'
        # transposed contractions.
        def loss_fn(params, t):
            y = layer.apply({"params": params}, t)
            return jnp.sum(y * y) * jnp.float32(1e-6)

        grad_fn = jax.grad(loss_fn, argnums=(0, 1))

        def train_like(t):
            gp, gx = grad_fn(variables["params"], t)
            leaves = [jnp.sum(g.astype(jnp.float32)) for g in
                      jax.tree.leaves(gp)]
            return gx + sum(leaves) * jnp.float32(1e-9)

        ms_t = amortized_seconds(train_like, x, iters=8) * 1e3
        results[f"layer_train_{mode}"] = ms_t
        print(f"moe layer fwd+bwd [{mode:>5}] {ms_t:8.3f} ms", flush=True)

    if os.environ.get("PCB_MOE_PROBE_MODEL", "0") == "1":
        # chained full-model forwards exceed the relay's remote_compile
        # request-size limit (HTTP 413) even at 6 iterations; the layer
        # probe above is the decision criterion — this stays opt-in for
        # hosts with a local compiler.
        xyz = jnp.asarray(rng.uniform(0, 10, (b, n, 3)), jnp.float32)
        feats = jnp.asarray(rng.standard_normal((b, n, 3)), jnp.float32)
        for mode, env in (("index", "0"), ("dense", "1")):
            os.environ["PCB_MOE_DENSE_DISPATCH"] = env
            model = get_model("ptv3_moe", num_classes=5)
            with jax.default_device(cpus[0]):
                variables = model.init(jax.random.PRNGKey(0), xyz, feats,
                                       train=False)
            variables = jax.device_put(variables, jax.devices()[0])

            def fwd(f):
                return model.apply(variables, xyz, f, train=False)

            ms = amortized_seconds(fwd, feats, iters=6) * 1e3
            results[f"model_{mode}"] = ms
            print(f"ptv3_moe   [{mode:>5}] {ms:8.3f} ms "
                  f"({b * n / ms * 1e3:,.0f} pts/s)", flush=True)

    os.environ["PCB_MOE_DENSE_DISPATCH"] = "0"
    # exactness cross-check at the probe shape (f32: bitwise)
    layer = MoEFeedForward(num_experts=experts, hidden_dim=hid, dim=d,
                           top_k=2, capacity_factor=1.25)
    with jax.default_device(cpus[0]):
        variables = layer.init(jax.random.PRNGKey(0), x)
    variables = jax.device_put(variables, jax.devices()[0])
    y_idx = np.asarray(jax.jit(lambda t: layer.apply(variables, t))(x))
    os.environ["PCB_MOE_DENSE_DISPATCH"] = "1"
    y_dense = np.asarray(jax.jit(lambda t: layer.apply(variables, t))(x))
    print("max |index - dense| =", float(np.max(np.abs(y_idx - y_dense))))
    print(results)


if __name__ == "__main__":
    # restore the caller's env on exit instead of clobbering it (advisor r3)
    _saved = os.environ.get("PCB_MOE_DENSE_DISPATCH")
    try:
        main()
    finally:
        if _saved is None:
            os.environ.pop("PCB_MOE_DENSE_DISPATCH", None)
        else:
            os.environ["PCB_MOE_DENSE_DISPATCH"] = _saved
