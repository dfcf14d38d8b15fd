"""SPG exact-quantile backward accounting (round 4).

The round-4 exact superpoint quantiles (segment_quantile_stats: one batched
2-key (segment, value) lex sort per channel, reference spg.py:322-357
semantics) regressed the SPG train step 21 -> 134 ms in the sweep CSV.
Hypothesis: the cost is lax.sort's VJP — differentiating a sort makes the
forward carry a permutation-tracking iota and the backward scatter the full
[B, C, N] payload twice (take_along_axis transpose into the sorted order,
then sort-transpose back to input order) — not the forward sort itself.

Design under test: sort INDICES only (stop_gradient'd keys + an iota
payload), then gather the quantile values from the original differentiable
features — same values, same a.e. derivative ("1 on the selected element"),
but the backward is a [B, S, C] scatter, ~N/S smaller.

Rows (amortized chained-jit, min-of-reps — CLAUDE.md relay methodology):
  - quantile stats fwd / fwd+bwd under both designs at the SPG call-site
    shape (B=4, N=4096, C=256, S=81);
  - full SPG model fwd / fwd+bwd (param grads) under the live design.

Usage: python -m pointcloud_bridge_tpu.bench.spgq_probe
Writes benchmark_results/spgq_probe.json.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .opbreak import amortized_seconds

B, N, C = 4, 4096, 256
NUM_CLASSES = 5


def _sortvjp_quantiles(feats, onehot, assign):
    """The r4-initial design: differentiate THROUGH the 2-key sort."""
    import jax
    import jax.numpy as jnp

    b, n, c = feats.shape
    s = onehot.shape[-1]
    cnt = jnp.sum(onehot, axis=1).astype(jnp.int32)
    segk = jnp.broadcast_to(assign[:, None, :].astype(jnp.int32), (b, c, n))
    vals = jnp.swapaxes(feats, 1, 2)
    _, sv = jax.lax.sort((segk, vals), dimension=-1, num_keys=2)
    start = jnp.cumsum(cnt, axis=-1) - cnt
    last = jnp.maximum(cnt - 1, 0)
    med_i = start + jnp.minimum(cnt // 2, last)
    q75_i = start + jnp.minimum(3 * cnt // 4, last)
    med = jnp.swapaxes(jnp.take_along_axis(sv, med_i[:, None, :], axis=2), 1, 2)
    q75 = jnp.swapaxes(jnp.take_along_axis(sv, q75_i[:, None, :], axis=2), 1, 2)
    nonempty = cnt[..., None] > 0
    return jnp.where(nonempty, med, 0.0), jnp.where(nonempty, q75, 0.0)


def _indexgather_quantiles(feats, onehot, assign):
    """Middle design: indices from a stop_grad'd 3-operand sort, values
    gathered from the ORIGINAL features at per-channel [B, C, S] indices —
    fixes the backward but pays general-gather cost in the forward."""
    import jax
    import jax.numpy as jnp

    b, n, c = feats.shape
    cnt = jnp.sum(onehot, axis=1).astype(jnp.int32)
    segk = jnp.broadcast_to(assign[:, None, :].astype(jnp.int32), (b, c, n))
    vals = jnp.swapaxes(feats, 1, 2)
    iota = jax.lax.broadcasted_iota(jnp.int32, (b, c, n), 2)
    _, _, src = jax.lax.sort(
        (segk, jax.lax.stop_gradient(vals), iota), dimension=-1, num_keys=2
    )
    start = jnp.cumsum(cnt, axis=-1) - cnt
    last = jnp.maximum(cnt - 1, 0)
    med_i = start + jnp.minimum(cnt // 2, last)
    q75_i = start + jnp.minimum(3 * cnt // 4, last)
    med_src = jnp.take_along_axis(src, med_i[:, None, :], axis=2)
    q75_src = jnp.take_along_axis(src, q75_i[:, None, :], axis=2)
    med = jnp.swapaxes(jnp.take_along_axis(vals, med_src, axis=2), 1, 2)
    q75 = jnp.swapaxes(jnp.take_along_axis(vals, q75_src, axis=2), 1, 2)
    nonempty = cnt[..., None] > 0
    return jnp.where(nonempty, med, 0.0), jnp.where(nonempty, q75, 0.0)


def _live_quantiles(feats, onehot, assign):
    """The live design (models/spg.py::_quantile_pick custom VJP):
    sorted-value broadcast gathers forward, index-routed scatter backward."""
    from ..models.spg import segment_quantile_stats

    _, _, _, med, q75 = segment_quantile_stats(feats, onehot, assign)
    return med, q75


def _stat_rows():
    import jax
    import jax.numpy as jnp

    from ..models.spg import kmeans_partition

    s = max(32, N // 50)
    rs = np.random.RandomState(0)
    xyz = jnp.asarray(rs.randn(B, N, 3).astype(np.float32))
    assign, _, onehot = jax.jit(
        kmeans_partition, static_argnums=(1,)
    )(xyz, s)
    assign = jax.block_until_ready(assign)
    feats0 = rs.randn(B, N, C).astype(np.float32)

    for name, qfn in (("sort-VJP", _sortvjp_quantiles),
                      ("index-gather", _indexgather_quantiles),
                      ("custom-vjp", _live_quantiles)):
        def fwd(f, qfn=qfn):
            return qfn(f, onehot, assign)

        def fb(f, qfn=qfn):
            def loss(f_):
                med, q75 = qfn(f_, onehot, assign)
                return jnp.sum(med ** 2) + jnp.sum(q75 ** 2)

            return jax.value_and_grad(loss)(f)

        yield f"quantiles {name} fwd", fwd, feats0
        yield f"quantiles {name} fwd+bwd", fb, feats0


def _model_rows():
    import jax
    import jax.numpy as jnp

    from ..models import get_model
    from .trainbreak import _init_cpu

    model = get_model("spg", num_classes=NUM_CLASSES)
    rs = np.random.RandomState(1)
    xyz0 = rs.randn(B, N, 3).astype(np.float32)
    feats0 = rs.randn(B, N, 3).astype(np.float32)
    variables = _init_cpu(model, xyz0, feats0)
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}
    labels = jnp.asarray(rs.randint(0, NUM_CLASSES, (B, N)), jnp.int32)
    drop_rng = jax.random.PRNGKey(7)

    def loss_fn(p, xyz, f):
        logits, _ = model.apply(
            {"params": p, **rest}, xyz, f, train=True,
            mutable=["batch_stats"], rngs={"dropout": drop_rng},
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], -1))

    # chain on xyz: keeps FPS-seeded k-means (and thus the sort keys) live
    yield "SPG fwd (loss)", lambda xyz, f: loss_fn(params, xyz, f), xyz0, feats0
    yield ("SPG fwd+bwd",
           lambda xyz, f: jax.value_and_grad(loss_fn)(params, xyz, f),
           xyz0, feats0)


def main() -> None:
    rows = []
    print(f"{'row':36s} {'ms':>9s}")
    for name, fn, x in _stat_rows():
        t = amortized_seconds(fn, (x,), iters=16) * 1e3
        print(f"{name:36s} {t:9.3f}")
        rows.append({"row": name, "ms": t})
    for name, fn, x, f in _model_rows():
        t = amortized_seconds(fn, (x, f), iters=12) * 1e3
        print(f"{name:36s} {t:9.3f}")
        rows.append({"row": name, "ms": t})
    out = {"shape": {"B": B, "N": N, "C": C, "S": max(32, N // 50)},
           "rows": rows}
    os.makedirs("benchmark_results", exist_ok=True)
    with open("benchmark_results/spgq_probe.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmark_results/spgq_probe.json")


if __name__ == "__main__":
    main()
