"""Train-step (fwd+bwd) time accounting for PointNet++ SSG.

The forward path is fully mined (opbreak.py: ~100% of hot-path time in
Pallas kernels / hardware primitives), but the TRAIN step costs ~5-6x the
forward (12.2 vs 2.17 ms at B=4, N=4096, round 3) and its backward half has
never been decomposed. The suspects: XLA turns every neighbor-gather
transpose into a scatter-add (feature gathers [B,S,K,C] in each SA level,
the gather3 xyz kernel's custom VJP, interp3's VJP), and the SharedMLP
backward doubles the MXU work.

Method: the amortized chained-jit harness from opbreak.py (the device
profiler is unreliable on this relay). Each SSG block is timed standalone at
its exact call-site shapes, forward-only vs forward+backward
(value_and_grad wrt params AND the input features — the same edges the real
step differentiates; xyz carries no parameter path in SSG so it is not
differentiated, matching the full model). The per-block (fb - f) costs sum
to an upper bound on the model's backward; the gap vs the measured full
step is reported (cross-block fusion + rematerialized residuals).

Raw-op rows isolate the scatter-add question directly: each hot gather
timed fwd vs fwd+bwd at its call-site shape.

Usage:
  python -m pointcloud_bridge_tpu.bench.trainbreak           # all rows
  PCB_GATHER3_PALLAS=0 ... to ablate the gather3 custom-VJP path.

Writes benchmark_results/trainbreak_ssg.json and prints a table.
"""

from __future__ import annotations

import json
import os

import numpy as np

from .opbreak import amortized_seconds

B, N, C_IN, K = 4, 4096, 9, 32
NUM_CLASSES = 5


def _rng(*shape):
    return np.random.RandomState(sum(shape)).randn(*shape).astype(np.float32)


def _init_cpu(mod, *args):
    """Init on CPU (first remote compile of init graphs costs minutes) and
    transfer. Args must be NUMPY (or None): the Pallas-kernel eager gates
    route off-kernel by inspecting jax.config.jax_default_device for numpy
    operands — jnp arrays already committed to the TPU defeat the gate and
    the traced init lowers a Pallas call for the CPU backend (bench.py:48
    uses the same pattern)."""
    import jax

    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        # train=False: same variable tree, no dropout rng needed at init
        variables = mod.init(jax.random.PRNGKey(0), *args, train=False)
    return jax.device_put(variables, jax.devices()[0])


def _block_rows():
    """Yield (name, fwd_fn, fb_fn, chain_x, rest) per SSG block.

    chain_x is the block's (fine) xyz argument: the harness perturbs it
    per iteration, which keeps the neighbor search LIVE inside the chain —
    chaining on features lets XLA hoist FPS/ball-query/kNN out of the loop
    and constant-fold them (CLAUDE.md interp note; confirmed by XLA
    constant-folding warnings when xyz was closed over). All other arrays
    ride through jit as traced args for the same reason. fb differentiates
    wrt params AND the input features — the same edges the full model's
    backward carries into this block.
    """
    import jax
    import jax.numpy as jnp

    from ..models.common import FeaturePropagation, SegHead, SetAbstraction

    def block(name, mod, args, diff_pos, chain_pos=0):
        variables = _init_cpu(mod, *args)  # numpy args — see _init_cpu
        params = variables["params"]
        rest_vars = {k: v for k, v in variables.items() if k != "params"}
        drop_rng = jax.random.PRNGKey(7)
        rest_idx = [i for i in range(len(args)) if i != chain_pos]

        def rebuild(x, rest):
            a = [None] * len(args)
            a[chain_pos] = x
            for i, r in zip(rest_idx, rest):
                a[i] = r
            return a

        def apply_(p, a):
            out, _ = mod.apply(
                {"params": p, **rest_vars}, *a, train=True,
                mutable=["batch_stats"], rngs={"dropout": drop_rng},
            )
            return out

        def fwd(x, *rest):
            return apply_(params, rebuild(x, rest))

        def fb(x, *rest):
            a0 = rebuild(x, rest)

            def loss(p, fd):
                a = list(a0)
                a[diff_pos] = fd
                out = apply_(p, a)
                return sum(jnp.sum(l.astype(jnp.float32))
                           for l in jax.tree.leaves(out))

            return jax.value_and_grad(loss, argnums=(0, 1))(
                params, a0[diff_pos]
            )

        rest_args = tuple(args[i] for i in rest_idx)
        return name, fwd, fb, args[chain_pos], rest_args

    # the call-site activations (shapes matter, values don't)
    yield block("sa1", SetAbstraction(1024, 0.1, K, (64, 64, 128)),
                [_rng(B, N, 3), _rng(B, N, C_IN)], diff_pos=1)
    yield block("sa2", SetAbstraction(256, 0.2, K, (128, 128, 256)),
                [_rng(B, 1024, 3), _rng(B, 1024, 128)], diff_pos=1)
    yield block("sa3", SetAbstraction(64, 0.4, K, (256, 256, 512)),
                [_rng(B, 256, 3), _rng(B, 256, 256)], diff_pos=1)
    # FP blocks: chain on the FINE positions (the 3-NN query side);
    # differentiate the COARSE features (the deep-path edge).
    yield block("fp3", FeaturePropagation((256, 256)),
                [_rng(B, 256, 3), _rng(B, 64, 3), _rng(B, 256, 256),
                 _rng(B, 64, 512)], diff_pos=3)
    yield block("fp2", FeaturePropagation((256, 128)),
                [_rng(B, 1024, 3), _rng(B, 256, 3), _rng(B, 1024, 128),
                 _rng(B, 256, 256)], diff_pos=3)
    yield block("fp1", FeaturePropagation((128, 128, 128)),
                [_rng(B, N, 3), _rng(B, 1024, 3), None,
                 _rng(B, 1024, 128)], diff_pos=3)
    yield block("head", SegHead(NUM_CLASSES, 128), [_rng(B, N, 128)],
                diff_pos=0)


def _op_rows():
    """Raw hot-gather rows: fwd vs fwd+bwd at call-site shapes."""
    import jax
    import jax.numpy as jnp

    from ..ops.core import index_points
    from ..ops.interpolate import three_nn_interpolate

    rs = np.random.RandomState(0)

    # squared losses everywhere below: a plain sum's cotangent is a
    # CONSTANT ones array, and the whole backward (a scatter of ones)
    # constant-folds out of the chain; squaring makes the cotangent depend
    # on the chained input so the scatter runs every iteration.
    def gather_row(name, n_src, s, c):
        idx = jnp.asarray(rs.randint(0, n_src, (B, s, K)), jnp.int32)
        feats = _rng(B, n_src, c)

        def fwd(f):
            return index_points(f, idx)

        def fb(f):
            def loss(f_):
                return jnp.sum(index_points(f_, idx) ** 2)

            return jax.value_and_grad(loss)(f)

        return name, fwd, fb, feats, ()

    yield gather_row("featgather_sa1 [4096->1024x32, C=9]", N, 1024, C_IN)
    yield gather_row("featgather_sa2 [1024->256x32, C=128]", 1024, 256, 128)
    yield gather_row("featgather_sa3 [256->64x32, C=256]", 256, 64, 256)

    # gather3 (xyz) at sa1 shape — exercises the Pallas custom VJP on TPU
    idx1 = jnp.asarray(rs.randint(0, N, (B, 1024, K)), jnp.int32)

    def g3_fwd(x):
        return index_points(x, idx1)

    def g3_fb(x):
        def loss(x_):
            return jnp.sum(index_points(x_, idx1) ** 2)

        return jax.value_and_grad(loss)(x)

    yield "gather3_sa1 [4096->1024x32, C=3]", g3_fwd, g3_fb, _rng(B, N, 3), ()

    fine, coarse = jnp.asarray(_rng(B, N, 3)), jnp.asarray(_rng(B, 1024, 3))

    def it_fwd(f):
        return three_nn_interpolate(fine, coarse, f, k=3)

    def it_fb(f):
        def loss(f_):
            return jnp.sum(three_nn_interpolate(fine, coarse, f_, k=3) ** 2)

        return jax.value_and_grad(loss)(f)

    yield "interp_fp1 [1024->4096, C=128]", it_fwd, it_fb, _rng(B, 1024, 128), ()


def _full_rows():
    """Whole-model rows: fwd, fwd+bwd, fwd+bwd+adam at the bench shape."""
    import jax
    import jax.numpy as jnp
    import optax

    from ..models import get_model

    model = get_model("pointnet2_ssg", num_classes=NUM_CLASSES)
    xyz0 = _rng(B, N, 3)
    feats0 = _rng(B, N, C_IN)
    variables = _init_cpu(model, xyz0, feats0)
    params = variables["params"]
    rest_vars = {k: v for k, v in variables.items() if k != "params"}
    labels = jnp.asarray(
        np.random.RandomState(1).randint(0, NUM_CLASSES, (B, N)), jnp.int32
    )
    opt = optax.adam(1e-3)
    opt_state = opt.init(params)

    drop_rng = jax.random.PRNGKey(7)

    # chain on xyz (keeps FPS/ball-query live in the chain); grads wrt
    # params only — exactly the edges the real train step differentiates.
    def loss_fn(p, xyz, f):
        logits, _ = model.apply(
            {"params": p, **rest_vars}, xyz, f, train=True,
            mutable=["batch_stats"], rngs={"dropout": drop_rng},
        )
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(jnp.take_along_axis(logp, labels[..., None], -1))

    def fwd(xyz, f):
        return loss_fn(params, xyz, f)

    def fb(xyz, f):
        return jax.value_and_grad(loss_fn)(params, xyz, f)

    def fba(xyz, f):
        l, grads = jax.value_and_grad(loss_fn)(params, xyz, f)
        updates, _ = opt.update(grads, opt_state, params)
        return l, optax.apply_updates(params, updates)

    yield "FULL fwd", fwd, None, xyz0, (feats0,)
    yield "FULL fwd+bwd", None, fb, xyz0, (feats0,)
    yield "FULL fwd+bwd+adam", None, fba, xyz0, (feats0,)


def main() -> None:
    rows = []
    print(f"{'component':44s} {'fwd ms':>8s} {'f+b ms':>8s} {'bwd x':>6s}")
    for name, fwd, fb, x, rest in list(_block_rows()) + list(_op_rows()):
        tf = amortized_seconds(fwd, (x, *rest)) * 1e3 if fwd else float("nan")
        tb = amortized_seconds(fb, (x, *rest)) * 1e3 if fb else float("nan")
        mult = tb / tf if tf and tf == tf else float("nan")
        print(f"{name:44s} {tf:8.3f} {tb:8.3f} {mult:6.2f}")
        rows.append({"component": name, "fwd_ms": tf, "fwd_bwd_ms": tb})
    for name, fwd, fb, x, rest in _full_rows():
        fn = fwd or fb
        t = amortized_seconds(fn, (x, *rest)) * 1e3
        print(f"{name:44s} {t:8.3f}")
        rows.append({"component": name, "ms": t})

    blocks = [r for r in rows if "fwd_bwd_ms" in r and "[" not in r["component"]]
    sum_fb = sum(r["fwd_bwd_ms"] for r in blocks)
    print(f"{'sum of block f+b':44s} {'':8s} {sum_fb:8.3f}")

    out = {
        "shape": {"B": B, "N": N, "C_in": C_IN, "K": K},
        "gather3_pallas": os.environ.get("PCB_GATHER3_PALLAS", "1"),
        "rows": rows,
        "sum_block_fwd_bwd_ms": sum_fb,
    }
    os.makedirs("benchmark_results", exist_ok=True)
    with open("benchmark_results/trainbreak_ssg.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmark_results/trainbreak_ssg.json")


if __name__ == "__main__":
    main()
