"""Pipeline parallelism (parallel/pp.py): GPipe over PTv3 blocks must match
single-device math exactly — forward logits, one-step loss, gradients (via
the updated params), and BatchNorm running stats. Runs on the 8-virtual-CPU
mesh (conftest)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.parallel import (
    make_mesh,
    make_pp_forward,
    make_pp_state,
    make_pp_train_step,
    pp_place_state,
    stack_ptv3_params,
    unstack_ptv3_params,
)
from pointcloud_bridge_tpu.train.loop import create_train_state, make_optimizer
from pointcloud_bridge_tpu.config import Config

pytestmark = pytest.mark.mesh



KW = dict(
    num_classes=5, embed_dim=32, depth=4, num_heads=2,
    drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0,
)


def _batch(rng, b=4, n=64):
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def test_stack_unstack_roundtrip(rng):
    model = get_model("ptv3", **KW)
    batch = _batch(rng)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(batch["points"][:1]),
        jnp.asarray(batch["colors"][:1]), train=False,
    )
    params = variables["params"]
    rt = unstack_ptv3_params(stack_ptv3_params(dict(params), 4), 4)
    for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(rt)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("stages,microbatches", [(4, 2), (2, 4)])
def test_pp_forward_matches_single_device(rng, stages, microbatches):
    model = get_model("ptv3", **KW)
    batch = _batch(rng)
    xyz = jnp.asarray(batch["points"])
    feats = jnp.asarray(batch["colors"])
    variables = model.init(jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False)
    ref = model.apply(variables, xyz, feats, train=False)

    mesh = make_mesh(stages, axis="pp")
    fwd = make_pp_forward(model, mesh, num_microbatches=microbatches)
    params = stack_ptv3_params(dict(variables["params"]), model.depth)
    got = fwd(params, variables.get("batch_stats", {}), xyz, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_pp_forward_windowed_morton(rng):
    model = get_model("ptv3", window_size=16, **KW)
    batch = _batch(rng)
    xyz = jnp.asarray(batch["points"])
    feats = jnp.asarray(batch["colors"])
    variables = model.init(jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False)
    ref = model.apply(variables, xyz, feats, train=False)

    mesh = make_mesh(4, axis="pp")
    fwd = make_pp_forward(model, mesh, num_microbatches=2)
    params = stack_ptv3_params(dict(variables["params"]), model.depth)
    got = fwd(params, variables.get("batch_stats", {}), xyz, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


@pytest.mark.slow
def test_pp_train_step_matches_single_device(rng):
    """One PP train step == one single-device train step: loss, every updated
    parameter (incl. stage-sharded trunk grads through the pipeline
    transpose), and the head BN running stats.

    The optimizer is identity-GD (update = -lr * grad) so parameter deltas ARE
    the gradients scaled by lr: with Adam the step-1 update is ~ lr*sign(g),
    which amplifies fp-reassociation noise on near-zero grad elements into
    O(lr) param differences (seen in practice) while saying nothing about
    gradient correctness."""
    import optax

    model = get_model("ptv3", **KW)
    batch = _batch(rng)
    opt = optax.identity()
    cfg = Config()
    key = jax.random.PRNGKey(0)

    # single-device oracle step (same loss/optimizer conventions as the loop)
    from pointcloud_bridge_tpu.train.loop import _loss_fn_for

    st = create_train_state(model, key, batch, opt)
    loss_fn = _loss_fn_for(cfg.loss)
    xyz = jnp.asarray(batch["points"])
    feats = jnp.asarray(batch["colors"])
    labels = jnp.asarray(batch["labels"])
    cw = jnp.ones(5, jnp.float32)

    def compute_loss(params):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": st.batch_stats},
            xyz, feats, train=True,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return loss_fn(logits, labels, xyz, cw), mutated["batch_stats"]

    (ref_loss, ref_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
        st.params
    )
    updates, _ = opt.update(grads, st.opt_state, st.params)
    ref_params = optax.apply_updates(
        st.params, jax.tree.map(lambda u: -1e-3 * u, updates)
    )

    # PP step from the same init
    mesh = make_mesh(4, axis="pp")
    pp_state = make_pp_state(model, key, batch, opt)
    # make_pp_state re-inits; overwrite with the oracle's params for identity
    pp_state = pp_state.replace(
        params=stack_ptv3_params(dict(st.params), model.depth)
    )
    pp_state = pp_state.replace(opt_state=opt.init(pp_state.params))
    pp_state = pp_place_state(pp_state, mesh)
    step = make_pp_train_step(
        model, cfg.loss, opt, mesh, pp_state, num_microbatches=2, donate=False
    )
    new_state, metrics = step(
        pp_state,
        {"points": xyz, "colors": feats, "labels": labels},
        jnp.float32(1e-3),
        cw,
        key,
    )
    jax.block_until_ready(new_state)

    assert np.isfinite(float(metrics["loss"]))
    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss), rtol=1e-5)

    got_params = unstack_ptv3_params(
        jax.tree.map(np.asarray, new_state.params), model.depth
    )
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_params)[0]
    flat_got = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(got_params)[0]
    )
    # deltas are lr * grad, so atol 2e-6 on params = grad agreement to 2e-3
    # absolute at lr 1e-3 (f32 psum reassociation is ~1e-6 here)
    for path, ref_v in flat_ref:
        got_v = flat_got[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(got_v), np.asarray(ref_v), atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
    for a, b in zip(
        jax.tree.leaves(ref_bs), jax.tree.leaves(new_state.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_pp_rejects_indivisible_depth(rng):
    model = get_model("ptv3", num_classes=5, embed_dim=32, depth=3, num_heads=2)
    mesh = make_mesh(2, axis="pp")
    with pytest.raises(ValueError):
        make_pp_forward(model, mesh)


@pytest.mark.slow
def test_dp_pp_composite_matches_single_device(rng):
    """dp x pp on a (2, 4) mesh == single-device step: the batch shards over
    dp (decomposed weighted-CE psum'd before dividing), blocks stage-shard
    over pp, head BN is sync-BN over dp. Loss, every updated param, and BN
    running stats must match the full-batch single-device oracle."""
    import optax

    from pointcloud_bridge_tpu.parallel import make_named_mesh, shard_batch
    from pointcloud_bridge_tpu.train.loop import _loss_fn_for

    model = get_model("ptv3", **KW)
    batch = _batch(rng, b=8)
    opt = optax.identity()
    cfg = Config()
    key = jax.random.PRNGKey(0)

    st = create_train_state(model, key, batch, opt)
    loss_fn = _loss_fn_for(cfg.loss)
    xyz = jnp.asarray(batch["points"])
    feats = jnp.asarray(batch["colors"])
    labels = jnp.asarray(batch["labels"])
    cw = jnp.ones(5, jnp.float32)

    def compute_loss(params):
        logits, mutated = model.apply(
            {"params": params, "batch_stats": st.batch_stats},
            xyz, feats, train=True,
            rngs={"dropout": key},
            mutable=["batch_stats"],
        )
        return loss_fn(logits, labels, xyz, cw), mutated["batch_stats"]

    (ref_loss, ref_bs), grads = jax.value_and_grad(compute_loss, has_aux=True)(
        st.params
    )
    updates, _ = opt.update(grads, st.opt_state, st.params)
    ref_params = optax.apply_updates(
        st.params, jax.tree.map(lambda u: -1e-3 * u, updates)
    )

    mesh = make_named_mesh((2, 4), ("data", "pp"))
    pp_state = make_pp_state(model, key, batch, opt)
    pp_state = pp_state.replace(
        params=stack_ptv3_params(dict(st.params), model.depth)
    )
    pp_state = pp_state.replace(opt_state=opt.init(pp_state.params))
    pp_state = pp_place_state(pp_state, mesh)
    step = make_pp_train_step(
        model, cfg.loss, opt, mesh, pp_state, num_microbatches=2,
        donate=False, dp_axis="data",
    )
    dev_batch = shard_batch(
        {"points": batch["points"], "colors": batch["colors"],
         "labels": batch["labels"]}, mesh, "data",
    )
    new_state, metrics = step(
        pp_state, dev_batch, jnp.float32(1e-3), cw, key,
    )
    jax.block_until_ready(new_state)

    np.testing.assert_allclose(float(metrics["loss"]), float(ref_loss), rtol=1e-5)

    got_params = unstack_ptv3_params(
        jax.tree.map(np.asarray, new_state.params), model.depth
    )
    flat_got = dict(
        (jax.tree_util.keystr(p), v)
        for p, v in jax.tree_util.tree_flatten_with_path(got_params)[0]
    )
    for path, ref_v in jax.tree_util.tree_flatten_with_path(ref_params)[0]:
        got_v = flat_got[jax.tree_util.keystr(path)]
        np.testing.assert_allclose(
            np.asarray(got_v), np.asarray(ref_v), atol=2e-6,
            err_msg=f"param mismatch at {jax.tree_util.keystr(path)}",
        )
    for a, b in zip(
        jax.tree.leaves(ref_bs), jax.tree.leaves(new_state.batch_stats)
    ):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), atol=1e-5)


def test_dp_pp_forward_matches_single_device(rng):
    from pointcloud_bridge_tpu.parallel import make_named_mesh

    model = get_model("ptv3", **KW)
    batch = _batch(rng, b=8)
    xyz = jnp.asarray(batch["points"])
    feats = jnp.asarray(batch["colors"])
    variables = model.init(jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False)
    ref = model.apply(variables, xyz, feats, train=False)

    mesh = make_named_mesh((2, 4), ("data", "pp"))
    fwd = make_pp_forward(model, mesh, num_microbatches=2, dp_axis="data")
    params = stack_ptv3_params(dict(variables["params"]), model.depth)
    got = fwd(params, variables.get("batch_stats", {}), xyz, feats)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-5)


def test_dp_pp_rejects_nondecomposable_loss(rng):
    import optax

    from pointcloud_bridge_tpu.parallel import make_named_mesh

    model = get_model("ptv3", **KW)
    batch = _batch(rng)
    cfg = Config()
    cfg.loss.name = "bridge_structure"
    mesh = make_named_mesh((2, 4), ("data", "pp"))
    pp_state = make_pp_state(model, jax.random.PRNGKey(0), batch, optax.identity())
    with pytest.raises(ValueError):
        make_pp_train_step(
            model, cfg.loss, optax.identity(), mesh, pp_state, dp_axis="data"
        )


def test_pp_state_layout_roundtrip_with_moments(rng):
    """pp_stack_state/pp_unstack_state convert the WHOLE train state —
    params AND the optax Adam moments (mu/nu mirror the params tree) —
    between the canonical and stacked layouts losslessly."""
    from pointcloud_bridge_tpu.parallel import pp_stack_state, pp_unstack_state

    model = get_model("ptv3", **KW)
    batch = _batch(rng)
    opt = make_optimizer(1e-4)
    st = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
    # make the moments non-trivial so the roundtrip can't pass on zeros
    st = st.replace(
        opt_state=jax.tree.map(
            lambda x: x + 1.0 if jnp.issubdtype(x.dtype, jnp.floating) else x,
            st.opt_state,
        )
    )
    rt = pp_unstack_state(pp_stack_state(st, model.depth), model.depth)
    ref = jax.tree_util.tree_flatten_with_path(st)[0]
    got = jax.tree_util.tree_flatten_with_path(rt)[0]
    assert len(ref) == len(got)
    for (pa, a), (pb, b) in zip(ref, got):
        assert jax.tree_util.keystr(pa) == jax.tree_util.keystr(pb)
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_train_engine_pp(tmp_path):
    """train() with parallel.mode='pp' runs GPipe end-to-end on the 8-way
    mesh (round 4): stage-sharded blocks through epochs + validation + EMA +
    checkpointing, with checkpoints (and the returned state) in the
    CANONICAL single-device layout — best_model loads straight into the
    plain model."""
    import os

    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train
    from pointcloud_bridge_tpu.utils.checkpoint import restore_checkpoint

    xyz, rgb, labels = toy_bridge_scene(10000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict(
        {"model": "ptv3", "num_classes": 5, "batch_size": 8, "num_epochs": 2}
    )
    cfg.model.extra = dict(embed_dim=32, depth=8, num_heads=2)
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "pp"
    cfg.train.ema_decay = 0.9
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    assert out["best_val_acc"] > 0

    # canonical layout: block0..block7 present, no 'blocks' stack
    assert "block0" in out["state"].params and "blocks" not in out["state"].params

    model = get_model("ptv3", num_classes=5, **cfg.model.extra)
    restored = restore_checkpoint(
        os.path.join(out["exp_dir"], "best_model"),
        {"params": out["state"].params,
         "batch_stats": out["state"].batch_stats},
    )
    batch = next(iter(ds.batches(2, shuffle=False)))
    logits = model.apply(
        {"params": restored["params"], "batch_stats": restored["batch_stats"]},
        jnp.asarray(batch["points"]), jnp.asarray(batch["colors"]),
        train=False,
    )
    assert logits.shape == (2, 128, 5)
    assert np.all(np.isfinite(np.asarray(logits)))


def test_train_engine_pp_rejects_non_blockstack_model(tmp_path):
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(4000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 8, "num_epochs": 1}
    )
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "pp"
    with pytest.raises(ValueError):
        train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
