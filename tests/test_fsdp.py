"""FSDP / ZeRO-3 (parallel/fsdp.py): params + optimizer moments sharded over
the data axis must (a) actually shard (1/P per-device bytes for big leaves),
(b) match single-device math, (c) stay sharded across steps."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.parallel import (
    fsdp_state_shardings,
    make_fsdp_mesh,
    make_fsdp_train_step,
)
from pointcloud_bridge_tpu.train.loop import (

    create_train_state,
    make_optimizer,
    make_train_step,
)

import pytest

pytestmark = pytest.mark.mesh


def _batch(b=8, n=256, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def _model():
    return get_model("pointnet2_ssg", num_classes=5, sa_npoints=(64, 32, 8))


def test_fsdp_shards_params_and_moments():
    mesh = make_fsdp_mesh(8)
    model = _model()
    batch = _batch()
    opt = make_optimizer()  # adam: mu/nu moments mirror param shapes
    state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
    cfg = Config()
    step, place = make_fsdp_train_step(model, cfg.loss, opt, mesh)
    state, _ = place(state, batch)

    def sharded_leaves(tree):
        out = []
        for x in jax.tree.leaves(tree):
            if hasattr(x, "sharding") and not x.sharding.is_fully_replicated:
                out.append(x)
        return out

    sp = sharded_leaves(state.params)
    so = sharded_leaves(state.opt_state)
    assert len(sp) >= 5, "param sharding not applied"
    assert len(so) >= 2 * len(sp) - 2, "optimizer moments not sharded"
    for x in sp + so:
        shard = x.addressable_shards[0].data
        assert shard.size * 8 == x.size, (x.shape, shard.shape)

    # per-device bytes of the shardable mass is 1/8 of the leaf total
    total = sum(x.size for x in sp)
    per_dev = sum(x.addressable_shards[0].data.size for x in sp)
    assert per_dev * 8 == total


@pytest.mark.slow
def test_fsdp_matches_single_device_step():
    """One FSDP step equals the single-device step. Plain-SGD transform so
    updated params compare directly (Adam turns last-ulp reduction-order
    noise on dead grads into +-lr sign flips — CLAUDE.md, tests/test_ep.py)."""
    mesh = make_fsdp_mesh(8)
    model = _model()
    batch = _batch()
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)

    ref_step = make_train_step(model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(5)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    step, place = make_fsdp_train_step(model, cfg.loss, opt, mesh)
    state, sb = place(state0, batch)
    s_f, m_f = step(state, sb, jnp.float32(1e-3), cw, key)

    np.testing.assert_allclose(float(m_f["loss"]), float(m_ref["loss"]),
                               rtol=1e-5)
    # grads reduce in a different order across the 8 shards (GSPMD
    # reduce-scatter vs single-device row sums); lr=1e-3 scales that noise
    # into the param update, so the band is atol-led
    for a, b in zip(jax.tree.leaves(s_f.params), jax.tree.leaves(s_ref.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-5, atol=5e-5)
    # BN batch stats are globally correct under GSPMD by construction
    # (looser band: batch VARIANCE is E[x^2]-E[x]^2 — cancellation amplifies
    # the cross-shard reduction-order noise)
    for a, b in zip(jax.tree.leaves(s_f.batch_stats),
                    jax.tree.leaves(s_ref.batch_stats)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=5e-6)
    del p0


def test_fsdp_state_stays_sharded_across_steps():
    """out_shardings pins the updated state: after 2 steps the big leaves
    are still 1/P-sharded (no silent re-replication between steps)."""
    mesh = make_fsdp_mesh(8)
    model = _model()
    batch = _batch()
    opt = make_optimizer()
    cfg = Config()
    state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
    want = fsdp_state_shardings(state, mesh)
    step, place = make_fsdp_train_step(model, cfg.loss, opt, mesh)
    state, sb = place(state, batch)
    cw = jnp.ones(5)
    key = jax.random.PRNGKey(1)
    for _ in range(2):
        state, m = step(state, sb, jnp.float32(1e-3), cw, key)
    assert np.isfinite(float(m["loss"]))
    assert int(state.step) == 2
    for x, sh in zip(jax.tree.leaves(state.params),
                     jax.tree.leaves(want.params)):
        assert x.sharding.is_equivalent_to(sh, x.ndim), (x.shape, x.sharding)


@pytest.mark.slow
def test_train_engine_fsdp(tmp_path):
    """train() with parallel.mode='fsdp' runs ZeRO-3 end-to-end on the 8-way
    mesh (round 4): sharded params/moments through epochs + validation +
    checkpointing, EMA tree pinned to the FSDP shardings, and the returned
    state's big leaves still 1/8-sharded (no silent re-replication)."""
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(10000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict({"num_classes": 5, "batch_size": 8, "num_epochs": 2})
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "fsdp"
    cfg.train.ema_decay = 0.9
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    assert out["best_val_acc"] > 0
    sharded = [
        x for x in jax.tree.leaves(out["state"].params)
        if hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert len(sharded) >= 5, "engine state lost its FSDP shardings"
    for x in sharded:
        assert x.addressable_shards[0].data.size * 8 == x.size


def test_train_engine_fsdp_rejects_accum_and_multistep(tmp_path):
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train
    import pytest

    xyz, rgb, labels = toy_bridge_scene(4000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    for knob in ({"accum_steps": 2}, {"steps_per_dispatch": 2}):
        cfg = Config.from_dict(
            {"num_classes": 5, "batch_size": 8, "num_epochs": 1}
        )
        cfg.model.extra = {"sa_npoints": (32, 16, 8)}
        cfg.parallel.num_devices = -1
        cfg.parallel.mode = "fsdp"
        for k, v in knob.items():
            setattr(cfg.train, k, v)
        with pytest.raises(ValueError):
            train(cfg, ds, ds, exp_dir=str(tmp_path / f"exp_{list(knob)[0]}"))
