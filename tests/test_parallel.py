"""Multi-device tests on the 8-way virtual CPU mesh: data-parallel training
step (sync-BN, pmean'd grads) must match single-device math."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.parallel import (
    make_mesh,
    shard_batch,
    replicate,
    make_dp_train_step,
    make_dp_eval_step,
)
from pointcloud_bridge_tpu.train.loop import (

    create_train_state,
    make_optimizer,
    make_train_step,
)

pytestmark = pytest.mark.mesh


def _batch(b=8, n=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


@pytest.mark.slow
def test_dp_train_step_runs_and_syncs():
    mesh = make_mesh()
    model = get_model(
        "pointnet2_ssg", num_classes=5, axis_name="data", sa_npoints=(32, 16, 8)
    )
    opt = make_optimizer()
    batch = _batch()
    rng = jax.random.PRNGKey(0)
    state = create_train_state(model, rng, batch, opt)
    state = replicate(state, mesh)
    step = make_dp_train_step(model, Config().loss, opt, mesh)
    sbatch = shard_batch(batch, mesh)
    cw = replicate(jnp.ones(5), mesh)
    state2, m = step(state, sbatch, jnp.float32(1e-3), cw, rng)
    assert np.isfinite(float(m["loss"]))
    assert int(state2.step) == 1
    # params stay replicated and identical across devices
    p0 = jax.tree.leaves(state2.params)[0]
    assert p0.sharding.is_fully_replicated


@pytest.mark.slow
def test_dp_matches_single_device_grads():
    """One DP step over 8 shards == one single-device step on the full batch
    (same loss fn, sync-BN makes the math identical)."""
    mesh = make_mesh()
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    batch = _batch(b=8, n=64, seed=1)
    rng = jax.random.PRNGKey(0)
    opt = make_optimizer()

    # dropout off so per-replica rng streams don't enter the comparison
    model_dp = get_model(
        "pointnet2_ssg", num_classes=5, axis_name="data",
        sa_npoints=(16, 8, 4), dropout_rate=0.0,
    )
    model_1d = get_model(
        "pointnet2_ssg", num_classes=5, sa_npoints=(16, 8, 4), dropout_rate=0.0
    )
    state = create_train_state(model_1d, rng, batch, opt)

    # single device
    step1 = make_train_step(model_1d, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s1, m1 = step1(state, jb, jnp.float32(1e-3), jnp.ones(5), rng)

    # data parallel (same initial params); donation off because the test
    # reads the original state afterwards
    step8 = make_dp_train_step(model_dp, cfg.loss, opt, mesh, donate=False)
    s8, m8 = step8(
        replicate(state, mesh),
        shard_batch(batch, mesh),
        jnp.float32(1e-3),
        replicate(jnp.ones(5), mesh),
        rng,
    )

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=2e-4)
    l1 = jax.tree.leaves(s1.params)
    l8 = jax.tree.leaves(s8.params)
    l0 = jax.tree.leaves(state.params)
    # cosine similarity of total param updates
    d1 = np.concatenate([np.ravel(np.asarray(a) - np.asarray(b)) for a, b in zip(l1, l0)])
    d8 = np.concatenate([np.ravel(np.asarray(a) - np.asarray(b)) for a, b in zip(l8, l0)])
    cos = float(d1 @ d8 / (np.linalg.norm(d1) * np.linalg.norm(d8) + 1e-12))
    assert cos > 0.98, f"DP update diverges from single-device update (cos={cos})"


def test_dp_eval_step():
    mesh = make_mesh()
    model = get_model(
        "pointnet2_ssg", num_classes=5, axis_name="data", sa_npoints=(16, 8, 4)
    )
    opt = make_optimizer()
    batch = _batch(b=8, n=64, seed=2)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, opt)
    evals = make_dp_eval_step(model, 5, mesh)
    cm, loss = evals(
        replicate(state.params, mesh),
        replicate(state.batch_stats, mesh),
        shard_batch(batch, mesh),
        replicate(jnp.ones(5), mesh),
    )
    cm = np.asarray(cm)
    assert cm.sum() == 8 * 64  # every point counted once
    assert np.isfinite(float(loss))


def test_train_engine_data_parallel(tmp_path):
    """train() with config.parallel.num_devices=-1 runs DP over the 8-way
    mesh end-to-end (sync-BN, sharded batches, replicated checkpoints)."""
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
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    assert out["best_val_acc"] > 0


@pytest.mark.slow
def test_tp_2d_mesh_matches_single_device_step():
    """GSPMD (data=4, model=2) mesh: big Dense kernels column-sharded, one
    train step agrees with single-device math (loss to ~1e-5; Adam's
    sign-like update amplifies last-ulp gradient reduction-order noise in the
    params, so parameters are compared by update direction)."""
    import numpy as np

    from pointcloud_bridge_tpu.parallel import make_2d_mesh, make_tp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(0)
    b, n = 8, 256
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    model = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(64, 32, 8))
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, key, batch, opt)

    p0 = jax.tree.map(np.asarray, state0.params)  # snapshot: the TP step
    # donates its input state and device_put may alias unmoved leaves
    ref_step = make_train_step(model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(5)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    mesh = make_2d_mesh(4, 2)
    step, place = make_tp_train_step(model, cfg.loss, opt, mesh)
    state, sb = place(state0, batch)
    sharded_kernels = [
        x for x in jax.tree.leaves(state.params)
        if x.ndim == 2 and "model" in str(x.sharding.spec)
    ]
    assert len(sharded_kernels) >= 5  # column parallelism actually applied
    s_tp, m_tp = step(state, sb, jnp.float32(1e-3), cw, key)
    np.testing.assert_allclose(float(m_tp["loss"]), float(m_ref["loss"]), rtol=1e-4)

    # update directions agree
    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])
    d_tp = flat_delta(s_tp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_tp @ d_ref / (np.linalg.norm(d_tp) * np.linalg.norm(d_ref)))
    # Adam's first step is ~lr*sign(grad): last-ulp reduction-order noise in
    # near-zero gradient entries flips signs, so ~0.97 is the expected band
    assert cos > 0.95, cos


@pytest.mark.slow
def test_train_engine_tp(tmp_path):
    """train() with parallel.mode='tp' runs GSPMD tensor parallelism
    end-to-end on a (4, 2) mesh (round 4): column-sharded Dense kernels
    through epochs + validation + checkpointing, and the returned state's
    big kernels still sharded over 'model' (no silent re-replication)."""
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
    cfg.parallel.mode = "tp"
    cfg.parallel.tp_axis_size = 2
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    assert out["best_val_acc"] > 0
    sharded = [
        x for x in jax.tree.leaves(out["state"].params)
        if hasattr(x, "sharding") and "model" in str(getattr(x.sharding, "spec", ""))
    ]
    assert len(sharded) >= 5, "engine state lost its TP shardings"


# ---------------------------------------------------------------------------
# sequence parallelism (SP): ring attention + PTv3 over a sharded point axis
# ---------------------------------------------------------------------------


def test_ring_attention_matches_dot_product_attention():
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    from pointcloud_bridge_tpu.parallel import make_mesh, ring_attention

    rng = np.random.default_rng(0)
    b, n, h, d = 2, 128, 2, 16
    q, k, v = (
        jnp.asarray(rng.normal(size=(b, n, h, d)).astype(np.float32) * 2)
        for _ in range(3)
    )
    mesh = make_mesh(axis="sp")
    ring = shard_map(
        lambda q, k, v: ring_attention(q, k, v, "sp"),
        mesh=mesh,
        in_specs=(P(None, "sp"), P(None, "sp"), P(None, "sp")),
        out_specs=P(None, "sp"),
        check_vma=False,
    )
    got = np.asarray(jax.jit(ring)(q, k, v))
    want = np.asarray(jax.nn.dot_product_attention(q, k, v))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_sp_forward_matches_single_device():
    from pointcloud_bridge_tpu.parallel import make_sp_forward

    rng = np.random.default_rng(1)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)

    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2)
    ref_model = get_model("ptv3", **kw)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("ptv3", sp_axis="sp", **kw)
    mesh = make_mesh(axis="sp")
    fwd = make_sp_forward(sp_model, mesh, axis="sp")
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-4, atol=5e-5)


@pytest.mark.slow
def test_sp_train_step_matches_single_device():
    """One SP train step (N sharded over 8 devices, ring attention, BN
    moments over the global point axis) must agree with single-device math:
    loss to ~1e-4 and the same parameter-update direction."""
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(2)
    b, n = 2, 256
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    # drop_rate=0: dropout masks can't match between layouts; BN still
    # exercises the cross-shard moment collective
    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2,
              drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0)

    ref_model = get_model("ptv3", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(5)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("ptv3", sp_axis="sp", axis_name="sp", **kw)
    mesh = make_mesh(axis="sp")
    sp_step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                                 donate=False)
    s_sp, m_sp = sp_step(
        state0, {k: jnp.asarray(batch[k]) for k in ("points", "colors", "labels")},
        jnp.float32(1e-3), cw, key,
    )
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_sp = flat_delta(s_sp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_sp @ d_ref / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref)))
    assert cos > 0.95, cos

    # running BN stats must span the global point axis: compare to reference
    bs_sp = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_sp.batch_stats)])
    bs_ref = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_ref.batch_stats)])
    np.testing.assert_allclose(bs_sp, bs_ref, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sp_train_step_weighted_ce_skewed_shards():
    """Advisor round-2 medium: with NON-uniform class weights and a class mix
    that differs per contiguous N-slice, the SP weighted-CE must still equal
    the global weighted mean (psum-of-sums, not pmean-of-shard-means)."""
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(7)
    b, n = 2, 256
    # deliberately skewed labels: first half of N mostly class 0/1, second
    # half mostly 3/4 — contiguous shards see very different class mixes
    labels = np.empty((b, n), np.int32)
    labels[:, : n // 2] = rng.integers(0, 2, (b, n // 2))
    labels[:, n // 2 :] = rng.integers(3, 5, (b, n // 2))
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": labels,
    }
    cfg = Config()
    cfg.loss.name = "weighted_ce"
    cfg.loss.use_class_weights = True
    cfg.loss.label_smoothing = 0.1
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2,
              drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0)
    cw = jnp.array([0.5, 3.0, 1.0, 2.0, 0.7])

    ref_model = get_model("ptv3", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("ptv3", sp_axis="sp", axis_name="sp", **kw)
    mesh = make_mesh(axis="sp")
    sp_step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                                 donate=False)
    s_sp, m_sp = sp_step(state0, jb, jnp.float32(1e-3), cw, key)
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_sp = flat_delta(s_sp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_sp @ d_ref / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref)))
    assert cos > 0.99, cos


def test_sp_train_step_rejects_non_decomposable_loss():
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step

    cfg = Config()
    cfg.loss.name = "bridge_structure"
    mesh = make_mesh(axis="sp")
    model = get_model("ptv3", num_classes=5, embed_dim=64, depth=2,
                      num_heads=2, sp_axis="sp", axis_name="sp")
    with pytest.raises(ValueError, match="not decomposable"):
        make_sp_train_step(model, cfg.loss, make_optimizer(), mesh, axis="sp")


@pytest.mark.slow
def test_dp_sp_composite_train_step_matches_single_device():
    """Composite dp x sp on a (2, 4) mesh: batch over dp, N over sp (ring
    attention within each dp replica), BN moments over BOTH axes via a tuple
    axis_name. Loss and update direction must match single-device math."""
    from pointcloud_bridge_tpu.parallel import (
        make_named_mesh, make_sp_train_step, shard_batch)
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(3)
    b, n = 4, 256
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2,
              drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0)

    ref_model = get_model("ptv3", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(5)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("ptv3", sp_axis="sp", axis_name=("data", "sp"), **kw)
    mesh = make_named_mesh((2, 4), ("data", "sp"))
    step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                              donate=False, dp_axis="data")
    s_got, m_got = step(
        state0,
        {k: jnp.asarray(batch[k]) for k in ("points", "colors", "labels")},
        jnp.float32(1e-3), cw, key,
    )
    np.testing.assert_allclose(
        float(m_got["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_got = flat_delta(s_got.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_got @ d_ref / (np.linalg.norm(d_got) * np.linalg.norm(d_ref)))
    assert cos > 0.95, cos

    bs_got = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_got.batch_stats)])
    bs_ref = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_ref.batch_stats)])
    np.testing.assert_allclose(bs_got, bs_ref, atol=1e-4)


@pytest.mark.slow
def test_sp_ssg_forward_matches_single_device():
    """Neighborhood-model SP (shard_inputs=False): PointNet2 SSG with the
    query axis sharded — FPS replicated, ball query/grouping/MLPs/head on
    1/P query slices, all_gathers between levels — must reproduce the
    single-device forward."""
    from pointcloud_bridge_tpu.parallel import make_sp_forward

    rng = np.random.default_rng(3)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)

    kw = dict(num_classes=5, sa_npoints=(64, 32, 8))
    ref_model = get_model("pointnet2_ssg", **kw)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("pointnet2_ssg", sp_axis="sp", **kw)
    mesh = make_mesh(axis="sp")
    fwd = make_sp_forward(sp_model, mesh, axis="sp", shard_inputs=False)
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_sp_msg_forward_matches_single_device():
    from pointcloud_bridge_tpu.parallel import make_sp_forward

    rng = np.random.default_rng(4)
    b, n = 2, 512
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = np.concatenate(
        [xyz, rng.uniform(size=(b, n, 6)).astype(np.float32)], axis=-1
    )
    ref_model = get_model("pointnet2_msg", num_classes=5)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("pointnet2_msg", num_classes=5, sp_axis="sp")
    mesh = make_mesh(4, axis="sp")  # MSG sa4 has 16 queries -> 4-way
    fwd = make_sp_forward(sp_model, mesh, axis="sp", shard_inputs=False)
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_sp_ssg_train_step_matches_single_device():
    """SP train step for the neighborhood models: loss, update direction,
    and cross-shard BN running stats must match single-device math."""
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(5)
    b, n = 2, 256
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "weighted_ce"
    cfg.loss.use_class_weights = True
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    kw = dict(num_classes=5, sa_npoints=(64, 32, 8), dropout_rate=0.0)

    ref_model = get_model("pointnet2_ssg", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.asarray([0.5, 1.0, 2.0, 1.5, 0.25], jnp.float32)  # skewed
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("pointnet2_ssg", sp_axis="sp", axis_name="sp", **kw)
    mesh = make_mesh(axis="sp")
    sp_step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                                 donate=False, shard_inputs=False)
    s_sp, m_sp = sp_step(
        state0,
        {k: jnp.asarray(batch[k]) for k in ("points", "colors", "labels")},
        jnp.float32(1e-3), cw, key,
    )
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_sp = flat_delta(s_sp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_sp @ d_ref / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref)))
    assert cos > 0.95, cos

    bs_sp = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_sp.batch_stats)])
    bs_ref = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_ref.batch_stats)])
    np.testing.assert_allclose(bs_sp, bs_ref, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_sp_bristrunet_forward_matches_single_device():
    """Flagship-model SP (shard_inputs=False): BriStruNet with the query
    axis sharded through BSE kNN/stats, the MSA levels, GFE, EnhancedFP,
    MSFF and the head — must reproduce the single-device forward
    (VERDICT r3 #1)."""
    from pointcloud_bridge_tpu.parallel import make_sp_forward

    rng = np.random.default_rng(6)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)

    kw = dict(num_classes=5, sa_npoints=(64, 32, 8))
    ref_model = get_model("bristrunet", **kw)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("bristrunet", sp_axis="sp", **kw)
    mesh = make_mesh(axis="sp")
    fwd = make_sp_forward(sp_model, mesh, axis="sp", shard_inputs=False)
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


@pytest.mark.slow
def test_sp_bristrunet_train_step_matches_single_device():
    """SP train step for the flagship model: loss, update direction, and
    cross-shard BN running stats must match single-device math."""
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(7)
    b, n = 2, 256
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "weighted_ce"
    cfg.loss.use_class_weights = True
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    kw = dict(num_classes=5, sa_npoints=(64, 32, 8), dropout_rate=0.0)

    ref_model = get_model("bristrunet", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.asarray([0.5, 1.0, 2.0, 1.5, 0.25], jnp.float32)  # skewed
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("bristrunet", sp_axis="sp", axis_name="sp", **kw)
    mesh = make_mesh(axis="sp")
    sp_step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                                 donate=False, shard_inputs=False)
    s_sp, m_sp = sp_step(
        state0,
        {k: jnp.asarray(batch[k]) for k in ("points", "colors", "labels")},
        jnp.float32(1e-3), cw, key,
    )
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_sp = flat_delta(s_sp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_sp @ d_ref / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref)))
    assert cos > 0.95, cos

    bs_sp = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_sp.batch_stats)])
    bs_ref = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_ref.batch_stats)])
    np.testing.assert_allclose(bs_sp, bs_ref, rtol=1e-3, atol=1e-5)


def test_sp_windowed_ptv3_forward_matches_single_device():
    """Windowed-PTv3 SP (round 4): windows are independent, so the model
    slices the Morton-sorted axis on window boundaries (shard_inputs=False,
    no ring) — must reproduce the single-device windowed forward."""
    from pointcloud_bridge_tpu.parallel import make_sp_forward

    rng = np.random.default_rng(8)
    b, n, w = 2, 512, 32
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)

    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2,
              window_size=w)
    ref_model = get_model("ptv3", **kw)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("ptv3", sp_axis="sp", **kw)
    mesh = make_mesh(axis="sp")  # 8 shards x 64 pts = 2 windows each
    fwd = make_sp_forward(sp_model, mesh, axis="sp", shard_inputs=False)
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


def test_sp_windowed_ptv3_train_step_matches_single_device():
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import make_train_step

    rng = np.random.default_rng(9)
    b, n, w = 2, 512, 32
    batch = {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "weighted_ce"
    cfg.loss.use_class_weights = True
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    kw = dict(num_classes=5, embed_dim=64, depth=2, num_heads=2,
              window_size=w, drop_rate=0.0, attn_drop_rate=0.0,
              head_drop_rate=0.0)

    ref_model = get_model("ptv3", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.asarray([0.5, 1.0, 2.0, 1.5, 0.25], jnp.float32)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("ptv3", sp_axis="sp", axis_name="sp", **kw)
    mesh = make_mesh(axis="sp")
    sp_step = make_sp_train_step(sp_model, cfg.loss, opt, mesh, axis="sp",
                                 donate=False, shard_inputs=False)
    s_sp, m_sp = sp_step(
        state0,
        {k: jnp.asarray(batch[k]) for k in ("points", "colors", "labels")},
        jnp.float32(1e-3), cw, key,
    )
    np.testing.assert_allclose(
        float(m_sp["loss"]), float(m_ref["loss"]), rtol=2e-4
    )

    def flat_delta(a, b2):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b2))
        ])

    d_sp = flat_delta(s_sp.params, p0)
    d_ref = flat_delta(s_ref.params, p0)
    cos = float(d_sp @ d_ref / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref)))
    assert cos > 0.95, cos

    bs_sp = np.concatenate([np.asarray(x).ravel()
                            for x in jax.tree.leaves(s_sp.batch_stats)])
    bs_ref = np.concatenate([np.asarray(x).ravel()
                             for x in jax.tree.leaves(s_ref.batch_stats)])
    np.testing.assert_allclose(bs_sp, bs_ref, rtol=1e-3, atol=1e-5)


@pytest.mark.slow
def test_train_engine_sequence_parallel_ssg(tmp_path):
    """train() with parallel.mode='sp' runs the neighborhood-model SP path
    (shard_inputs inferred False: full inputs, query-axis sharding inside
    the model) end-to-end — engine-level, not just library-level (round 4)."""
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(10000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict({"num_classes": 5, "batch_size": 4, "num_epochs": 2})
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "sp"
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    assert out["best_val_acc"] > 0


@pytest.mark.slow
def test_train_engine_sequence_parallel_ptv3(tmp_path):
    """parallel.mode='sp' with the global-attention PTv3 infers
    shard_inputs=True (N axis sharded, ring attention)."""
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(10000, seed=1)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict({"num_classes": 5, "batch_size": 4, "num_epochs": 2,
                            "model": "ptv3"})
    cfg.model.extra = {"embed_dim": 32, "depth": 1, "num_heads": 2}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "sp"
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert out["best_val_acc"] > 0
