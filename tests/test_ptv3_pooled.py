"""ptv3_pooled (true-PTv3 hierarchical U-Net, models/ptv3_pooled.py):
serialized grid pooling/unpooling correctness oracles, shape/train contracts,
permutation invariance of the serialization round trip, and a 1-epoch engine
run. Beyond-reference model — no torch counterpart; oracles are numpy."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.models.ptv3_pooled import (
    SerializedPool,
    SerializedUnpool,
)

TINY = dict(
    dims=(32, 48, 64), enc_depths=(1, 1, 1), dec_depths=(1, 1),
    strides=(4, 4), window_size=32,
)


def _batch(rng, b=2, n=128):
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)
    return jnp.asarray(xyz), jnp.asarray(feats)


def test_pool_matches_numpy_segment_max(rng):
    pool = SerializedPool(stride=4, dim_out=8)
    x = jnp.asarray(rng.normal(size=(2, 16, 6)), jnp.float32)
    xyz = jnp.asarray(rng.uniform(size=(2, 16, 3)), jnp.float32)
    v = pool.init(jax.random.PRNGKey(0), x, xyz)
    out, xyz_c = pool.apply(v, x, xyz)
    assert out.shape == (2, 4, 8) and xyz_c.shape == (2, 4, 3)
    # oracle: dense proj then per-segment max, then LN
    k = np.asarray(v["params"]["proj"]["kernel"])
    bias = np.asarray(v["params"]["proj"]["bias"])
    h = np.asarray(x) @ k + bias
    seg = h.reshape(2, 4, 4, 8).max(axis=2)
    mu = seg.mean(-1, keepdims=True)
    var = ((seg - mu) ** 2).mean(-1, keepdims=True)
    ln = (seg - mu) / np.sqrt(var + 1e-6)
    ln = ln * np.asarray(v["params"]["norm"]["scale"]) + np.asarray(
        v["params"]["norm"]["bias"]
    )
    np.testing.assert_allclose(np.asarray(out), ln, rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(xyz_c), np.asarray(xyz).reshape(2, 4, 4, 3).mean(axis=2),
        rtol=1e-6,
    )


def test_unpool_parent_mapping(rng):
    # each fine point must receive exactly its Morton-segment parent
    up = SerializedUnpool(stride=4, dim_out=8)
    coarse = jnp.asarray(rng.normal(size=(1, 3, 8)), jnp.float32)
    skip = jnp.zeros((1, 12, 8), jnp.float32)
    v = up.init(jax.random.PRNGKey(0), coarse, skip)
    out = up.apply(v, coarse, skip)
    assert out.shape == (1, 12, 8)
    # zero skip + shared parent -> all 4 children of a segment identical
    o = np.asarray(out).reshape(1, 3, 4, 8)
    np.testing.assert_allclose(
        o, np.broadcast_to(o[:, :, :1], o.shape), rtol=1e-5, atol=1e-6
    )
    # and distinct parents differ
    assert not np.allclose(o[:, 0], o[:, 1])


@pytest.mark.slow
def test_forward_shape_and_determinism(rng):
    m = get_model("ptv3_pooled", num_classes=5, **TINY)
    xyz, feats = _batch(rng)
    v = m.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    out = m.apply(v, xyz, feats, train=False)
    assert out.shape == (2, 128, 5)
    out2 = m.apply(v, xyz, feats, train=False)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(out2))


def test_serialization_round_trip_permutation_equivariance(rng):
    # permuting the input points permutes the logits identically — the
    # Morton sort + inverse-permutation bracket is exact (windows regroup
    # identically because the sorted order is permutation-independent up to
    # ties, which random uniforms avoid)
    m = get_model("ptv3_pooled", num_classes=5, **TINY)
    xyz, feats = _batch(rng, b=1)
    v = m.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    out = np.asarray(m.apply(v, xyz, feats, train=False))
    perm = rng.permutation(128)
    out_p = np.asarray(
        m.apply(v, xyz[:, perm], feats[:, perm], train=False)
    )
    np.testing.assert_allclose(out_p, out[:, perm], rtol=2e-4, atol=2e-5)


@pytest.mark.slow
def test_train_mode_grads_and_bn(rng):
    m = get_model("ptv3_pooled", num_classes=5, **TINY)
    xyz, feats = _batch(rng)
    v = m.init(jax.random.PRNGKey(0), xyz, feats, train=True)
    labels = jnp.asarray(rng.integers(0, 5, (2, 128)), jnp.int32)

    def loss_fn(params):
        logits, upd = m.apply(
            {"params": params, "batch_stats": v["batch_stats"]},
            xyz, feats, train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        lp = jax.nn.log_softmax(logits)
        nll = -jnp.mean(jnp.take_along_axis(lp, labels[..., None], -1))
        return nll, upd

    (loss, upd), g = jax.value_and_grad(loss_fn, has_aux=True)(v["params"])
    assert np.isfinite(float(loss))
    flat = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(g)])
    assert np.isfinite(flat).all() and np.linalg.norm(flat) > 0
    # BN running stats moved
    before = np.asarray(
        jax.tree.leaves(v["batch_stats"])[0]
    )
    after = np.asarray(jax.tree.leaves(upd["batch_stats"])[0])
    assert not np.array_equal(before, after)


@pytest.mark.slow
def test_remat_matches_plain(rng):
    xyz, feats = _batch(rng, b=1, n=64)
    kw = dict(dims=(16, 24), enc_depths=(1, 1), dec_depths=(1,),
              strides=(4,), window_size=16, drop_rate=0.0,
              attn_drop_rate=0.0, head_drop_rate=0.0)
    plain = get_model("ptv3_pooled", num_classes=5, **kw)
    rem = get_model("ptv3_pooled", num_classes=5, remat=True, **kw)
    v = plain.init(jax.random.PRNGKey(0), xyz, feats, train=False)
    a = np.asarray(plain.apply(v, xyz, feats, train=False))
    b = np.asarray(rem.apply(v, xyz, feats, train=False))
    np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-6)


def test_shape_validation_errors(rng):
    xyz, feats = _batch(rng, b=1, n=120)  # not divisible by 16
    m = get_model("ptv3_pooled", num_classes=5, **TINY)
    with pytest.raises(ValueError, match="divisible"):
        m.init(jax.random.PRNGKey(0), xyz, feats, train=False)


@pytest.mark.slow
def test_engine_train_one_epoch(tmp_path):
    # YAML->engine wiring: ptv3_pooled trains end-to-end on the single
    # engine (epochs + val + checkpointing)
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(4000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=64, block_size=6.0, sample_rate=0.2
    )
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict(
        {"model": "ptv3_pooled", "num_classes": 5, "batch_size": 8,
         "num_epochs": 1}
    )
    cfg.model.extra = {
        "dims": (16, 24), "enc_depths": (1, 1), "dec_depths": (1,),
        "strides": (4,), "window_size": 16,
    }
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert np.isfinite(out["history"][-1]["train_loss"])


# --- sequence parallelism (round 5): per-level sharded/full states ---------
# The 512-pt / window-32 config exercises all three level states on the
# 8-way mesh: level 0 (512 pts, 64/shard) SHARDED windowed; level 1
# (128 pts, 16/shard < window) FULL windowed fallback; level 2 (32 pts
# <= window) FULL global attention.
SP_KW = dict(
    num_classes=5, dims=(32, 64, 64), enc_depths=(1, 1, 1),
    dec_depths=(1, 1), strides=(4, 4), window_size=32,
)


@pytest.mark.slow
@pytest.mark.mesh
def test_sp_pooled_forward_matches_single_device():
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_forward

    rng = np.random.default_rng(8)
    b, n = 2, 512
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    feats = rng.uniform(size=(b, n, 3)).astype(np.float32)

    ref_model = get_model("ptv3_pooled", **SP_KW)
    variables = ref_model.init(
        jax.random.PRNGKey(0), xyz[:1], feats[:1], train=False
    )
    want = np.asarray(ref_model.apply(variables, xyz, feats, train=False))

    sp_model = get_model("ptv3_pooled", sp_axis="sp", **SP_KW)
    mesh = make_mesh(axis="sp")
    fwd = make_sp_forward(sp_model, mesh, axis="sp", shard_inputs=False)
    got = np.asarray(fwd(variables, jnp.asarray(xyz), jnp.asarray(feats)))
    np.testing.assert_allclose(got, want, rtol=5e-5, atol=5e-6)


@pytest.mark.slow
@pytest.mark.mesh
def test_sp_pooled_train_step_matches_single_device():
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.parallel import make_mesh, make_sp_train_step
    from pointcloud_bridge_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    rng = np.random.default_rng(9)
    b, n = 2, 512
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
    kw = dict(SP_KW, drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0)

    ref_model = get_model("ptv3_pooled", **kw)
    state0 = create_train_state(ref_model, key, batch, opt)
    p0 = jax.tree.map(np.asarray, state0.params)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.asarray([0.5, 1.0, 2.0, 1.5, 0.25], jnp.float32)
    ref_step = make_train_step(ref_model, cfg.loss, opt, donate=False)
    s_ref, m_ref = ref_step(state0, jb, jnp.float32(1e-3), cw, key)

    sp_model = get_model("ptv3_pooled", sp_axis="sp", axis_name="sp", **kw)
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

    def flat(tree, base):
        return np.concatenate([
            (np.asarray(x) - np.asarray(y)).ravel()
            for x, y in zip(jax.tree.leaves(tree), jax.tree.leaves(base))
        ])

    d_sp, d_ref = flat(s_sp.params, p0), flat(s_ref.params, p0)
    cos = float(
        d_sp @ d_ref
        / (np.linalg.norm(d_sp) * np.linalg.norm(d_ref) + 1e-12)
    )
    assert cos > 0.999, f"sp update diverges (cos={cos})"
    # head BN moments must span the full N (axis_name pmean)
    bs_sp = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(s_sp.batch_stats)]
    )
    bs_ref = np.concatenate(
        [np.asarray(x).ravel() for x in jax.tree.leaves(s_ref.batch_stats)]
    )
    np.testing.assert_allclose(bs_sp, bs_ref, rtol=1e-4, atol=1e-6)


@pytest.mark.slow
@pytest.mark.mesh
def test_train_engine_sp_pooled(tmp_path):
    """parallel.mode='sp' with ptv3_pooled: the engine infers the
    shard_inputs=False contract (model-internal per-level slicing) and
    drives epochs + val through the 8-way mesh."""
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(10000, seed=1)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict({"num_classes": 5, "batch_size": 4,
                            "num_epochs": 2, "model": "ptv3_pooled"})
    cfg.model.extra = {
        "dims": (16, 16, 16), "enc_depths": (1, 1, 1), "dec_depths": (1, 1),
        "strides": (4, 4), "window_size": 8,
    }
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "sp"
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert out["best_val_acc"] > 0
