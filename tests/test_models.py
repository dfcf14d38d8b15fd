"""Model zoo tests: shape contracts, parameter-count parity with the reference,
jit-compilability, and gradient flow."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu import losses


def _init_and_forward(model, b=2, n=512, feat_ch=3, train=False):
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (b, n, 3))
    feats = jax.random.uniform(jax.random.PRNGKey(1), (b, n, feat_ch))
    variables = model.init(
        {"params": key, "dropout": jax.random.PRNGKey(2)}, xyz, feats, train=False
    )
    out = model.apply(variables, xyz, feats, train=train,
                      rngs={"dropout": jax.random.PRNGKey(3)} if train else None,
                      mutable=["batch_stats"] if train else False)
    return variables, out


def n_params(variables):
    return sum(x.size for x in jax.tree.leaves(variables["params"]))


def test_pointnet2_ssg_shapes_and_params():
    model = get_model("pointnet2_ssg", num_classes=5)
    variables, out = _init_and_forward(model, b=2, n=512)
    assert out.shape == (2, 512, 5)
    # Exact parameter parity with the reference PointNet2 at 5 classes:
    # 810,501 params (model_performance_comparison.csv:4).
    assert n_params(variables) == 810_501


def test_pointnet2_msg_shapes():
    model = get_model("pointnet2_msg", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 512, 3))
    feats = jnp.concatenate(
        [xyz, jax.random.uniform(jax.random.PRNGKey(1), (2, 512, 6))], axis=-1
    )  # 9-channel input
    variables = model.init(key, xyz, feats, train=False)
    out = model.apply(variables, xyz, feats, train=False)
    assert out.shape == (2, 512, 5)


def test_train_mode_updates_batch_stats():
    model = get_model("pointnet2_ssg", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 256, 3))
    feats = jax.random.uniform(key, (2, 256, 3))
    variables = model.init(key, xyz, feats, train=False)
    out, mutated = model.apply(
        variables,
        xyz,
        feats,
        train=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
        mutable=["batch_stats"],
    )
    assert out.shape == (2, 256, 5)
    before = jax.tree.leaves(variables["batch_stats"])
    after = jax.tree.leaves(mutated["batch_stats"])
    assert any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )


def test_jit_forward_and_grad():
    model = get_model("pointnet2_ssg", num_classes=5)
    key = jax.random.PRNGKey(0)
    xyz = jax.random.uniform(key, (2, 256, 3))
    feats = jax.random.uniform(key, (2, 256, 3))
    labels = jax.random.randint(key, (2, 256), 0, 5)
    variables = model.init(key, xyz, feats, train=False)

    @jax.jit
    def loss_fn(params):
        logits, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            xyz,
            feats,
            train=True,
            rngs={"dropout": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return losses.weighted_cross_entropy(logits, labels)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    gnorm = sum(float(jnp.sum(g**2)) for g in jax.tree.leaves(grads))
    assert gnorm > 0.0


def test_edgeconv_fast_path_matches_literal(rng, monkeypatch):
    """The restructured EdgeConv (project-before-gather + BN-affine max/min
    pooling) must match the literal graph-feature formulation with the SAME
    parameters, in eval and train modes, including BN stat updates."""
    import jax
    from pointcloud_bridge_tpu.models.dgcnn import EdgeConv

    x = jnp.asarray(rng.normal(size=(2, 64, 16)).astype(np.float32))
    mod = EdgeConv(features=24, k=8)

    monkeypatch.setenv("PCB_EDGECONV_FAST", "0")
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)
    want_eval = np.asarray(mod.apply(variables, x, train=False))
    want_train, want_mut = mod.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )

    monkeypatch.setenv("PCB_EDGECONV_FAST", "1")
    got_eval = np.asarray(mod.apply(variables, x, train=False))
    got_train, got_mut = mod.apply(
        variables, x, train=True, mutable=["batch_stats"]
    )

    np.testing.assert_allclose(got_eval, want_eval, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(
        np.asarray(got_train), np.asarray(want_train), rtol=1e-4, atol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        got_mut["batch_stats"],
        want_mut["batch_stats"],
    )
    # param tree identical (checkpoints interchangeable between paths)
    v_fast = mod.init(jax.random.PRNGKey(0), x, train=False)
    assert jax.tree.structure(v_fast) == jax.tree.structure(variables)


def test_edgeconv_fast_path_grad_flows(rng, monkeypatch):
    import jax
    from pointcloud_bridge_tpu.models.dgcnn import EdgeConv

    monkeypatch.setenv("PCB_EDGECONV_FAST", "1")
    x = jnp.asarray(rng.normal(size=(1, 32, 8)).astype(np.float32))
    mod = EdgeConv(features=12, k=4)
    variables = mod.init(jax.random.PRNGKey(0), x, train=False)

    def loss(params):
        out, _ = mod.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
        )
        return jnp.sum(out**2)

    g = jax.grad(loss)(variables["params"])
    flat = jax.tree.leaves(jax.tree.map(lambda a: float(jnp.abs(a).sum()), g))
    assert all(np.isfinite(flat)) and sum(flat) > 0


@pytest.mark.slow
def test_ptv3_bf16_stream_matches_f32(rng):
    """bf16 residual stream (serving config): same param tree as f32, logits
    within bf16 tolerance, argmax almost everywhere identical."""
    import jax.tree_util as jtu

    from pointcloud_bridge_tpu.models import get_model

    xyz = jnp.asarray(rng.uniform(size=(2, 256, 3)).astype(np.float32))
    rgb = jnp.asarray(rng.uniform(size=(2, 256, 3)).astype(np.float32))
    kw = dict(num_classes=5, embed_dim=96, depth=3, num_heads=4,
              drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0)
    m32 = get_model("ptv3", **kw)
    v = m32.init(jax.random.PRNGKey(0), xyz, rgb, train=False)
    mbf = get_model("ptv3", stream_dtype="bfloat16", **kw)
    assert jtu.tree_structure(v) == jtu.tree_structure(
        mbf.init(jax.random.PRNGKey(0), xyz, rgb, train=False)
    )
    a = np.asarray(m32.apply(v, xyz, rgb, train=False))
    b = np.asarray(mbf.apply(v, xyz, rgb, train=False))
    assert np.abs(a - b).max() < 0.1, np.abs(a - b).max()
    assert (a.argmax(-1) == b.argmax(-1)).mean() > 0.97

    # train step must run and learn in the bf16 stream too
    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.train.loop import (
        create_train_state,
        make_optimizer,
        make_train_step,
    )

    batch = {
        "points": np.asarray(xyz),
        "colors": np.asarray(rgb),
        "labels": np.asarray(
            np.random.default_rng(0).integers(0, 5, (2, 256)), np.int32
        ),
    }
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    state = create_train_state(mbf, key, batch, opt)
    step = make_train_step(mbf, cfg.loss, opt, donate=False)
    jb = {k: jnp.asarray(v2) for k, v2 in batch.items()}
    losses = []
    for _ in range(4):
        state, m = step(state, jb, jnp.float32(1e-3), jnp.ones(5), key)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all() and losses[-1] < losses[0], losses
