"""Rematerialization (models/ptv3.py `remat`): jax.checkpoint around every
trunk block must leave the param tree, forward, grads, and dropout pattern
unchanged — only the backward's memory/recompute schedule differs."""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from pointcloud_bridge_tpu.models import get_model

KW = dict(num_classes=5, embed_dim=64, depth=3, num_heads=2)


def _data(b=2, n=128, seed=0):
    rng = np.random.default_rng(seed)
    xyz = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    feats = jnp.asarray(rng.uniform(size=(b, n, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 5, (b, n)), jnp.int32)
    return xyz, feats, labels


def test_remat_param_tree_and_forward_identical():
    xyz, feats, _ = _data()
    key = jax.random.PRNGKey(0)
    base = get_model("ptv3", **KW)
    rem = get_model("ptv3", remat=True, **KW)
    vb = base.init(key, xyz, feats, train=False)
    vr = rem.init(key, xyz, feats, train=False)
    # identical tree: remat-trained checkpoints load into the plain model
    tb = jax.tree.structure(vb)
    tr = jax.tree.structure(vr)
    assert tb == tr
    for a, b in zip(jax.tree.leaves(vb), jax.tree.leaves(vr)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    ob = base.apply(vb, xyz, feats, train=False)
    orr = rem.apply(vr, xyz, feats, train=False)
    np.testing.assert_array_equal(np.asarray(ob), np.asarray(orr))


def test_remat_grads_match():
    xyz, feats, labels = _data()
    key = jax.random.PRNGKey(0)
    base = get_model("ptv3", **KW)
    rem = get_model("ptv3", remat=True, **KW)
    variables = base.init(key, xyz, feats, train=False)
    params, bs = variables["params"], variables["batch_stats"]

    def loss_of(model):
        def f(p):
            logits, _ = model.apply(
                {"params": p, "batch_stats": bs}, xyz, feats, train=True,
                rngs={"dropout": jax.random.PRNGKey(7)},
                mutable=["batch_stats"],
            )
            return optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
        return jax.jit(jax.value_and_grad(f))

    lb, gb = loss_of(base)(params)
    lr, gr = loss_of(rem)(params)
    # dropout rng replay under nn.remat keeps train-mode loss identical
    np.testing.assert_allclose(float(lb), float(lr), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(gb), jax.tree.leaves(gr)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6
        )
