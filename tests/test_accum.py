"""Gradient accumulation (train/loop.py::make_accum_train_step): grads are
the mean of per-microbatch grads, BN running stats chain sequentially, one
optimizer update per step."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp
import optax

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.train.loop import (
    create_train_state,
    make_accum_train_step,
    make_train_step,
)


def _batch(b, n=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def _model(dropout=0.5):
    return get_model(
        "pointnet2_ssg", num_classes=5, sa_npoints=(32, 16, 8),
        dropout_rate=dropout,
    )


@pytest.mark.slow
def test_accum_matches_manual_oracle():
    """accum=2 == manual: per-microbatch grads with chained batch_stats,
    averaged, one update. Tolerances admit XLA fusion reassociation (the
    step runs in ONE jit, the oracle in separate jits; near-cancelling
    bias-grad sums differ by ~1e-6 absolute)."""
    model = _model()
    batch = _batch(b=8)
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, opt)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-3)
    from pointcloud_bridge_tpu.train.loop import _loss_fn_for

    loss_fn = _loss_fn_for(cfg.loss)

    # manual two-microbatch oracle
    bs = state.batch_stats
    grad_sum = None
    for i in range(2):
        mb = {k: v[4 * i:4 * (i + 1)] for k, v in batch.items()}

        def f(p, bs=bs, mb=mb, i=i):
            logits, mut = model.apply(
                {"params": p, "batch_stats": bs},
                jnp.asarray(mb["points"]), jnp.asarray(mb["colors"]),
                train=True,
                rngs={"dropout": jax.random.fold_in(key, 0 * 2 + i)},
                mutable=["batch_stats"],
            )
            return loss_fn(
                logits, jnp.asarray(mb["labels"]), jnp.asarray(mb["points"]), cw
            ), mut["batch_stats"]

        (_, bs), grads = jax.value_and_grad(f, has_aux=True)(state.params)
        grad_sum = grads if grad_sum is None else jax.tree.map(
            jnp.add, grad_sum, grads
        )
    mean_grads = jax.tree.map(lambda g: g / 2, grad_sum)
    want_params = optax.apply_updates(
        state.params, jax.tree.map(lambda g: -lr * g, mean_grads)
    )

    step = make_accum_train_step(model, cfg.loss, opt, 2, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    new_state, m = step(state, jb, lr, cw, key)

    # updates are lr*grad ~ 1e-6..1e-4; a wrong averaging (e.g. sum instead
    # of mean) shifts large leaves by ~1e-4, 10x this atol. Measured fusion
    # reassociation on this model: up to ~5e-6 abs on near-cancelling BN
    # bias-grad sums.
    for a, b in zip(jax.tree.leaves(new_state.params),
                    jax.tree.leaves(want_params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-3, atol=1e-5)
    for a, b in zip(jax.tree.leaves(new_state.batch_stats),
                    jax.tree.leaves(bs)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-3, atol=2e-6)
    assert np.isfinite(float(m["loss"]))


@pytest.mark.slow
def test_accum_duplicated_batch_equals_full_step():
    """With the batch's two halves identical and dropout off, BN batch
    moments over 2B duplicated rows equal those over B rows, so the accum
    step's update must equal the full-batch step's update."""
    model = _model(dropout=0.0)
    half = _batch(b=4)
    batch = {k: np.concatenate([v, v], axis=0) for k, v in half.items()}
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, opt)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-3)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}

    full = make_train_step(model, cfg.loss, opt, donate=False)
    s_full, m_full = full(state, jb, lr, cw, key)
    acc = make_accum_train_step(model, cfg.loss, opt, 2, donate=False)
    s_acc, m_acc = acc(state, jb, lr, cw, key)

    np.testing.assert_allclose(float(m_acc["loss"]), float(m_full["loss"]),
                               rtol=1e-5)
    # same reassociation caveat as the oracle test: 8-row vs 4-row
    # reductions sum in different orders
    for a, b in zip(jax.tree.leaves(s_acc.params),
                    jax.tree.leaves(s_full.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-2, atol=1e-5)


@pytest.mark.slow
def test_accum_learns():
    """5 Adam accum steps decrease the loss."""
    model = _model()
    batch = _batch(b=8)
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    # positive-direction transform (the step applies -lr itself)
    opt = optax.scale_by_adam()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, opt)
    step = make_accum_train_step(model, cfg.loss, opt, 4, donate=False)
    jb = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(5)
    losses = []
    for _ in range(5):
        state, m = step(state, jb, jnp.float32(1e-3), cw, key)
        losses.append(float(m["loss"]))
    assert losses[-1] < losses[0], losses
