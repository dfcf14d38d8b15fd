"""Loss tests, including direct parity checks against torch.nn.functional
(torch CPU is available in the image; it is used only as a test oracle)."""

import numpy as np
import jax
import jax.numpy as jnp

from pointcloud_bridge_tpu import losses


def test_weighted_ce_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(64, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(64,)).astype(np.int64)
    w = rng.uniform(0.5, 3.0, size=(5,)).astype(np.float32)

    got = float(
        losses.weighted_cross_entropy(
            jnp.array(logits), jnp.array(labels), jnp.array(w), label_smoothing=0.2
        )
    )
    want = float(
        F.cross_entropy(
            torch.tensor(logits),
            torch.tensor(labels),
            weight=torch.tensor(w),
            label_smoothing=0.2,
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_weighted_ce_unweighted_matches_torch(rng):
    import torch
    import torch.nn.functional as F

    logits = rng.normal(size=(2, 32, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=(2, 32)).astype(np.int64)
    got = float(losses.weighted_cross_entropy(jnp.array(logits), jnp.array(labels)))
    want = float(
        F.cross_entropy(
            torch.tensor(logits).reshape(-1, 5), torch.tensor(labels).reshape(-1)
        )
    )
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_class_weights_from_counts():
    counts = jnp.array([100.0, 10.0, 10.0, 10.0, 1.0])
    w = np.asarray(losses.class_weights_from_counts(counts))
    assert w.shape == (5,)
    assert (w >= 0.5).all() and (w <= 3.0).all()
    assert w[0] < w[1] <= w[4]  # rarer classes get larger weight


def _bridge_batch(violate: bool):
    """One batch where predicted class z-order is correct or violated."""
    n = 200
    rng = np.random.default_rng(0)
    xyz = rng.uniform(size=(1, n, 3)).astype(np.float32)
    # ground truth: class ordered by z (1 low .. 4 high)
    z = xyz[0, :, 2]
    labels = np.digitize(z, [0.25, 0.5, 0.75]) + 1  # 1..4
    logits = np.full((1, n, 5), -5.0, dtype=np.float32)
    pred = labels.copy()
    if violate:
        # swap predictions of classes 1 and 4 -> hierarchy violation
        pred[labels == 1] = 4
        pred[labels == 4] = 1
    logits[0, np.arange(n), pred] = 5.0
    return jnp.array(logits), jnp.array(labels[None]), jnp.array(xyz)


def test_bridge_structure_loss_penalizes_violation():
    lo_logits, labels, xyz = _bridge_batch(violate=False)
    hi_logits, _, _ = _bridge_batch(violate=True)
    lo = float(losses.bridge_structure_loss(lo_logits, labels, xyz, alpha=80.0))
    hi = float(losses.bridge_structure_loss(hi_logits, labels, xyz, alpha=80.0))
    assert hi > lo


def test_sol_loss_penalizes_violation():
    # SOL uses class order 0..3 = abutment..parapet
    n = 200
    rng = np.random.default_rng(1)
    xyz = rng.uniform(size=(1, n, 3)).astype(np.float32)
    z = xyz[0, :, 2]
    labels = np.digitize(z, [0.25, 0.5, 0.75])  # 0..3
    good = np.full((1, n, 5), -5.0, dtype=np.float32)
    good[0, np.arange(n), labels] = 5.0
    bad = good.copy()
    swapped = labels.copy()
    swapped[labels == 0] = 3
    swapped[labels == 3] = 0
    bad[:] = -5.0
    bad[0, np.arange(n), swapped] = 5.0
    l_good = float(
        losses.sol_loss(jnp.array(good), jnp.array(labels[None]), jnp.array(xyz))
    )
    l_bad = float(
        losses.sol_loss(jnp.array(bad), jnp.array(labels[None]), jnp.array(xyz))
    )
    assert l_bad > l_good


def test_feature_transform_regularizer():
    eye = jnp.tile(jnp.eye(3)[None], (4, 1, 1))
    assert float(losses.feature_transform_regularizer(eye)) < 1e-6
    skew = eye * 2.0
    assert float(losses.feature_transform_regularizer(skew)) > 1.0
