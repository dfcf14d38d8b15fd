"""Segmentation losses (SURVEY.md §2.3).

  - weighted_cross_entropy: CE with per-class weights + label smoothing
    (train_PTV3.py:389-399, train_MulSca_PN2.py:321-335).
  - class_weights_from_counts: inverse-frequency weights clamped to [0.5, 3.0]
    (train_PTV3.py:402-421).
  - bridge_structure_loss: z-hierarchy prior {abutment(1) < girder(2) <
    deck(3) < parapet(4)} shaping the CE class weights
    (Highway_bridge/models/model.py:169-263).
  - sol_loss: Partsize structure-oriented loss — per-sample existence and
    pairwise z-order violation penalties on the CE weights
    (Partsize-identical/models/pointnet2_sem_seg_msg.py:45-181; class order
    abutment0/girder1/deck2/parapet3).
  - feature_transform_regularizer: ||I - A A^T|| on TNet outputs
    (Highway_bridge/models/pointnet.py:176-187).

All losses take LOGITS [B, N, C] (the reference mixes logits and log-probs);
weight-shaping terms use stop_gradient'd argmax predictions, matching the
reference where `argmax` cuts the gradient anyway (SURVEY.md §7 hard part).

Design delta (documented): bridge_structure_loss computes masked per-class
z-centroids with true masked min/max normalization; the reference zeroes
non-class points before amin/amax (model.py:189-196) which silently mixes the
origin into the range. Capability (z-ordering prior) is identical.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def weighted_cross_entropy(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
) -> jax.Array:
    """Mean weighted cross entropy over all points.

    Args:
      logits: [..., C]; labels: int [...]; class_weights: [C] or None.
    Matches torch.nn.functional.cross_entropy(weight=..., label_smoothing=...)
    semantics: per-sample losses are weighted by the true-class weight and the
    mean is normalized by the total weight.
    """
    c = logits.shape[-1]
    logits = logits.reshape(-1, c).astype(jnp.float32)
    labels = labels.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / c
    if class_weights is None:
        return jnp.mean(-jnp.sum(onehot * logp, axis=-1))
    # torch semantics: the class weight applies INSIDE the smoothed target sum
    # (-sum_c q_c * w_c * logp_c) and mean-reduction normalizes by the summed
    # TRUE-class weights.
    w = jnp.asarray(class_weights, jnp.float32)
    nll = -jnp.sum(onehot * w[None, :] * logp, axis=-1)
    return jnp.sum(nll) / jnp.maximum(jnp.sum(w[labels]), 1e-8)


def weighted_cross_entropy_sums(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    label_smoothing: float = 0.0,
) -> tuple:
    """Decomposed weighted CE: returns (weighted NLL sum, weight sum).

    `weighted_cross_entropy == sum(numer)/sum(denom)`; sharded callers (SP over
    the point axis, parallel/sp.py) psum both pieces across the mesh axis and
    divide AFTER, so non-uniform per-shard class mixes don't bias the mean —
    pmean of per-shard weighted means would (advisor round-2 finding).
    """
    c = logits.shape[-1]
    logits = logits.reshape(-1, c).astype(jnp.float32)
    labels = labels.reshape(-1)
    logp = jax.nn.log_softmax(logits, axis=-1)
    onehot = jax.nn.one_hot(labels, c, dtype=jnp.float32)
    if label_smoothing > 0.0:
        onehot = onehot * (1.0 - label_smoothing) + label_smoothing / c
    if class_weights is None:
        nll = -jnp.sum(onehot * logp, axis=-1)
        return jnp.sum(nll), jnp.float32(labels.shape[0])
    w = jnp.asarray(class_weights, jnp.float32)
    nll = -jnp.sum(onehot * w[None, :] * logp, axis=-1)
    return jnp.sum(nll), jnp.sum(w[labels])


def class_weights_from_counts(
    counts: jax.Array, clip_min: float = 0.5, clip_max: float = 3.0
) -> jax.Array:
    """Inverse-frequency class weights: total / (counts * C), clamped to
    [0.5, 3.0] — exact formula from train_PTV3.py:402-421.
    counts: [C] label histogram."""
    counts = jnp.asarray(counts, jnp.float32) + 1e-6
    c = counts.shape[0]
    weights = jnp.sum(counts) / (counts * c)
    return jnp.clip(weights, clip_min, clip_max)


def _masked_norm_z_mean(xyz: jax.Array, mask: jax.Array) -> jax.Array:
    """Mean normalized z of masked points per batch element.

    xyz: [B, N, 3], mask: [B, N] bool -> [B]. Batches with no masked point
    yield 0 (reference returns zeros when mask is empty, model.py:216).
    """
    z = xyz[..., 2]
    big = jnp.float32(1e9)
    zmin = jnp.min(jnp.where(mask, z, big), axis=1)
    zmax = jnp.max(jnp.where(mask, z, -big), axis=1)
    rng = jnp.maximum(zmax - zmin, 1e-7)
    zn = (z - zmin[:, None]) / rng[:, None]
    cnt = jnp.sum(mask, axis=1)
    mean = jnp.sum(jnp.where(mask, zn, 0.0), axis=1) / jnp.maximum(cnt, 1)
    return jnp.where(cnt > 0, mean, 0.0)


# hierarchy: class -> list of classes that must lie BELOW it (model.py:176-181)
_BSL_ABOVE = {1: (), 2: (1,), 3: (1, 2), 4: (1, 2, 3)}


def bridge_structure_loss(
    logits: jax.Array,
    labels: jax.Array,
    xyz: jax.Array,
    alpha: float = 20.0,
    rel_margin: float = 0.2,
    base_weights: Optional[jax.Array] = None,
    num_classes: int = 5,
) -> jax.Array:
    """Hierarchy-prior weighted CE (model.py:169-263).

    For each ordered pair (upper, lower) in the bridge hierarchy, a ReLU
    margin violation of the predicted z-centroids adds alpha-scaled weight to
    both classes (full on the violating class, 0.5x on the class it should sit
    above, 0.3x on the class it should sit below — model.py:229-246). Class 0
    gets alpha * (1 - predicted-other fraction). Final per-class weight is the
    batch mean times inverse-sqrt label-frequency weights with classes 1 and 4
    doubled; CE uses label_smoothing=0.2.
    """
    b = labels.shape[0]
    if base_weights is None:
        base_weights = jnp.array([1.5, 1.0, 1.2, 1.5, 1.0], jnp.float32)
    preds = jax.lax.stop_gradient(jnp.argmax(logits, axis=-1))
    xyz = jax.lax.stop_gradient(xyz)

    weights = jnp.tile(base_weights[None, :], (b, 1))  # [B, C]

    exists = {
        c: jnp.any(labels == c, axis=1) for c in (1, 2, 3, 4)
    }  # GT existence per batch elem [B]
    rel = {c: _masked_norm_z_mean(xyz, preds == c) for c in (1, 2, 3, 4)}

    for cid in (1, 2, 3, 4):
        for lower in _BSL_ABOVE[cid]:
            gate = (exists[cid] & exists[lower]).astype(jnp.float32)
            violation = jax.nn.relu(-(rel[cid] - rel[lower]) + rel_margin) * gate
            # 'above' direction: cid should be above lower
            weights = weights.at[:, cid].add(alpha * violation)
            weights = weights.at[:, lower].add(alpha * violation * 0.5)
            # 'below' direction (same pair seen from the lower class,
            # model.py:238-246): lower sits below cid.
            weights = weights.at[:, lower].add(alpha * violation)
            weights = weights.at[:, cid].add(alpha * violation * 0.3)

    other_frac = jnp.mean((preds == 0).astype(jnp.float32), axis=1)
    weights = weights.at[:, 0].add(alpha * (1.0 - other_frac))

    counts = jnp.bincount(labels.reshape(-1), length=num_classes).astype(
        jnp.float32
    )
    counts = jnp.maximum(counts, 1.0)
    freq_w = 1.0 / jnp.sqrt(counts)
    freq_w = freq_w.at[1].mul(2.0).at[4].mul(2.0)

    final_w = jnp.mean(weights, axis=0) * freq_w
    return weighted_cross_entropy(logits, labels, final_w, label_smoothing=0.2)


def sol_loss(
    logits: jax.Array,
    labels: jax.Array,
    xyz: jax.Array,
    a: float = 200.0,
    num_classes: int = 5,
) -> jax.Array:
    """Structure-oriented loss (Partsize pointnet2_sem_seg_msg.py:45-181).

    Per batch element: weights start at 1; +a for a class predicted but absent
    in GT; +k*a (k = hierarchy distance 1/2/3) to both classes of each pair
    whose GT z-order (abutment < girder < deck < parapet along z) is violated
    by the prediction. Each element's weighted CE over the WHOLE batch is
    summed (the reference computes CE on the full flattened batch per element;
    we keep that semantics — it scales the loss by B with per-element weights).
    """
    b = labels.shape[0]
    preds = jax.lax.stop_gradient(jnp.argmax(logits, axis=-1))
    xyz = jax.lax.stop_gradient(xyz)
    z = xyz[..., 2]

    def centers(lbl):
        # mean raw z per class [B, 4]; exists flags [B, 4]
        cs, ex = [], []
        for c in range(4):
            m = lbl == c
            cnt = jnp.sum(m, axis=1)
            mean = jnp.sum(jnp.where(m, z, 0.0), axis=1) / jnp.maximum(cnt, 1)
            cs.append(mean)
            ex.append(cnt > 0)
        return jnp.stack(cs, -1), jnp.stack(ex, -1)

    gt_c, gt_e = centers(labels)
    pr_c, pr_e = centers(preds)

    weights = jnp.ones((b, num_classes), jnp.float32)
    # spurious prediction: class absent in GT but present in prediction
    for c in range(4):
        spurious = (~gt_e[:, c]) & pr_e[:, c]
        weights = weights.at[:, c].add(a * spurious.astype(jnp.float32))

    pairs = [  # (low, high, level)
        (0, 1, 1), (1, 2, 1), (2, 3, 1),
        (0, 2, 2), (1, 3, 2),
        (0, 3, 3),
    ]
    for lo, hi, lvl in pairs:
        both = gt_e[:, lo] & pr_e[:, lo] & gt_e[:, hi] & pr_e[:, hi]
        violated = (gt_c[:, lo] < gt_c[:, hi]) & (pr_c[:, lo] >= pr_c[:, hi])
        add = (both & violated).astype(jnp.float32) * (lvl * a)
        weights = weights.at[:, lo].add(add)
        weights = weights.at[:, hi].add(add)

    def one(w):
        return weighted_cross_entropy(logits, labels, w)

    return jnp.sum(jax.vmap(one)(weights))


def dice_loss(logits: jax.Array, labels: jax.Array, eps: float = 1e-6) -> jax.Array:
    """Soft multi-class Dice loss: 1 - mean_c (2*|p∩t| / (|p|+|t|)).

    The reference declares a CombinedLoss referencing an undefined DiceLoss
    (train_PTV3.py:423-444, dead path); this is the working implementation.
    """
    c = logits.shape[-1]
    probs = jax.nn.softmax(logits.reshape(-1, c), axis=-1)
    onehot = jax.nn.one_hot(labels.reshape(-1), c, dtype=probs.dtype)
    inter = jnp.sum(probs * onehot, axis=0)
    denom = jnp.sum(probs, axis=0) + jnp.sum(onehot, axis=0)
    dice = (2.0 * inter + eps) / (denom + eps)
    return 1.0 - jnp.mean(dice)


def combined_ce_dice_loss(
    logits: jax.Array,
    labels: jax.Array,
    class_weights: Optional[jax.Array] = None,
    alpha: float = 0.8,
) -> jax.Array:
    """alpha * CE + (1 - alpha) * Dice (train_PTV3.py CombinedLoss contract)."""
    ce = weighted_cross_entropy(logits, labels, class_weights)
    return alpha * ce + (1.0 - alpha) * dice_loss(logits, labels)


def feature_transform_regularizer(trans: jax.Array) -> jax.Array:
    """||I - A A^T||_F mean over the batch (pointnet.py:176-187)."""
    d = trans.shape[-1]
    eye = jnp.eye(d, dtype=trans.dtype)
    diff = eye[None] - jnp.einsum(
        "bij,bkj->bik", trans, trans, preferred_element_type=jnp.float32
    )
    return jnp.mean(jnp.linalg.norm(diff, axis=(1, 2)))
