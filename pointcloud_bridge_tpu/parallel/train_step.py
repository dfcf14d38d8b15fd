"""Data-parallel train/eval steps via shard_map over a 1-D mesh.

Inside shard_map the mesh axis is a named axis, so:
  - BatchNorm built with axis_name='data' computes cross-replica statistics
    (flax psums mean/var), giving sync-BN semantics matching single-device
    math (SURVEY.md §7 hard part #4);
  - gradients and losses are pmean'd over the axis;
  - each replica's dropout stream is decorrelated by folding in axis_index.

Parameters and optimizer state are replicated (models are <8M params, the
batch is the only thing worth sharding — SURVEY.md §2.9); XLA inserts the
all-reduces over ICI.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..train.loop import TrainState, _loss_fn_for
from ..utils import metrics as M


def make_dp_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, axis: str = "data", donate: bool = True
):
    """Returns step(state, sharded_batch, lr, class_weights, rng) -> (state, metrics).

    `model` must be constructed with axis_name=`axis` for sync-BN.
    """
    loss_fn = _loss_fn_for(loss_cfg)

    def per_shard(state: TrainState, batch, lr, class_weights, rng):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz,
                feats,
                train=True,
                rngs={"dropout": jax.random.fold_in(shard_rng, state.step)},
                mutable=["batch_stats"],
            )
            loss = loss_fn(logits, labels, xyz, class_weights)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        grads = jax.lax.pmean(grads, axis)
        loss = jax.lax.pmean(loss, axis)
        # BatchNorm stats were already cross-replica (axis_name), but pmean is
        # a cheap no-op-safe guard for models without BN sync.
        new_bs = jax.lax.pmean(new_bs, axis)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        acc = jax.lax.pmean(
            jnp.mean((preds == labels).astype(jnp.float32)), axis
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "acc": acc}

    batch_spec = {
        "points": P(axis),
        "colors": P(axis),
        "labels": P(axis),
        "mask": P(axis),
        "block_ids": P(axis),
    }
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), batch_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_eval_step(model, num_classes: int, mesh: Mesh, axis: str = "data"):
    """Sharded eval: per-shard forward + confusion matrix, psum'd over the mesh."""

    def per_shard(params, batch_stats, batch, class_weights):
        from .. import losses as L

        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, xyz, feats, train=False
        )
        loss = L.weighted_cross_entropy(logits, labels, class_weights)
        preds = jnp.argmax(logits, axis=-1)
        mask = jnp.broadcast_to(batch["mask"][:, None], labels.shape)
        cm = M.masked_confusion_matrix(preds, labels, mask, num_classes)
        return jax.lax.psum(cm, axis), jax.lax.pmean(loss, axis)

    batch_spec = {
        "points": P(axis),
        "colors": P(axis),
        "labels": P(axis),
        "mask": P(axis),
        "block_ids": P(axis),
    }
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded)
