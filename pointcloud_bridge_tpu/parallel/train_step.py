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


def _dp_step_body(model, loss_fn, optimizer, axis: str):
    """The un-shard_mapped per-shard single-step body, shared by
    make_dp_train_step and make_dp_multi_train_step (K-step dispatch is K of
    EXACTLY this)."""

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

    return per_shard


def _dp_batch_spec(axis: str, lead_dims: int = 0):
    """PartitionSpec dict for a batch; lead_dims=1 for the stacked [K, B, ...]
    multi-step layout (K replicated, B sharded)."""
    spec = P(*([None] * lead_dims + [axis]))
    return {
        "points": spec,
        "colors": spec,
        "labels": spec,
        "mask": spec,
        "block_ids": spec,
    }


def make_dp_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, axis: str = "data", donate: bool = True
):
    """Returns step(state, sharded_batch, lr, class_weights, rng) -> (state, metrics).

    `model` must be constructed with axis_name=`axis` for sync-BN.
    """
    per_shard = _dp_step_body(model, _loss_fn_for(loss_cfg), optimizer, axis)
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), _dp_batch_spec(axis), P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def make_dp_multi_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, k: int, axis: str = "data",
    donate: bool = True, ema_decay: float = 0.0,
):
    """K full data-parallel optimizer steps in ONE jit/shard_map dispatch
    over a stacked batch sharded on its SECOND dim ([K, B, ...]: K
    replicated step slots, B sharded over the mesh).

    Same contract as train/loop.py::make_multi_train_step (dispatch
    amortization; exactly K sequential make_dp_train_step calls by
    construction — the shared per-shard body threads the state, so sync-BN,
    pmean'd grads/metrics, and the per-replica dropout schedule are all
    identical), with the same stacked [K] metrics and the same optional EMA
    threading: ema_decay > 0 changes the signature to
    step(state, ema, batches, lr, class_weights, rng) -> (state, ema, metrics).
    """
    body = _dp_step_body(model, _loss_fn_for(loss_cfg), optimizer, axis)

    def run(state, batches, lr, class_weights, rng, ema=None):
        metrics = []
        for i in range(k):
            b = {key: v[i] for key, v in batches.items()
                 if key in ("points", "colors", "labels")}
            state, m = body(state, b, lr, class_weights, rng)
            if ema is not None:
                ema = jax.tree.map(
                    lambda e, p: ema_decay * e + (1.0 - ema_decay) * p,
                    ema, state.params,
                )
            metrics.append(m)
        stacked = {
            key: jnp.stack([m[key] for m in metrics]) for key in metrics[0]
        }
        return state, ema, stacked

    spec = _dp_batch_spec(axis, lead_dims=1)
    if ema_decay > 0.0:
        def per_shard(state, ema, batches, lr, class_weights, rng):
            return run(state, batches, lr, class_weights, rng, ema)

        sharded = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), spec, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())

    def per_shard(state, batches, lr, class_weights, rng):
        new_state, _, stacked = run(state, batches, lr, class_weights, rng)
        return new_state, stacked

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), spec, P(), P(), P()),
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
