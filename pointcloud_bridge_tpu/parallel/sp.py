"""Sequence-parallel (SP) execution over the point axis.

Two modes: PTv3 (shard_inputs=True, ring attention over sharded points) and
the neighborhood models (shard_inputs=False, PointNet2 SSG/MSG — replicated
inputs, query-axis sharding inside the model; see models/common.py).

SURVEY §2.9 SP/CP row: shard the N point axis of a block across the mesh so
global attention spans the whole cloud while every device holds only N/P
points. Attention is ring attention (parallel/ring.py, K/V rotate over ICI);
every other PTv3 stage — patch embed, LayerNorms, GEGLU FFN, pos-enc, head —
is pointwise over N and runs on the local shard untouched. Head BatchNorm
moments span the global point axis via the model's `axis_name` collective.

The model must be built with `sp_axis=axis` (ring attention) and, for
training, `axis_name=axis` (cross-shard BN). The param tree is IDENTICAL to
the unsharded model — sp only changes how the same weights are applied — so
checkpoints move freely between modes.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from .. import losses as L
from ..train.loop import TrainState


def make_sp_forward(model, mesh: Mesh, axis: str = "sp",
                    dp_axis: Optional[str] = None,
                    shard_inputs: bool = True):
    """jit'd forward with xyz/feats/logits sharded over the N (point) axis.

    `model` must be constructed with sp_axis=`axis`. dp_axis: composite
    dp x sp on a 2-D mesh — the BATCH axis is additionally sharded over
    `dp_axis` (each dp replica ring-attends over its own shard's points).

    shard_inputs=False is the NEIGHBORHOOD-model mode (PointNet2 family):
    inputs arrive replicated over `axis` (FPS and ball-query sources need
    the full cloud); the model slices the query axis internally
    (models/common.py sp_axis) and all_gathers full logits, so batch
    tensors and logits shard over dp only.
    """

    def per_shard(variables, xyz, feats):
        return model.apply(variables, xyz, feats, train=False)

    bspec = P(dp_axis, axis) if shard_inputs else P(dp_axis)
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), bspec, bspec),
        out_specs=bspec,
        check_vma=False,
    )
    return jax.jit(sharded)


def make_sp_eval_step(model, num_classes: int, mesh: Mesh, axis: str = "sp",
                      shard_inputs: bool = True):
    """Sharded eval for SP models (mirrors parallel/train_step.py's
    make_dp_eval_step signature: (params, batch_stats, batch, class_weights)
    -> (confusion_matrix, loss)).

    shard_inputs=True (PTv3 global / ring attention): points/colors/labels
    shard over the N axis; the per-shard confusion matrix and weighted-CE
    sums psum over the axis so the returned (cm, loss) equal the
    single-device values. shard_inputs=False (neighborhood models, windowed
    PTv3): inputs replicated, the model slices/gathers internally and
    returns FULL logits on every shard, so cm/loss are computed full and
    are identical across shards — no reduction needed.
    """
    from ..utils import metrics as M

    def per_shard(params, batch_stats, batch, class_weights):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, xyz, feats,
            train=False,
        )
        mask = jnp.broadcast_to(batch["mask"][:, None], labels.shape)
        if shard_inputs:
            numer, denom = L.weighted_cross_entropy_sums(
                logits, labels, class_weights, 0.0
            )
            loss = jax.lax.psum(numer, axis) / jnp.maximum(
                jax.lax.psum(denom, axis), 1e-8
            )
            preds = jnp.argmax(logits, axis=-1)
            cm = M.masked_confusion_matrix(preds, labels, mask, num_classes)
            cm = jax.lax.psum(cm, axis)
        else:
            loss = L.weighted_cross_entropy(logits, labels, class_weights)
            preds = jnp.argmax(logits, axis=-1)
            cm = M.masked_confusion_matrix(preds, labels, mask, num_classes)
        return cm, loss

    bspec = P(None, axis) if shard_inputs else P()
    batch_spec = {
        "points": bspec, "colors": bspec, "labels": bspec, "mask": P(),
    }
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), P(), batch_spec, P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, batch_stats, batch, class_weights):
        b = {k: batch[k] for k in ("points", "colors", "labels", "mask")}
        return sharded(params, batch_stats, b, class_weights)

    return jax.jit(step)


def make_sp_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, axis: str = "sp",
    donate: bool = True, dp_axis: Optional[str] = None,
    shard_inputs: bool = True,
):
    """SP train step: points/labels sharded over N, params replicated.

    The loss is computed in decomposed form — per-shard (weighted NLL sum,
    weight sum), psum'd across the axis, divided AFTER — so the global weighted
    mean is exact even when contiguous N-slices have skewed class mixes (pmean
    of per-shard weighted means would bias it; advisor round-2). Because the
    differentiated loss is then the GLOBAL loss on every shard, and psum
    transposes to psum, each local grad is P * its true additive contribution;
    pmean cancels the P and sums the contributions (verified numerically on a
    4-way mesh).

    Only pointwise-decomposable losses are supported: bridge_structure / sol
    read cross-shard xyz statistics (z-centroids over the full cloud) and
    would silently compute per-shard priors — we raise instead. `model` needs
    sp_axis=`axis` AND axis_name=`axis`.

    dp_axis: composite dp x sp on a 2-D (dp, sp) mesh — batch over dp, N
    over sp. The decomposed loss sums psum over BOTH axes (global weighted
    mean over every shard of every example), grads/BN-stats pmean over both,
    and the model must use axis_name=(dp_axis, axis) so BN moments span the
    full (batch x point) extent — exactness vs single-device is asserted in
    tests/test_parallel.py.

    shard_inputs=False (neighborhood models, PointNet2 family): batch
    tensors arrive replicated over `axis` and the model slices/gathers the
    query axis internally, returning FULL logits on every shard. The same
    decomposed-loss algebra holds: the sp-psum scales numerator and
    denominator by P equally (ratio unchanged) and local grads behind the
    model's internal all_gathers are P x their additive contribution, which
    the pmean cancels — exactness vs single-device is asserted in
    tests/test_parallel.py.
    """
    if loss_cfg.name not in ("ce", "weighted_ce"):
        raise ValueError(
            f"loss '{loss_cfg.name}' is not decomposable over N-axis shards "
            "(it reads whole-cloud xyz statistics); SP training supports "
            "ce/weighted_ce only"
        )
    per_shard = _sp_step_body(model, loss_cfg, optimizer, axis, dp_axis)
    bspec = (
        P(dp_axis, axis) if shard_inputs else P(dp_axis)
    )  # dp_axis=None -> batch dim replicated
    batch_spec = {"points": bspec, "colors": bspec, "labels": bspec}
    sharded = shard_map(
        per_shard,
        mesh=mesh,
        in_specs=(P(), batch_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())


def _sp_step_body(model, loss_cfg, optimizer, axis: str, dp_axis):
    """The un-shard_mapped per-shard single-step body, shared by
    make_sp_train_step and make_sp_multi_train_step."""

    def per_shard(state: TrainState, batch, lr, class_weights, rng):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]
        shard_rng = jax.random.fold_in(rng, jax.lax.axis_index(axis))
        if dp_axis:
            shard_rng = jax.random.fold_in(
                shard_rng, jax.lax.axis_index(dp_axis)
            )

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz,
                feats,
                train=True,
                rngs={"dropout": jax.random.fold_in(shard_rng, state.step)},
                mutable=["batch_stats"],
            )
            cw = class_weights if loss_cfg.use_class_weights else None
            numer, denom = L.weighted_cross_entropy_sums(
                logits, labels, cw, loss_cfg.label_smoothing
            )
            axes = (dp_axis, axis) if dp_axis else axis
            numer = jax.lax.psum(numer, axes)
            denom = jax.lax.psum(denom, axes)
            loss = numer / jnp.maximum(denom, 1e-8)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        # compute_loss returns the GLOBAL loss (psum'd numerator); psum
        # transposes to psum, so each local grad is P * its true additive
        # contribution — pmean cancels the P and sums the contributions.
        axes = (dp_axis, axis) if dp_axis else axis
        grads = jax.lax.pmean(grads, axes)
        new_bs = jax.lax.pmean(new_bs, axes)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        acc = jax.lax.pmean(
            jnp.mean((preds == labels).astype(jnp.float32)),
            (dp_axis, axis) if dp_axis else axis,
        )
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "acc": acc}

    return per_shard


def make_sp_multi_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, k: int, axis: str = "sp",
    donate: bool = True, dp_axis: Optional[str] = None,
    shard_inputs: bool = True, ema_decay: float = 0.0,
):
    """K full sequence-parallel optimizer steps in ONE jit/shard_map
    dispatch over a stacked batch ([K, B, N, ...]: K replicated step slots,
    then the usual SP layout — N sharded when shard_inputs, replicated
    otherwise).

    Same contract as train/loop.py::make_multi_train_step (dispatch
    amortization; exactly K sequential make_sp_train_step calls by
    construction — the shared per-shard body threads the state, so the
    decomposed psum'd loss, pmean'd grads/BN stats, and the per-shard
    dropout schedule are all identical). Stacked [K] metrics; ema_decay > 0
    threads an EMA tree through the K steps and changes the signature to
    step(state, ema, batches, lr, class_weights, rng) -> (state, ema, metrics).
    """
    if loss_cfg.name not in ("ce", "weighted_ce"):
        raise ValueError(
            f"loss '{loss_cfg.name}' is not decomposable over N-axis shards "
            "(it reads whole-cloud xyz statistics); SP training supports "
            "ce/weighted_ce only"
        )
    body = _sp_step_body(model, loss_cfg, optimizer, axis, dp_axis)

    def run(state, batches, lr, class_weights, rng, ema=None):
        metrics = []
        for i in range(k):
            b = {key: v[i] for key, v in batches.items()}
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

    bspec = (
        P(None, dp_axis, axis) if shard_inputs else P(None, dp_axis)
    )
    batch_spec = {"points": bspec, "colors": bspec, "labels": bspec}
    if ema_decay > 0.0:
        def per_shard(state, ema, batches, lr, class_weights, rng):
            return run(state, batches, lr, class_weights, rng, ema)

        sharded = shard_map(
            per_shard, mesh=mesh,
            in_specs=(P(), P(), batch_spec, P(), P(), P()),
            out_specs=(P(), P(), P()),
            check_vma=False,
        )
        return jax.jit(sharded, donate_argnums=(0, 1) if donate else ())

    def per_shard(state, batches, lr, class_weights, rng):
        new_state, _, stacked = run(state, batches, lr, class_weights, rng)
        return new_state, stacked

    sharded = shard_map(
        per_shard, mesh=mesh,
        in_specs=(P(), batch_spec, P(), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,) if donate else ())
