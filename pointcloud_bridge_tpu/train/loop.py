"""Training engine: functional train/eval steps under jit + the epoch loop.

Mirrors the reference trainer skeleton (SURVEY.md §3.1): timestamped
experiment dir, logger + scalar writer, code snapshot, Adam(wd=1e-4),
per-epoch validation with per-class accuracy, best/latest checkpoints.

TPU-first deltas: one fused jitted train step (forward+backward+update,
buffers donated), loss/optimizer as pure functions, lr fed in as a scalar so
host-side schedulers (plateau/cosine/step) need no re-jit, confusion matrices
accumulated on device.
"""

from __future__ import annotations

import os
import time
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax import struct
from flax.core import FrozenDict

from .. import losses as L
from ..config import Config
from ..models import get_model
from ..utils import metrics as M
from ..utils.checkpoint import (
    checkpoint_keys,
    restore_checkpoint,
    save_checkpoint,
)
from ..utils.logging import ScalarWriter, initialize_logger, snapshot_code
from .schedules import ReduceLROnPlateau, cosine_lr, step_decay_lr


class TrainState(struct.PyTreeNode):
    step: jax.Array
    params: Any
    batch_stats: Any
    opt_state: Any


def make_optimizer(weight_decay: float = 1e-4) -> optax.GradientTransformation:
    """torch.optim.Adam(betas=(0.9, 0.999), weight_decay=wd) equivalent:
    L2 folded into the gradient BEFORE the Adam moments (not AdamW)."""
    return optax.chain(
        optax.add_decayed_weights(weight_decay),
        optax.scale_by_adam(b1=0.9, b2=0.999),
    )


def create_train_state(
    model,
    rng: jax.Array,
    sample_batch: Dict[str, np.ndarray],
    optimizer: optax.GradientTransformation,
) -> TrainState:
    xyz = jnp.asarray(sample_batch["points"][:1])
    feats = jnp.asarray(sample_batch["colors"][:1])
    variables = model.init({"params": rng, "dropout": rng}, xyz, feats, train=False)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", FrozenDict())
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=optimizer.init(params),
    )


def prefetch_to_device(batch_iter, put: Callable, size: int = 2):
    """Async double-buffered input feed (SURVEY §2.4; reference comparator:
    DataLoader(num_workers=6, pin_memory) in train_MulSca_PN2.py:92-106).

    A daemon thread converts + device_puts batch N+1..N+size while step N
    runs, so host->device transfer (one ~50 ms relay round trip per batch
    here) overlaps device compute instead of serializing with it. size=2 is
    classic double buffering; 0/1 disables. Worker exceptions re-raise at the
    consuming iteration.
    """
    if size <= 1:
        for b in batch_iter:
            yield put(b)
        return
    import queue
    import threading

    q: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()

    def worker():
        try:
            for b in batch_iter:
                q.put(put(b))
        except BaseException as e:  # noqa: BLE001 - re-raised in consumer
            q.put(("__prefetch_error__", e))
        q.put(sentinel)

    threading.Thread(target=worker, daemon=True).start()
    while True:
        item = q.get()
        if item is sentinel:
            return
        if isinstance(item, tuple) and len(item) == 2 and item[0] == "__prefetch_error__":
            raise item[1]
        yield item


def group_batches(batch_iter, k: int):
    """Stack consecutive same-shape numpy batches into [k, ...] dicts for
    make_multi_train_step. A shape change (the ragged final batch of an
    epoch) flushes the buffer un-stacked, and leftovers at iterator end pass
    through un-stacked — the caller dispatches on points.ndim (4 = stacked)."""
    buf = []
    for b in batch_iter:
        if buf and any(
            np.shape(b[key]) != np.shape(buf[0][key]) for key in buf[0]
        ):
            yield from buf
            buf = []
        buf.append(b)
        if len(buf) == k:
            yield {key: np.stack([x[key] for x in buf]) for key in buf[0]}
            buf = []
    yield from buf


def _loss_fn_for(loss_cfg) -> Callable:
    """Returns loss(logits, labels, xyz, class_weights) -> scalar."""
    name = loss_cfg.name

    def fn(logits, labels, xyz, class_weights):
        if name in ("ce", "weighted_ce"):
            cw = class_weights if loss_cfg.use_class_weights else None
            return L.weighted_cross_entropy(
                logits, labels, cw, loss_cfg.label_smoothing
            )
        if name == "bridge_structure":
            return L.bridge_structure_loss(
                logits,
                labels,
                xyz,
                alpha=loss_cfg.alpha,
                rel_margin=loss_cfg.rel_margin,
            )
        if name == "sol":
            return L.sol_loss(logits, labels, xyz)
        raise ValueError(f"unknown loss '{name}'")

    return fn


def _step_body(model, loss_fn, optimizer):
    """The un-jitted single-train-step body shared by make_train_step and
    make_multi_train_step (so K-step dispatch is K of EXACTLY this)."""

    def step(state: TrainState, batch, lr, class_weights, rng):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz,
                feats,
                train=True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
                mutable=["batch_stats"],
            )
            loss = loss_fn(logits, labels, xyz, class_weights)
            return loss, (logits, mutated["batch_stats"])

        (loss, (logits, new_bs)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        preds = jnp.argmax(logits, axis=-1)
        acc = jnp.mean((preds == labels).astype(jnp.float32))
        new_state = TrainState(
            step=state.step + 1,
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
        )
        return new_state, {"loss": loss, "acc": acc}

    return step


def make_train_step(model, loss_cfg, optimizer, donate: bool = True):
    step = _step_body(model, _loss_fn_for(loss_cfg), optimizer)
    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_train_step(
    model, loss_cfg, optimizer, k: int, donate: bool = True,
    ema_decay: float = 0.0,
):
    """K FULL optimizer steps in ONE jit dispatch over a stacked batch
    ({points: [K, B, ...], colors: [K, B, ...], labels: [K, B, ...]}).

    No reference counterpart (torch eager pays per-op dispatch either way).
    Motivation is dispatch amortization: the SSG step's device compute is
    ~5 ms but each dispatch costs ~7 ms of relay overhead in the host loop
    (bench/trainbreak.py round-4 accounting) — and even on directly-attached
    hosts one enqueue + one K-sized H2D transfer beats K of each. Exactly K
    sequential make_train_step steps by construction: the same _step_body
    runs K times with the state threaded through, state.step increments
    inside, and the dropout key is fold_in(rng, state.step) per inner step —
    the identical key schedule the single-step loop produces.

    The inner loop is UNROLLED python (static K), not lax.scan: Pallas
    kernels mis-compile inside scan bodies on this stack (CLAUDE.md).

    Metrics come back stacked [K] per key so per-step logging is preserved.
    ema_decay > 0 additionally threads an EMA param tree through the K
    steps (decay applied after EVERY inner step, matching the outer
    per-step ema_update exactly); the step then takes and returns that tree:
    (state, ema) , batches, ... -> (state, ema, metrics).
    """
    body = _step_body(model, _loss_fn_for(loss_cfg), optimizer)

    def run(state: TrainState, batches, lr, class_weights, rng, ema=None):
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

    if ema_decay > 0.0:
        def step(state, ema, batches, lr, class_weights, rng):
            return run(state, batches, lr, class_weights, rng, ema)

        return jax.jit(step, donate_argnums=(0, 1) if donate else ())

    def step(state, batches, lr, class_weights, rng):
        new_state, _, stacked = run(state, batches, lr, class_weights, rng)
        return new_state, stacked

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_accum_train_step(
    model, loss_cfg, optimizer, accum_steps: int, donate: bool = True
):
    """Gradient-accumulation train step: the [B, ...] batch splits into
    `accum_steps` equal microbatches; grads average across them and the
    optimizer applies ONE update — effective batch B at 1/accum_steps the
    activation memory. No reference counterpart (the reference trains at
    batch 16 single-GPU); standard accumulation semantics: BatchNorm batch
    moments are per-microbatch and the running stats chain sequentially
    (exactly what a sequential small-batch run does to them), while the
    update uses the full-batch mean gradient (mean of equal-size microbatch
    means == the full-batch mean for per-point mean losses).

    Microbatches run as an UNROLLED python loop inside one jit: iteration
    count is static, and Pallas kernels mis-compile inside lax.scan bodies
    on this stack (CLAUDE.md).
    """
    loss_fn = _loss_fn_for(loss_cfg)

    def step(state: TrainState, batch, lr, class_weights, rng):
        def micro(i, bs_in):
            mb = {
                k: jnp.reshape(
                    v, (accum_steps, v.shape[0] // accum_steps) + v.shape[1:]
                )[i]
                for k, v in batch.items()
                if k in ("points", "colors", "labels")
            }

            def compute_loss(params):
                logits, mutated = model.apply(
                    {"params": params, "batch_stats": bs_in},
                    mb["points"], mb["colors"], train=True,
                    rngs={"dropout": jax.random.fold_in(
                        rng, state.step * accum_steps + i
                    )},
                    mutable=["batch_stats"],
                )
                loss = loss_fn(logits, mb["labels"], mb["points"], class_weights)
                return loss, (logits, mutated["batch_stats"])

            (loss, (logits, bs_out)), grads = jax.value_and_grad(
                compute_loss, has_aux=True
            )(state.params)
            acc = jnp.mean(
                (jnp.argmax(logits, -1) == mb["labels"]).astype(jnp.float32)
            )
            return loss, acc, grads, bs_out

        bs = state.batch_stats
        losses, accs, grad_sum = [], [], None
        for i in range(accum_steps):
            loss, acc, grads, bs = micro(i, bs)
            losses.append(loss)
            accs.append(acc)
            grad_sum = grads if grad_sum is None else jax.tree.map(
                jnp.add, grad_sum, grads
            )
        grads = jax.tree.map(lambda g: g / accum_steps, grad_sum)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        new_state = TrainState(
            step=state.step + 1, params=new_params,
            batch_stats=bs, opt_state=new_opt,
        )
        return new_state, {
            "loss": jnp.mean(jnp.stack(losses)),
            "acc": jnp.mean(jnp.stack(accs)),
        }

    return jax.jit(step, donate_argnums=(0,) if donate else ())


def make_multi_eval_step(eval_step, k: int):
    """K eval batches in ONE jit dispatch: slices a stacked [K, B, ...]
    batch dict and calls the per-batch `eval_step` K times (jit-of-jit
    inlines, so this wraps the single-device, dp, AND sp eval steps alike —
    their shard_maps partition each slice exactly as before). Returns the
    K-summed confusion matrix and stacked [K] losses. Same dispatch
    amortization rationale as make_multi_train_step."""

    def step(params, batch_stats, batches, class_weights):
        cm_sum, losses = None, []
        for i in range(k):
            b = {key: v[i] for key, v in batches.items()}
            cm, loss = eval_step(params, batch_stats, b, class_weights)
            cm_sum = cm if cm_sum is None else cm_sum + cm
            losses.append(loss)
        return cm_sum, jnp.stack(losses)

    return jax.jit(step)


def make_eval_step(model, num_classes: int):
    def step(params, batch_stats, batch, class_weights):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, xyz, feats, train=False
        )
        loss = L.weighted_cross_entropy(logits, labels, class_weights)
        preds = jnp.argmax(logits, axis=-1)
        mask = jnp.broadcast_to(batch["mask"][:, None], labels.shape)
        cm = M.masked_confusion_matrix(preds, labels, mask, num_classes)
        return cm, loss

    return jax.jit(step)


def train(
    config: Config,
    train_ds,
    val_ds=None,
    exp_dir: Optional[str] = None,
    model=None,
    resume: bool = False,
) -> Dict[str, Any]:
    """Full training run. Returns {history, best_val_acc, exp_dir, state}.

    resume=True warm-starts from `exp_dir/latest_checkpoint` when present
    (Partsize train.py:86-94 warm-start / latest-resume semantics); the epoch
    counter continues from the stored epoch.
    """
    tcfg, mcfg = config.train, config.model
    if exp_dir is None:
        ts = time.strftime("%m%d%H%M")
        exp_dir = os.path.join(config.exp_dir_root, f"exp_{ts}_{config.case}")
    os.makedirs(exp_dir, exist_ok=True)
    logger = initialize_logger(exp_dir)
    writer = ScalarWriter(exp_dir)
    try:
        snapshot_code(exp_dir)
    except Exception:
        pass

    # device mesh (config.parallel.num_devices: 0 = single-device, >1 or -1
    # = a mesh over that many / all devices; SURVEY.md §2.9). mode selects
    # the parallelism: "dp" shards the batch, "sp" shards the N point axis
    # (parallel/sp.py; ring attention or query-axis sharding per model).
    ndev_req = config.parallel.num_devices
    n_avail = len(jax.devices())
    use_mesh = (ndev_req == -1 and n_avail > 1) or ndev_req > 1
    par_mode = config.parallel.mode if use_mesh else "none"
    if par_mode not in ("none", "dp", "sp", "fsdp", "pp", "tp", "ep"):
        raise ValueError(f"unknown parallel.mode '{par_mode}'")
    spd = max(1, int(getattr(tcfg, "steps_per_dispatch", 1)))
    multi_step = None
    if spd > 1 and getattr(tcfg, "accum_steps", 1) > 1:
        raise ValueError(
            "steps_per_dispatch and accum_steps are mutually exclusive"
        )
    mesh = None
    sp_model = None
    sp_shard_inputs = True
    if use_mesh:
        from ..parallel import make_mesh

        ndev = n_avail if ndev_req == -1 else min(ndev_req, n_avail)
        if par_mode in ("tp", "ep"):
            # 2-D (data, model/expert) meshes: the batch shards over data
            from ..parallel import make_2d_mesh, make_ep_mesh

            knob = "tp_axis_size" if par_mode == "tp" else "ep_axis_size"
            ax2 = max(1, int(getattr(config.parallel, knob)))
            if ndev % ax2:
                raise ValueError(f"{knob} {ax2} must divide {ndev} devices")
            dp_size = ndev // ax2
            if tcfg.batch_size % dp_size:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} must divide the data "
                    f"axis ({dp_size} of the {dp_size}x{ax2} mesh)"
                )
            mk2 = make_2d_mesh if par_mode == "tp" else make_ep_mesh
            mesh = mk2(dp_size, ax2)
        else:
            mesh = make_mesh(ndev, config.parallel.data_axis)
        if par_mode in ("dp", "fsdp") and tcfg.batch_size % ndev:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must divide the mesh size {ndev}"
            )
        if par_mode not in ("fsdp", "pp", "tp", "ep"):
            # dp/sp run the model inside shard_map, so BN syncs via pmean
            # over the named axis. fsdp is plain jit + GSPMD: the body is the
            # logical single-device program, so BN's batch-axis mean is
            # already GLOBAL (XLA inserts the collective for the sharded
            # batch) and a named-axis pmean would hit an unbound axis; tp
            # is GSPMD the same way. pp replicates the batch per stage
            # (pp.py::_head owns the one BN on that path), so the canonical
            # model needs no axis either.
            mcfg.extra.setdefault("axis_name", config.parallel.data_axis)

    if model is None:
        model = get_model(mcfg.name, mcfg.num_classes, **mcfg.extra)
    if par_mode == "sp":
        if getattr(tcfg, "accum_steps", 1) > 1:
            raise ValueError("accum_steps is not supported with parallel.mode=sp")
        forced = config.parallel.sp_shard_inputs
        if forced in (0, 1):
            sp_shard_inputs = bool(forced)
        else:
            # ptv3-family GLOBAL attention shards inputs over N (ring
            # attention); neighborhood models and windowed PTv3 use the
            # full-input contract (the model slices the query axis itself)
            sp_shard_inputs = (
                mcfg.name in ("ptv3", "ptv3_moe")
                and not mcfg.extra.get("window_size")
            )
        # the sp twin applies the SAME param tree with the axis threaded
        # (sp.py docstring); `model` (no sp_axis) stays for init/checkpoints
        sp_model = get_model(
            mcfg.name, mcfg.num_classes,
            **dict(mcfg.extra, sp_axis=config.parallel.data_axis),
        )
    optimizer = make_optimizer(tcfg.weight_decay)
    rng = jax.random.PRNGKey(tcfg.seed)

    sample = next(iter(train_ds.batches(tcfg.batch_size, shuffle=False)))
    state = create_train_state(model, rng, sample, optimizer)
    start_epoch = 1
    if resume:
        # latest first, best_model as warm-start fallback
        # (Partsize train.py:86-94 tries checkpoints/best_model.pth)
        ckpt_path = os.path.join(exp_dir, "latest_checkpoint")
        if not os.path.exists(ckpt_path):
            ckpt_path = os.path.join(exp_dir, "best_model")
        if os.path.exists(ckpt_path):
            # Positively detect params-only checkpoints (tools/import_ckpt
            # torch migrations, deployed best_model trees) by inspecting the
            # stored top-level keys — NOT by catching restore exceptions,
            # which would silently convert a genuine resume failure (e.g. an
            # opt_state structure mismatch after an optimizer change) into a
            # fresh-optimizer warm start (ADVICE r4). A real mismatch now
            # fails loudly.
            stored = checkpoint_keys(ckpt_path)
            if "opt_state" in stored:
                restored = restore_checkpoint(
                    ckpt_path,
                    {
                        "params": state.params,
                        "batch_stats": state.batch_stats,
                        "opt_state": state.opt_state,
                    },
                )
                opt_state = restored["opt_state"]
                start_epoch = int(restored.get("epoch", 0)) + 1
                logger.info(f"resumed from {ckpt_path} at epoch {start_epoch}")
            else:
                # weights-only warm start, as the reference's best_model.pth
                # path loads model_state_dict only (Partsize train.py:86-94).
                # Design delta (PARITY §2.5): the reference ALSO restores
                # start_epoch on that path; we intentionally restart the
                # epoch/LR schedule at 1 for migrated weights — a migrated
                # torch checkpoint's epoch count has no meaning for a fresh
                # optimizer + schedule here (locked in by
                # tests/test_tools.py warm-start epoch assertion).
                restored = restore_checkpoint(
                    ckpt_path,
                    {"params": state.params, "batch_stats": state.batch_stats},
                )
                opt_state = state.opt_state
                logger.info(
                    f"warm start from {ckpt_path} "
                    "(params/batch_stats only; fresh optimizer state)"
                )
            state = TrainState(
                step=state.step,
                params=restored["params"],
                batch_stats=restored["batch_stats"],
                opt_state=opt_state,
            )

    ema_params = None
    if getattr(tcfg, "ema_decay", 0.0) > 0.0:
        d = float(tcfg.ema_decay)
        # genuine copy: train_step donates the state, so aliasing
        # state.params here would hand the EMA tree deleted buffers
        ema_params = jax.tree.map(jnp.copy, state.params)
        ema_path = os.path.join(exp_dir, "latest_ema")
        if start_epoch > 1 and os.path.exists(ema_path):
            # resumed: recover the EMA tree (its own checkpoint dir so the
            # main latest_checkpoint tree stays EMA-agnostic for consumers)
            ema_params = restore_checkpoint(
                ema_path, {"params": state.params}
            )["params"]
            logger.info("resumed EMA params")
        ema_update = jax.jit(
            lambda e, p: jax.tree.map(lambda a, b: d * a + (1.0 - d) * b, e, p)
        )
    n_params = sum(x.size for x in jax.tree.leaves(state.params))
    logger.info(
        f"model={mcfg.name} params={n_params:,} classes={mcfg.num_classes} "
        f"blocks={len(train_ds)} batch={tcfg.batch_size}"
    )

    counts = train_ds.label_counts(mcfg.num_classes)
    class_weights = L.class_weights_from_counts(jnp.asarray(counts))
    logger.info(f"class weights: {np.asarray(class_weights)}")

    # checkpoint-layout hooks: every mode checkpoints the CANONICAL
    # single-device state layout so runs hand off freely between modes;
    # pp overrides these (its live state is the stacked-blocks layout)
    canon_state = lambda st: st  # noqa: E731
    canon_params = lambda p: p  # noqa: E731

    if mesh is not None and par_mode == "sp":
        from ..parallel import make_sp_eval_step, make_sp_train_step, replicate

        axis = config.parallel.data_axis
        state = replicate(state, mesh)
        class_weights = replicate(class_weights, mesh)
        sp_step = make_sp_train_step(
            sp_model, config.loss, optimizer, mesh, axis=axis,
            donate=tcfg.donate, shard_inputs=sp_shard_inputs,
        )

        def train_step(st, batch, lr, cw, rng):
            b = {k: batch[k] for k in ("points", "colors", "labels")}
            return sp_step(st, b, lr, cw, rng)

        if spd > 1:
            from ..parallel import make_sp_multi_train_step

            sp_multi = make_sp_multi_train_step(
                sp_model, config.loss, optimizer, mesh, spd, axis=axis,
                donate=tcfg.donate, shard_inputs=sp_shard_inputs,
                ema_decay=float(getattr(tcfg, "ema_decay", 0.0)),
            )
            if getattr(tcfg, "ema_decay", 0.0) > 0.0:
                def multi_step(st, ema_t, batch, lr, cw, rng):
                    b = {k: batch[k] for k in ("points", "colors", "labels")}
                    return sp_multi(st, ema_t, b, lr, cw, rng)
            else:
                def multi_step(st, batch, lr, cw, rng):
                    b = {k: batch[k] for k in ("points", "colors", "labels")}
                    return sp_multi(st, b, lr, cw, rng)
            logger.info(f"multi-step dispatch: {spd} steps per jit call")

        eval_step = make_sp_eval_step(
            sp_model, mcfg.num_classes, mesh, axis,
            shard_inputs=sp_shard_inputs,
        )
        logger.info(
            f"sequence-parallel over {mesh.devices.size} devices "
            f"(shard_inputs={sp_shard_inputs})"
        )

        def put_batch(b):
            return {k: jnp.asarray(v) for k, v in b.items()}

        if ema_params is not None:
            ema_params = replicate(ema_params, mesh)
    elif mesh is not None and par_mode == "pp":
        # Pipeline parallelism as an engine mode (parallel/pp.py): the ptv3
        # family's homogeneous block stack is stage-sharded over the mesh
        # (params + Adam moments), activations flow through a GPipe
        # microbatch schedule, embed/head run replicated. Checkpoints are
        # written in the CANONICAL layout (pp_unstack_state, moments
        # included) so pp runs resume from / hand off to any other mode.
        if getattr(tcfg, "accum_steps", 1) > 1:
            raise ValueError(
                "accum_steps is not supported with parallel.mode=pp"
            )
        if spd > 1:
            raise ValueError(
                "steps_per_dispatch is not supported with parallel.mode=pp "
                "(intentional — see PARITY.md §2.5 multi-step decision)"
            )
        from ..parallel import (
            make_pp_eval_step,
            make_pp_train_step,
            pp_place_state,
            pp_stack_state,
            pp_unstack_state,
            unstack_ptv3_params,
        )

        axis = config.parallel.data_axis
        depth = getattr(model, "depth", 0)
        if not depth:
            raise ValueError(
                "parallel.mode=pp requires a homogeneous block-stack model "
                f"(the ptv3 family); '{mcfg.name}' has no depth"
            )
        n_stages = mesh.devices.size
        mb = config.parallel.pp_microbatches or n_stages
        if tcfg.batch_size % mb:
            raise ValueError(
                f"batch_size {tcfg.batch_size} must divide "
                f"pp microbatch count {mb}"
            )
        state = pp_place_state(pp_stack_state(state, depth), mesh, axis)
        class_weights = jnp.asarray(class_weights)
        pp_step = make_pp_train_step(
            model, config.loss, optimizer, mesh, state, axis=axis,
            num_microbatches=mb, donate=tcfg.donate,
        )

        def train_step(st, batch, lr, cw, rng):
            b = {k: batch[k] for k in ("points", "colors", "labels")}
            return pp_step(st, b, lr, cw, rng)

        eval_step = make_pp_eval_step(
            model, mcfg.num_classes, mesh, axis, num_microbatches=mb
        )
        canon_state = lambda st: pp_unstack_state(st, depth)  # noqa: E731
        canon_params = lambda p: unstack_ptv3_params(p, depth)  # noqa: E731
        logger.info(
            f"pipeline-parallel over {n_stages} stages "
            f"({depth} blocks, {mb} microbatches/step)"
        )

        def put_batch(b):
            return {k: jnp.asarray(v) for k, v in b.items()}

        if ema_params is not None:
            # the EMA tree tracks the LIVE (stacked) params; elementwise
            # decay commutes with the layout change, and saves go through
            # canon_params back to the canonical layout
            ema_params = pp_place_state(
                pp_stack_state(
                    TrainState(step=state.step, params=ema_params,
                               batch_stats={}, opt_state=()),
                    depth,
                ),
                mesh, axis,
            ).params
            ema_update = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: d * a + (1.0 - d) * b, e, p
                ),
                out_shardings=jax.tree.map(
                    lambda x: x.sharding, ema_params
                ),
            )
    elif mesh is not None and par_mode == "fsdp":
        # ZeRO-3 as an engine mode (parallel/fsdp.py): every param leaf and
        # its optax moments shard their largest mesh-divisible axis over the
        # data axis, the batch shards over the same axis, and the step body
        # stays the logical single-device program — GSPMD places the
        # all-gather-on-consume / reduce-scatter-on-grads pattern over ICI.
        # Eval reuses the plain jitted step: with committed FSDP/batch input
        # shardings the partitioner partitions it the same way.
        if getattr(tcfg, "accum_steps", 1) > 1:
            raise ValueError(
                "accum_steps is not supported with parallel.mode=fsdp"
            )
        if spd > 1:
            raise ValueError(
                "steps_per_dispatch is not supported with parallel.mode=fsdp "
                "(intentional — see PARITY.md §2.5 multi-step decision)"
            )
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import fsdp_state_shardings, make_fsdp_train_step

        axis = config.parallel.data_axis
        train_step, fsdp_place = make_fsdp_train_step(
            model, config.loss, optimizer, mesh, axis=axis
        )
        state, _ = fsdp_place(state, sample)
        sh_tree = fsdp_state_shardings(state, mesh, axis=axis)
        class_weights = jax.device_put(
            class_weights, NamedSharding(mesh, PartitionSpec())
        )
        eval_step = make_eval_step(model, mcfg.num_classes)
        batch_sh = NamedSharding(mesh, PartitionSpec(axis))
        logger.info(
            f"fsdp/ZeRO-3 over {mesh.devices.size} devices "
            f"(params + optimizer moments sharded over '{axis}')"
        )

        def put_batch(b):
            return {
                k: jax.device_put(jnp.asarray(v), batch_sh)
                for k, v in b.items()
            }

        if ema_params is not None:
            # the EMA tree mirrors the params: pin it (and every update's
            # output) to the same FSDP shardings so the decayed copy never
            # silently re-replicates between steps
            ema_params = jax.device_put(ema_params, sh_tree.params)
            ema_update = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: d * a + (1.0 - d) * b, e, p
                ),
                out_shardings=sh_tree.params,
            )
    elif mesh is not None and par_mode == "ep":
        # Expert parallelism as an engine mode (parallel/ep.py): a
        # ("data", "expert") mesh — the MoE family's experts_* param leaves
        # (and their optax moments) shard the leading expert axis, batch
        # shards over data; loss = task + ep_aux_coef * router load-balance
        # aux. GSPMD logical single-device program (no named axis).
        if getattr(tcfg, "accum_steps", 1) > 1:
            raise ValueError(
                "accum_steps is not supported with parallel.mode=ep"
            )
        if spd > 1:
            raise ValueError(
                "steps_per_dispatch is not supported with parallel.mode=ep "
                "(intentional — see PARITY.md §2.5 multi-step decision)"
            )
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import ep_state_shardings, make_ep_train_step

        if not any(
            "experts_" in jax.tree_util.keystr(p)
            for p, _ in jax.tree_util.tree_flatten_with_path(state.params)[0]
        ):
            raise ValueError(
                "parallel.mode=ep requires a mixture-of-experts model "
                f"(experts_* param leaves); '{mcfg.name}' has none — "
                "use ptv3_moe (model.extra num_experts>0)"
            )
        train_step, ep_place = make_ep_train_step(
            model, config.loss, optimizer, mesh,
            aux_coef=float(config.parallel.ep_aux_coef),
        )
        state, _ = ep_place(state, sample)
        class_weights = jax.device_put(
            class_weights, NamedSharding(mesh, PartitionSpec())
        )
        eval_step = make_eval_step(model, mcfg.num_classes)
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        logger.info(
            f"expert-parallel over a {mesh.shape['data']}x"
            f"{mesh.shape['expert']} (data, expert) mesh"
        )

        def put_batch(b):
            return {
                k: jax.device_put(jnp.asarray(v), batch_sh)
                for k, v in b.items()
            }

        if ema_params is not None:
            sh_p = ep_state_shardings(state, mesh).params
            ema_params = jax.device_put(ema_params, sh_p)
            ema_update = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: d * a + (1.0 - d) * b, e, p
                ),
                out_shardings=sh_p,
            )
    elif mesh is not None and par_mode == "tp":
        # Tensor parallelism as an engine mode (parallel/sharding.py): a
        # ("data", "model") mesh — batch sharded over data, the large Dense
        # kernels column-sharded over model, step body the logical
        # single-device program with GSPMD placing the collectives. BN
        # stats are globally correct by construction (no named axis).
        if getattr(tcfg, "accum_steps", 1) > 1:
            raise ValueError(
                "accum_steps is not supported with parallel.mode=tp"
            )
        if spd > 1:
            raise ValueError(
                "steps_per_dispatch is not supported with parallel.mode=tp "
                "(intentional — see PARITY.md §2.5 multi-step decision)"
            )
        from jax.sharding import NamedSharding, PartitionSpec
        from ..parallel import make_tp_train_step, param_shardings

        train_step, tp_place = make_tp_train_step(
            model, config.loss, optimizer, mesh
        )
        state, _ = tp_place(state, sample)
        class_weights = jax.device_put(
            class_weights, NamedSharding(mesh, PartitionSpec())
        )
        eval_step = make_eval_step(model, mcfg.num_classes)
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        logger.info(
            f"tensor-parallel over a {mesh.shape['data']}x"
            f"{mesh.shape['model']} (data, model) mesh"
        )

        def put_batch(b):
            return {
                k: jax.device_put(jnp.asarray(v), batch_sh)
                for k, v in b.items()
            }

        if ema_params is not None:
            # pin the EMA tree (and every update's output) to the TP param
            # shardings so the decayed copy never silently re-replicates
            sh_p = param_shardings(state.params, mesh)
            ema_params = jax.device_put(ema_params, sh_p)
            ema_update = jax.jit(
                lambda e, p: jax.tree.map(
                    lambda a, b: d * a + (1.0 - d) * b, e, p
                ),
                out_shardings=sh_p,
            )
    elif mesh is not None:
        from ..parallel import (
            make_dp_eval_step,
            make_dp_train_step,
            replicate,
            shard_batch,
        )

        state = replicate(state, mesh)
        class_weights = replicate(class_weights, mesh)
        train_step = make_dp_train_step(
            model, config.loss, optimizer, mesh, config.parallel.data_axis,
            donate=tcfg.donate,
        )
        if spd > 1:
            from ..parallel import make_dp_multi_train_step

            multi_step = make_dp_multi_train_step(
                model, config.loss, optimizer, mesh, spd,
                axis=config.parallel.data_axis, donate=tcfg.donate,
                ema_decay=float(getattr(tcfg, "ema_decay", 0.0)),
            )
            logger.info(f"multi-step dispatch: {spd} steps per jit call")
        eval_step = make_dp_eval_step(
            model, mcfg.num_classes, mesh, config.parallel.data_axis
        )
        logger.info(f"data-parallel over {mesh.devices.size} devices")

        def put_batch(b):
            dim = 1 if np.asarray(b["points"]).ndim == 4 else 0
            return shard_batch(b, mesh, config.parallel.data_axis, dim=dim)

        if ema_params is not None:
            ema_params = replicate(ema_params, mesh)
    else:
        if getattr(tcfg, "accum_steps", 1) > 1:
            if tcfg.batch_size % tcfg.accum_steps:
                raise ValueError(
                    f"batch_size {tcfg.batch_size} not divisible by "
                    f"accum_steps {tcfg.accum_steps}"
                )
            train_step = make_accum_train_step(
                model, config.loss, optimizer, tcfg.accum_steps, tcfg.donate
            )
        else:
            train_step = make_train_step(
                model, config.loss, optimizer, tcfg.donate
            )
        if spd > 1:
            multi_step = make_multi_train_step(
                model, config.loss, optimizer, spd, tcfg.donate,
                ema_decay=float(getattr(tcfg, "ema_decay", 0.0)),
            )
            logger.info(f"multi-step dispatch: {spd} steps per jit call")
        eval_step = make_eval_step(model, mcfg.num_classes)

        def put_batch(b):
            return {k: jnp.asarray(v) for k, v in b.items()}

    # K val batches per dispatch too (generic: wraps whichever engine's
    # eval_step was built above)
    multi_eval = make_multi_eval_step(eval_step, spd) if spd > 1 else None

    plateau = ReduceLROnPlateau(
        lr=tcfg.learning_rate,
        factor=tcfg.plateau_factor,
        patience=tcfg.plateau_patience,
        min_lr=tcfg.min_lr,
    )
    lr = tcfg.learning_rate
    best_val_acc = -1.0
    history = []

    for epoch in range(start_epoch, tcfg.num_epochs + 1):
        if tcfg.scheduler == "cosine":
            lr = cosine_lr(tcfg.learning_rate, epoch - 1, tcfg.num_epochs)
        elif tcfg.scheduler == "step":
            lr = step_decay_lr(
                tcfg.learning_rate, epoch - 1, tcfg.step_decay, tcfg.step_every,
                tcfg.min_lr,
            )
        # linear warmup multiplies whatever the scheduler chose; `lr` itself
        # is left untouched so plateau's carried-over state doesn't compound
        # the warmup factor across epochs
        eff_lr = lr
        wu = getattr(tcfg, "warmup_epochs", 0)
        if wu > 0 and epoch <= wu:
            eff_lr = lr * epoch / wu

        t0 = time.time()
        # Metrics stay ON DEVICE during the epoch and are fetched once at the
        # end: a per-step float() forces a host round trip (~50 ms on the
        # relay — 4x the 12.8 ms SSG step) and serializes dispatch; deferring
        # the fetch lets steps pipeline.
        step_metrics = []
        batch_iter = train_ds.batches(
            tcfg.batch_size, shuffle=True, seed=tcfg.seed, epoch=epoch
        )
        if multi_step is not None:
            # stack k host batches -> ONE upload + ONE k-step dispatch;
            # the ragged epoch tail passes through as single steps
            batch_iter = group_batches(batch_iter, spd)
        for batch in prefetch_to_device(batch_iter, put_batch, tcfg.prefetch):
            if multi_step is not None and batch["points"].ndim == 4:
                if ema_params is not None:
                    state, ema_params, m = multi_step(
                        state, ema_params, batch, jnp.float32(eff_lr),
                        class_weights, rng,
                    )
                else:
                    state, m = multi_step(
                        state, batch, jnp.float32(eff_lr), class_weights, rng
                    )
                step_metrics.append(m)
                continue
            state, m = train_step(
                state, batch, jnp.float32(eff_lr), class_weights, rng
            )
            if ema_params is not None:
                ema_params = ema_update(ema_params, state.params)
            step_metrics.append(m)
        nb = len(step_metrics)
        if nb:
            fetched = jax.device_get(step_metrics)
            # ravel: multi-step dispatches return stacked [k] metrics
            tr_loss = float(np.mean(np.concatenate(
                [np.ravel(f["loss"]) for f in fetched]
            )))
            tr_acc = float(np.mean(np.concatenate(
                [np.ravel(f["acc"]) for f in fetched]
            )))
        else:
            tr_loss = tr_acc = 0.0

        row = {
            "epoch": epoch,
            "lr": eff_lr,
            "train_loss": tr_loss,
            "train_acc": tr_acc,
            "epoch_time_s": time.time() - t0,
        }

        # validate (and checkpoint best) with the deployed weight set: the
        # EMA tree when enabled, raw params otherwise
        eval_params = ema_params if ema_params is not None else state.params
        if val_ds is not None and len(val_ds) > 0:
            cms, losses = [], []  # device-side; fetched once after the loop
            val_iter = val_ds.batches(
                tcfg.batch_size, shuffle=False, drop_last=False
            )
            if multi_eval is not None:
                val_iter = group_batches(val_iter, spd)
            for batch in prefetch_to_device(val_iter, put_batch, tcfg.prefetch):
                if multi_eval is not None and batch["points"].ndim == 4:
                    cm, loss = multi_eval(
                        eval_params, state.batch_stats, batch, class_weights
                    )
                else:
                    cm, loss = eval_step(
                        eval_params, state.batch_stats, batch, class_weights
                    )
                cms.append(cm)  # multi: already K-summed [C, C]
                losses.append(loss)  # multi: stacked [K]
            cms, losses = jax.device_get((cms, losses))
            flat_losses = (
                np.concatenate([np.ravel(l) for l in losses])
                if losses else np.zeros(0)
            )
            vb = flat_losses.size  # actual eval-batch count, not dispatches
            cm_total = np.sum(np.asarray(cms), axis=0) if vb else np.zeros(
                (mcfg.num_classes, mcfg.num_classes)
            )
            val_loss = float(flat_losses.sum()) if vb else 0.0
            mets = M.metrics_from_confusion(cm_total)
            val_acc = mets["OA"]
            row.update(
                val_loss=val_loss / max(vb, 1),
                val_acc=val_acc,
                val_miou=mets["mIoU"],
                val_macc=mets["mAcc"],
            )
            for c, a in enumerate(mets["Acc_per_class"]):
                row[f"class_{c}_acc"] = float(a)
            if tcfg.scheduler == "plateau":
                lr = plateau.step(val_acc)
            if val_acc > best_val_acc:
                best_val_acc = val_acc
                ckpt_st = canon_state(state)
                save_checkpoint(
                    os.path.join(exp_dir, "best_model"),
                    {
                        "params": canon_params(eval_params),
                        "batch_stats": ckpt_st.batch_stats,
                        "opt_state": ckpt_st.opt_state,
                        "epoch": epoch,
                        "val_acc": float(val_acc),
                    },
                )

        ckpt_st = canon_state(state)
        save_checkpoint(
            os.path.join(exp_dir, "latest_checkpoint"),
            {
                "params": ckpt_st.params,
                "batch_stats": ckpt_st.batch_stats,
                "opt_state": ckpt_st.opt_state,
                "epoch": epoch,
            },
        )
        if ema_params is not None:  # raw (above) + EMA: exact resume
            save_checkpoint(
                os.path.join(exp_dir, "latest_ema"),
                {"params": canon_params(ema_params)},
            )
        history.append(row)
        writer.write(epoch, {k: v for k, v in row.items() if k != "epoch"})
        logger.info(
            " ".join(
                f"{k}={v:.4f}" if isinstance(v, float) else f"{k}={v}"
                for k, v in row.items()
            )
        )

    writer.close()
    return {
        "history": history,
        # canonical layout for consumers (identity except pp, whose live
        # state is the stacked-blocks layout)
        "state": canon_state(state),
        "best_val_acc": best_val_acc,
        "exp_dir": exp_dir,
        "model": model,
        "class_weights": class_weights,
    }
