"""FSDP / ZeRO-3: params, grads, and optimizer state sharded over the
data axis (SURVEY §2.9 headroom; no reference counterpart — the reference
trains single-GPU with whole-model state on every device).

TPU-first design: this is NOT a torch-style FSDP wrapper with manual
all-gather hooks. Every param leaf (and its optax moments, which mirror
param shapes) is annotated with a NamedSharding that splits its largest
divisible axis over the 1-D ("data",) mesh; the batch shards over the same
axis. The step body stays the plain single-device program — XLA's SPMD
partitioner inserts the all-gathers where a full kernel is consumed in
forward/backward and reduce-scatters for the gradients, i.e. the exact
ZeRO-3 communication pattern, but compiler-placed over ICI (the
scaling-book recipe). Per-device state memory is ~1/P of the model+moments
for every leaf big enough to shard.

BatchNorm needs no axis_name: under GSPMD the computation is the logical
single-device program, so batch statistics are globally correct by
construction (same argument as parallel/sharding.py TP).
"""

from __future__ import annotations

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loop import TrainState, _loss_fn_for


def make_fsdp_mesh(n: int, axis: str = "data") -> Mesh:
    """1-D (axis,) mesh over the first n devices."""
    return Mesh(np.asarray(jax.devices()[:n]), (axis,))


def _fsdp_rule(x, mesh: Mesh, min_elems: int, axis: str = "data"):
    """Shard the largest axis divisible by the mesh; replicate the rest.

    Applies equally to optimizer moments (they mirror param shapes);
    scalars / small leaves / indivisible shapes replicate.
    """
    n = mesh.shape[axis]
    if not hasattr(x, "ndim") or x.ndim == 0 or x.size < min_elems:
        return NamedSharding(mesh, P())
    divisible = [d for d in range(x.ndim) if x.shape[d] % n == 0 and x.shape[d] >= n]
    if not divisible:
        return NamedSharding(mesh, P())
    dim = max(divisible, key=lambda d: x.shape[d])
    spec = [None] * x.ndim
    spec[dim] = axis
    return NamedSharding(mesh, P(*spec))


def fsdp_state_shardings(
    state: TrainState, mesh: Mesh, min_elems: int = 1 << 12,
    axis: str = "data",
) -> TrainState:
    """Sharding tree for the whole train state: params and optimizer moments
    split their largest divisible axis over the data axis; step/batch_stats
    replicate (BN stats are tiny and consumed everywhere)."""
    repl = NamedSharding(mesh, P())
    rule = lambda x: _fsdp_rule(x, mesh, min_elems, axis)  # noqa: E731
    return TrainState(
        step=repl,
        params=jax.tree.map(rule, state.params),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree.map(rule, state.opt_state),
    )


def make_fsdp_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, min_elems: int = 1 << 12,
    axis: str = "data",
):
    """ZeRO-3 train step over a 1-D (axis,) mesh.

    Returns (step, place): place(state, batch) device_puts the state with
    FSDP shardings and the batch sharded over the data axis; step(state,
    batch, lr, class_weights, rng) runs one update. The body is the logical
    single-device program; the partitioner places the collectives.
    """
    loss_fn = _loss_fn_for(loss_cfg)
    batch_sh = NamedSharding(mesh, P(axis))

    def step(state: TrainState, batch, lr, class_weights, rng):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz, feats, train=True,
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
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_bs, opt_state=new_opt),
            {"loss": loss, "acc": acc},
        )

    cache: Dict[str, Any] = {}
    repl = NamedSharding(mesh, P())

    def place(state: TrainState, batch: Dict[str, np.ndarray]):
        cache["sh"] = fsdp_state_shardings(state, mesh, min_elems, axis)
        state = jax.device_put(state, cache["sh"])
        batch = {
            k: jax.device_put(jnp.asarray(v), batch_sh) for k, v in batch.items()
        }
        return state, batch

    def jitted(state, batch, lr, class_weights, rng):
        if "fn" not in cache:
            # pin the output state to the FSDP shardings so updated
            # params/moments never silently re-replicate between steps
            sh = cache.get("sh") or fsdp_state_shardings(
                state, mesh, min_elems, axis
            )
            cache["fn"] = jax.jit(
                step,
                donate_argnums=(0,),
                out_shardings=(sh, {"loss": repl, "acc": repl}),
            )
        return cache["fn"](state, batch, lr, class_weights, rng)

    return jitted, place
