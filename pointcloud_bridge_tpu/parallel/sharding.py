"""Optional tensor-parallel headroom via GSPMD param sharding (SURVEY §2.9).

The reference has no distributed training and its models are <8M params, so
pure data parallelism (parallel/train_step.py) is the capability match. This
module is the headroom path the SURVEY calls for: a 2-axis ("data", "model")
mesh where the batch shards over `data` and the LARGE Dense kernels shard
their output dimension over `model`. Everything is expressed as sharding
annotations on a single-device step function — XLA's SPMD partitioner
inserts the all-gathers/reduce-scatters over ICI (the scaling-book recipe:
pick a mesh, annotate, let the compiler place collectives).

BatchNorm needs no axis_name here: under GSPMD the computation is the
logical single-device program, so batch statistics are globally correct by
construction.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loop import TrainState, _loss_fn_for


def make_2d_mesh(dp: int, tp: int) -> Mesh:
    """Mesh with axes ("data", "model") over the first dp*tp devices."""
    devs = np.asarray(jax.devices()[: dp * tp]).reshape(dp, tp)
    return Mesh(devs, ("data", "model"))


def _kernel_rule(x, mesh: Mesh, min_elems: int):
    """Column-parallel sharding for big 2-D kernels; replicate the rest.
    Applies equally to optimizer moments (they mirror param shapes)."""
    tp = mesh.shape["model"]
    if (
        hasattr(x, "ndim")
        and x.ndim == 2
        and x.size >= min_elems
        and x.shape[1] % tp == 0
    ):
        return NamedSharding(mesh, P(None, "model"))
    return NamedSharding(mesh, P())


def param_shardings(params: Any, mesh: Mesh, min_elems: int = 1 << 14) -> Any:
    """NamedSharding tree for a flax param tree: 2-D kernels whose output
    dim divides the `model` axis and that are big enough shard P(None,
    "model") (column parallel); biases/BN/small kernels replicate."""
    return jax.tree.map(lambda x: _kernel_rule(x, mesh, min_elems), params)


def state_shardings(
    state: TrainState, mesh: Mesh, min_elems: int = 1 << 14
) -> TrainState:
    """Shardings for the whole train state: params and their optimizer
    moments follow the kernel rule; step/batch_stats replicate."""
    repl = NamedSharding(mesh, P())
    return TrainState(
        step=repl,
        params=param_shardings(state.params, mesh, min_elems),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree.map(
            lambda x: _kernel_rule(x, mesh, min_elems), state.opt_state
        ),
    )


def make_tp_train_step(model, loss_cfg, optimizer, mesh: Mesh):
    """GSPMD train step over a ("data", "model") mesh.

    Returns (step, place) where place(state, batch) device_puts with the
    right shardings and step(state, batch, lr, class_weights, rng) runs one
    update. The step body is the plain single-device program; the partitioner
    does the rest.
    """
    loss_fn = _loss_fn_for(loss_cfg)
    batch_sh = NamedSharding(mesh, P("data"))
    repl = NamedSharding(mesh, P())

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

    def place(state: TrainState, batch: Dict[str, np.ndarray]):
        cache["sh"] = state_shardings(state, mesh)
        state = jax.device_put(state, cache["sh"])
        batch = {k: jax.device_put(jnp.asarray(v), batch_sh) for k, v in batch.items()}
        return state, batch

    def stepper(state, batch, lr, class_weights, rng):
        if "fn" not in cache:
            # pin the output state to the TP shardings so updated
            # params/moments never silently re-replicate between steps
            sh = cache.get("sh") or state_shardings(state, mesh)
            cache["fn"] = jax.jit(
                step,
                donate_argnums=(0,),
                out_shardings=(sh, {"loss": repl, "acc": repl}),
            )
        return cache["fn"](state, batch, lr, class_weights, rng)

    return stepper, place
