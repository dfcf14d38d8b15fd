"""Expert parallelism over a ("data", "expert") GSPMD mesh (SURVEY §2.9).

The reference has no MoE model (and no distributed training at all); this
pairs with the beyond-reference MoE-FFN PTv3 variant (models/moe.py,
registry name `ptv3_moe`) to complete the dp/tp/sp/pp/ep parallelism
matrix. Everything is sharding annotations on the plain single-device step
(the same recipe as parallel/sharding.py's TP path): the batch shards over
`data`, every `experts_*` parameter (and its optimizer moments — optax
mirrors the param tree, so the same path rule applies) shards its leading
E axis over `expert`, and XLA's SPMD partitioner places the
all-to-all-shaped collectives around the MoE dispatch einsums.

BatchNorm needs no axis_name: under GSPMD the program is the logical
single-device computation, so batch statistics are globally correct by
construction. The MoE router's Switch load-balance loss is sown into
`intermediates`; the train step here makes that collection mutable and
adds `aux_coef` times its sum to the task loss.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..train.loop import TrainState, _loss_fn_for


def make_ep_mesh(dp: int, ep: int) -> Mesh:
    """Mesh with axes ("data", "expert") over the first dp*ep devices."""
    devs = np.asarray(jax.devices()[: dp * ep]).reshape(dp, ep)
    return Mesh(devs, ("data", "expert"))


def _is_expert_path(path) -> bool:
    return any("experts_" in str(getattr(k, "key", k)) for k in path)


def _leaf_rule(path, x, mesh: Mesh):
    ep = mesh.shape["expert"]
    if (
        _is_expert_path(path)
        and hasattr(x, "ndim")
        and x.ndim >= 1
        and x.shape[0] % ep == 0
    ):
        return NamedSharding(mesh, P("expert"))
    return NamedSharding(mesh, P())


def ep_state_shardings(state: TrainState, mesh: Mesh) -> TrainState:
    """Shardings for the whole train state: `experts_*` params and their
    optimizer moments shard the leading expert axis; the rest replicate."""
    repl = NamedSharding(mesh, P())
    return TrainState(
        step=repl,
        params=jax.tree_util.tree_map_with_path(
            lambda p, x: _leaf_rule(p, x, mesh), state.params
        ),
        batch_stats=jax.tree.map(lambda _: repl, state.batch_stats),
        opt_state=jax.tree_util.tree_map_with_path(
            lambda p, x: _leaf_rule(p, x, mesh), state.opt_state
        ),
    )


def _aux_sum(intermediates) -> jax.Array:
    """Sum all sown moe_aux_loss scalars (flax sow stores tuples)."""
    total = jnp.float32(0.0)
    count = 0
    for leaf in jax.tree_util.tree_leaves(intermediates):
        total = total + jnp.asarray(leaf, jnp.float32)
        count += 1
    return total / max(count, 1)


def make_ep_train_step(
    model, loss_cfg, optimizer, mesh: Mesh, aux_coef: float = 1e-2
):
    """GSPMD train step over a ("data", "expert") mesh.

    Returns (step, place): place(state, batch) device_puts with the expert
    shardings; step(state, batch, lr, class_weights, rng) runs one update
    with loss = task_loss + aux_coef * mean(router load-balance losses).
    """
    loss_fn = _loss_fn_for(loss_cfg)
    batch_sh = NamedSharding(mesh, P("data"))

    def step(state: TrainState, batch, lr, class_weights, rng):
        xyz, feats, labels = batch["points"], batch["colors"], batch["labels"]

        def compute_loss(params):
            logits, mutated = model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                xyz, feats, train=True,
                rngs={"dropout": jax.random.fold_in(rng, state.step)},
                mutable=["batch_stats", "intermediates"],
            )
            loss = loss_fn(logits, labels, xyz, class_weights)
            aux = _aux_sum(mutated.get("intermediates", {}))
            return loss + aux_coef * aux, (
                logits, mutated["batch_stats"], loss, aux
            )

        (total, (logits, new_bs, task_loss, aux)), grads = jax.value_and_grad(
            compute_loss, has_aux=True
        )(state.params)
        updates, new_opt = optimizer.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)
        acc = jnp.mean((jnp.argmax(logits, -1) == labels).astype(jnp.float32))
        return (
            TrainState(step=state.step + 1, params=new_params,
                       batch_stats=new_bs, opt_state=new_opt),
            {"loss": task_loss, "aux_loss": aux, "acc": acc},
        )

    cache: Dict[str, Any] = {}

    def place(state: TrainState, batch: Dict[str, np.ndarray]):
        cache["sh"] = ep_state_shardings(state, mesh)
        state = jax.device_put(state, cache["sh"])
        batch = {
            k: jax.device_put(jnp.asarray(v), batch_sh) for k, v in batch.items()
        }
        return state, batch

    repl = NamedSharding(mesh, P())

    def stepper(state, batch, lr, class_weights, rng):
        if "fn" not in cache:
            # pin the output state to the expert shardings so updated
            # params/moments never silently re-replicate between steps
            sh = cache.get("sh") or ep_state_shardings(state, mesh)
            cache["fn"] = jax.jit(
                step,
                donate_argnums=(0,),
                out_shardings=(
                    sh, {"loss": repl, "aux_loss": repl, "acc": repl}
                ),
            )
        return cache["fn"](state, batch, lr, class_weights, rng)

    return stepper, place
