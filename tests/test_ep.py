"""MoE FFN (models/moe.py) + expert parallelism (parallel/ep.py).

Beyond-reference capability (the reference zoo has no MoE model); these
tests pin the routing semantics to a per-token loop oracle and prove the
EP-sharded GSPMD step reproduces single-device math on the virtual mesh.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.models.moe import MoEFeedForward
from pointcloud_bridge_tpu.parallel import make_ep_mesh, make_ep_train_step
from pointcloud_bridge_tpu.train.loop import create_train_state, make_optimizer

pytestmark = pytest.mark.mesh



def _moe_oracle(params, x, top_k):
    """Per-token loop: y_t = sum_k gate_k * GEGLU-FFN_{e_k}(x_t)."""
    wr = params["router"]["kernel"]
    wp, bp = params["experts_proj_kernel"], params["experts_proj_bias"]
    wo, bo = params["experts_out_kernel"], params["experts_out_bias"]
    E = wp.shape[0]
    hid = wo.shape[1]
    b, n, d = x.shape
    xt = np.asarray(x, np.float32).reshape(-1, d)
    probs = np.asarray(jax.nn.softmax(jnp.asarray(xt) @ jnp.asarray(wr), -1))
    out = np.zeros_like(xt)
    for t in range(xt.shape[0]):
        p = probs[t].copy()
        sel, gates = [], []
        for _ in range(top_k):
            e = int(np.argmax(p))
            sel.append(e)
            gates.append(p[e])
            p[e] = -1.0
        gates = np.asarray(gates) / max(sum(gates), 1e-9)
        for e, g in zip(sel, gates):
            h = xt[t] @ np.asarray(wp[e]) + np.asarray(bp[e])
            a, gate_h = h[:hid], h[hid:]
            u = a * np.asarray(jax.nn.gelu(jnp.asarray(gate_h)))
            out[t] += g * (u @ np.asarray(wo[e]) + np.asarray(bo[e]))
    return out.reshape(b, n, d)


@pytest.mark.parametrize("top_k", [1, 2])
def test_moe_matches_per_token_oracle(top_k):
    E, d, hid, b, n = 4, 16, 32, 2, 64
    layer = MoEFeedForward(
        num_experts=E, hidden_dim=hid, dim=d, top_k=top_k,
        # capacity_factor = E guarantees C >= K*S: zero drops, exact oracle
        capacity_factor=float(E),
    )
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(jax.random.PRNGKey(1), (b, n, d), jnp.float32)
    variables = layer.init(key, x)
    y = layer.apply(variables, x)
    ref = _moe_oracle(variables["params"], x, top_k)
    np.testing.assert_allclose(np.asarray(y), ref, rtol=2e-4, atol=2e-5)


def test_moe_index_dispatch_matches_dense_dispatch(monkeypatch):
    # The round-3 index-based dispatch (slot table + row gathers) must be
    # BITWISE equal to the grouped one-hot einsum path in f32 — every
    # dispatch/combine one-hot has exactly one nonzero per valid slot, so
    # the gather computes the identical arithmetic. Exercised with drops
    # (capacity_factor=1.0 forces over-capacity evictions at E=4, top-2)
    # and with gradients (same VJP result through scatter-add vs einsum).
    E, d, hid, b, n = 4, 16, 32, 2, 64
    layer = MoEFeedForward(
        num_experts=E, hidden_dim=hid, dim=d, top_k=2, capacity_factor=1.0
    )
    x = jax.random.normal(jax.random.PRNGKey(3), (b, n, d), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)

    def fwd(v, x):
        return layer.apply(v, x)

    def loss(v, x):
        return jnp.sum(layer.apply(v, x) ** 2)

    # "0" opts into the index/sort dispatch (round 4: dense is the default —
    # the index path is the measured-slower opt-in, kept exact + tested)
    monkeypatch.setenv("PCB_MOE_DENSE_DISPATCH", "0")
    y_idx = np.asarray(jax.jit(fwd)(variables, x))
    g_idx = jax.jit(jax.grad(loss))(variables, x)
    monkeypatch.setenv("PCB_MOE_DENSE_DISPATCH", "1")
    y_dense = np.asarray(jax.jit(fwd)(variables, x))
    g_dense = jax.jit(jax.grad(loss))(variables, x)

    np.testing.assert_array_equal(y_idx, y_dense)
    jax.tree_util.tree_map(
        lambda a, bb: np.testing.assert_allclose(
            np.asarray(a), np.asarray(bb), rtol=1e-5, atol=1e-6
        ),
        g_idx, g_dense,
    )


def test_moe_capacity_drop_semantics():
    # one expert, capacity < tokens: GShard priority keeps the FIRST C
    # tokens (cumsum order); the rest get a zero FFN contribution
    E, d, hid, b, n = 1, 8, 16, 1, 64
    layer = MoEFeedForward(
        num_experts=E, hidden_dim=hid, dim=d, top_k=1, capacity_factor=0.25
    )
    x = jax.random.normal(jax.random.PRNGKey(2), (b, n, d), jnp.float32)
    variables = layer.init(jax.random.PRNGKey(0), x)
    y = np.asarray(layer.apply(variables, x))
    C = 16  # ceil(1 * 64 * 0.25 / 1) = 16 (already a multiple of 8)
    assert np.abs(y[0, C:]).max() == 0.0
    assert np.abs(y[0, :C]).max() > 0.0
    ref = _moe_oracle(variables["params"], x, 1)
    np.testing.assert_allclose(y[0, :C], ref[0, :C], rtol=2e-4, atol=2e-5)


def _tiny_moe_batch(rng, b=4, n=64):
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def test_ptv3_moe_forward_and_param_layout():
    model = get_model("ptv3_moe", num_classes=5, embed_dim=32, depth=2,
                      num_heads=2)
    batch = _tiny_moe_batch(np.random.default_rng(0))
    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], batch["colors"], train=False
    )
    # every other block is MoE (block1), the rest dense
    assert "moe_mlp" in variables["params"]["block1"]
    assert "mlp" in variables["params"]["block0"]
    k = variables["params"]["block1"]["moe_mlp"]["experts_proj_kernel"]
    assert k.shape[0] == 8  # stacked expert axis
    logits = model.apply(variables, batch["points"], batch["colors"],
                         train=False)
    assert logits.shape == (4, 64, 5)
    assert np.isfinite(np.asarray(logits)).all()


@pytest.mark.parametrize("shape", [(1, 1), (2, 4)])
def test_ep_step_matches_across_meshes(shape):
    # the GSPMD program is the logical single-device computation: the same
    # step on a (1,1) mesh and a (2,4) (data, expert) mesh must agree
    if np.prod(shape) > len(jax.devices()):
        pytest.skip("needs 8 virtual devices")
    model = get_model("ptv3_moe", num_classes=5, embed_dim=32, depth=2,
                      num_heads=2, num_experts=4, drop_rate=0.0,
                      attn_drop_rate=0.0, head_drop_rate=0.0)
    batch = _tiny_moe_batch(np.random.default_rng(1))
    # pure SGD for the cross-mesh comparison: Adam's update normalizes
    # near-zero grads to +-lr, so reduction-order noise between shardings
    # flips signs and breaks allclose on params whose grad is ~0. The Adam
    # path is exercised by test_ep_training_updates_experts_and_learns.
    import optax

    opt = optax.identity()
    key = jax.random.PRNGKey(0)
    state0 = create_train_state(model, key, batch, opt)
    cfg = Config()

    mesh = make_ep_mesh(*shape)
    step, place = make_ep_train_step(model, cfg.loss, opt, mesh)
    st, sb = place(state0, batch)
    st, m = step(st, sb, jnp.float32(1e-3), jnp.ones(5, jnp.float32), key)
    jax.block_until_ready(m)

    if not hasattr(test_ep_step_matches_across_meshes, "_ref"):
        test_ep_step_matches_across_meshes._ref = (
            jax.device_get(st.params), {k: float(v) for k, v in m.items()}
        )
        assert np.isfinite(m["loss"]) and np.isfinite(m["aux_loss"])
        assert float(m["aux_loss"]) > 0.0
        return
    ref_params, ref_m = test_ep_step_matches_across_meshes._ref
    for k, v in ref_m.items():
        assert abs(float(m[k]) - v) < 1e-4, (k, float(m[k]), v)
    got = jax.device_get(st.params)
    flat_a = jax.tree_util.tree_leaves_with_path(ref_params)
    flat_b = dict(
        (jax.tree_util.keystr(p), x)
        for p, x in jax.tree_util.tree_leaves_with_path(got)
    )
    for p, a in flat_a:
        b = flat_b[jax.tree_util.keystr(p)]
        np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-5,
                                   err_msg=jax.tree_util.keystr(p))


def test_ep_training_updates_experts_and_learns():
    model = get_model("ptv3_moe", num_classes=5, embed_dim=32, depth=2,
                      num_heads=2, num_experts=4)
    batch = _tiny_moe_batch(np.random.default_rng(2))
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, opt)
    w0 = np.asarray(
        state.params["block1"]["moe_mlp"]["experts_proj_kernel"]
    ).copy()
    cfg = Config()
    mesh = make_ep_mesh(2, 4)
    step, place = make_ep_train_step(model, cfg.loss, opt, mesh)
    state, b = place(state, batch)
    losses = []
    for i in range(5):
        state, m = step(
            state, b, jnp.float32(1e-2), jnp.ones(5, jnp.float32),
            jax.random.PRNGKey(i),
        )
        losses.append(float(m["loss"]))
    w1 = np.asarray(state.params["block1"]["moe_mlp"]["experts_proj_kernel"])
    assert np.abs(w1 - w0).max() > 0  # gradient reached the experts
    assert losses[-1] < losses[0]  # learning on the tiny batch
    assert all(np.isfinite(losses))


def test_upcycle_dense_to_moe_preserves_function():
    # sparse upcycling: identical experts + renormalized gates + no-drop
    # capacity => the MoE model computes exactly the dense model's function
    from pointcloud_bridge_tpu.models.moe import upcycle_dense_to_moe

    kw = dict(num_classes=5, embed_dim=32, depth=2, num_heads=2)
    E = 4
    dense = get_model("ptv3", **kw)
    moe = get_model("ptv3_moe", **kw, num_experts=E,
                    moe_capacity_factor=float(E))
    batch = _tiny_moe_batch(np.random.default_rng(4))
    dv = dense.init(jax.random.PRNGKey(0), batch["points"], batch["colors"],
                    train=False)
    mv = moe.init(jax.random.PRNGKey(1), batch["points"], batch["colors"],
                  train=False)
    up = upcycle_dense_to_moe(dv["params"], mv["params"])
    y_dense = dense.apply(
        {"params": dv["params"], "batch_stats": dv["batch_stats"]},
        batch["points"], batch["colors"], train=False,
    )
    y_moe = moe.apply(
        {"params": up, "batch_stats": dv["batch_stats"]},
        batch["points"], batch["colors"], train=False,
    )
    np.testing.assert_allclose(
        np.asarray(y_moe), np.asarray(y_dense), rtol=2e-4, atol=2e-5
    )


def test_pp_rejects_moe_models():
    from pointcloud_bridge_tpu.parallel import stack_ptv3_params

    model = get_model("ptv3_moe", num_classes=5, embed_dim=32, depth=2,
                      num_heads=2, num_experts=4)
    batch = _tiny_moe_batch(np.random.default_rng(3))
    variables = model.init(
        jax.random.PRNGKey(0), batch["points"], batch["colors"], train=False
    )
    with pytest.raises(ValueError, match="expert parallelism"):
        stack_ptv3_params(variables["params"], 2)


def test_ep_sharded_checkpoint_roundtrip(tmp_path):
    # an expert-sharded TrainState must survive save/restore and resume on
    # a DIFFERENT mesh shape (checkpoints are layout-free host trees)
    from pointcloud_bridge_tpu.utils.checkpoint import (
        restore_checkpoint, save_checkpoint,
    )

    model = get_model("ptv3_moe", num_classes=5, embed_dim=32, depth=2,
                      num_heads=2, num_experts=4)
    batch = _tiny_moe_batch(np.random.default_rng(5))
    opt = make_optimizer()
    key = jax.random.PRNGKey(0)
    state = create_train_state(model, key, batch, opt)
    cfg = Config()
    step, place = make_ep_train_step(model, cfg.loss, opt, make_ep_mesh(2, 4))
    state, b = place(state, batch)
    state, _ = step(state, b, jnp.float32(1e-3), jnp.ones(5, jnp.float32), key)

    path = str(tmp_path / "ckpt")
    host_state = jax.device_get(state)
    save_checkpoint(path, {"params": host_state.params,
                           "batch_stats": host_state.batch_stats,
                           "opt_state": host_state.opt_state,
                           "step": int(host_state.step)})
    restored = restore_checkpoint(path, {"params": host_state.params,
                                         "batch_stats": host_state.batch_stats,
                                         "opt_state": host_state.opt_state})
    flat_a = jax.tree_util.tree_leaves(host_state.params)
    flat_b = jax.tree_util.tree_leaves(restored["params"])
    assert len(flat_a) == len(flat_b)
    for a, b2 in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b2))

    # resume on a different mesh shape
    from pointcloud_bridge_tpu.train.loop import TrainState

    state2 = TrainState(step=jnp.int32(1), params=restored["params"],
                        batch_stats=restored["batch_stats"],
                        opt_state=restored["opt_state"])
    step2, place2 = make_ep_train_step(model, cfg.loss, opt, make_ep_mesh(4, 2))
    state2, b2_ = place2(state2, batch)
    state2, m2 = step2(state2, b2_, jnp.float32(1e-3),
                       jnp.ones(5, jnp.float32), key)
    assert np.isfinite(float(m2["loss"]))


@pytest.mark.slow
def test_train_engine_ep(tmp_path):
    """train() with parallel.mode='ep' runs expert parallelism end-to-end on
    a (4, 2) (data, expert) mesh (round 4): experts_* leaves sharded through
    epochs + validation + checkpointing, aux load-balance loss in the
    objective, and the returned state's expert leaves still sharded."""
    import numpy as np

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(10000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict(
        {"model": "ptv3_moe", "num_classes": 5, "batch_size": 8,
         "num_epochs": 2}
    )
    cfg.model.extra = dict(embed_dim=32, depth=2, num_heads=2, num_experts=4)
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "ep"
    cfg.parallel.ep_axis_size = 2
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert np.isfinite(out["history"][-1]["train_loss"])
    assert out["best_val_acc"] > 0
    flat = jax.tree_util.tree_flatten_with_path(out["state"].params)[0]
    expert_sharded = [
        x for p, x in flat
        if "experts_" in jax.tree_util.keystr(p)
        and hasattr(x, "sharding") and not x.sharding.is_fully_replicated
    ]
    assert len(expert_sharded) >= 4, "engine state lost its expert shardings"


def test_train_engine_ep_rejects_dense_model(tmp_path):
    import pytest as _pytest

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(4000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=6.0, sample_rate=0.3)
    ds = BlockDataset.from_blocks(blocks, ["toy"])
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 8, "num_epochs": 1}
    )
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "ep"
    with _pytest.raises(ValueError):
        train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
