"""Multi-step dispatch (train/loop.py::make_multi_train_step): K full
optimizer steps in one jit over a stacked batch must be exactly K sequential
make_train_step steps — same params, batch stats, step counter, per-step
metrics, and EMA trajectory — and the train() engine must handle the ragged
epoch tail (stacked groups + single-step leftovers) transparently."""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.models import get_model
from pointcloud_bridge_tpu.train.loop import (

    create_train_state,
    group_batches,
    make_multi_train_step,
    make_train_step,
)

pytestmark = pytest.mark.mesh


def _batch(b, n=128, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "points": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "colors": rng.uniform(size=(b, n, 3)).astype(np.float32),
        "labels": rng.integers(0, 5, (b, n)).astype(np.int32),
        "mask": np.ones(b, bool),
        "block_ids": np.arange(b, dtype=np.int32),
    }


def _model():
    return get_model(
        "pointnet2_ssg", num_classes=5, sa_npoints=(32, 16, 8),
        dropout_rate=0.5,
    )


def _stack(batches):
    return {k: jnp.asarray(np.stack([b[k] for b in batches]))
            for k in batches[0]}


def _tree_close(a, b, tol=1e-6):
    ja, jb = jax.tree.leaves(a), jax.tree.leaves(b)
    assert len(ja) == len(jb)
    for x, y in zip(ja, jb):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=tol,
                                   rtol=tol)


@pytest.mark.slow
def test_multi_step_equals_sequential_steps():
    model = _model()
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    # plain-SGD transform: Adam normalizes ~0 grads to +-lr, so dead-param
    # signs flip on fusion-order noise (CLAUDE.md / test_ep.py pattern)
    opt = optax.identity()
    k = 3
    batches = [_batch(2, seed=s) for s in range(k)]
    rng = jax.random.PRNGKey(0)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-2)

    state_a = create_train_state(model, rng, batches[0], opt)
    state_b = state_a  # donate=False below, so sharing the init is safe

    single = make_train_step(model, cfg.loss, opt, donate=False)
    seq_metrics = []
    for b in batches:
        jb = {key: jnp.asarray(v) for key, v in b.items()}
        state_a, m = single(state_a, jb, lr, cw, rng)
        seq_metrics.append(m)

    multi = make_multi_train_step(model, cfg.loss, opt, k, donate=False)
    state_m, stacked = multi(state_b, _stack(batches), lr, cw, rng)

    assert int(state_m.step) == int(state_a.step)
    _tree_close(state_m.params, state_a.params)
    _tree_close(state_m.batch_stats, state_a.batch_stats)
    np.testing.assert_allclose(
        np.asarray(stacked["loss"]),
        np.asarray([m["loss"] for m in seq_metrics]), atol=1e-6, rtol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(stacked["acc"]),
        np.asarray([m["acc"] for m in seq_metrics]), atol=1e-6, rtol=1e-6,
    )


@pytest.mark.slow
def test_multi_step_ema_matches_per_step_ema():
    model = _model()
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    d = 0.9
    k = 2
    batches = [_batch(2, seed=10 + s) for s in range(k)]
    rng = jax.random.PRNGKey(1)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-2)

    state = create_train_state(model, rng, batches[0], opt)
    ema = jax.tree.map(jnp.copy, state.params)

    single = make_train_step(model, cfg.loss, opt, donate=False)
    st, ema_seq = state, ema
    for b in batches:
        jb = {key: jnp.asarray(v) for key, v in b.items()}
        st, _ = single(st, jb, lr, cw, rng)
        ema_seq = jax.tree.map(lambda e, p: d * e + (1 - d) * p,
                               ema_seq, st.params)

    multi = make_multi_train_step(model, cfg.loss, opt, k, donate=False,
                                  ema_decay=d)
    st_m, ema_m, _ = multi(state, ema, _stack(batches), lr, cw, rng)
    _tree_close(st_m.params, st.params)
    _tree_close(ema_m, ema_seq)


def test_group_batches_ragged_tail_and_shape_change():
    b2 = [_batch(2, seed=s) for s in range(5)]
    out = list(group_batches(iter(b2), 2))
    # 5 batches at k=2: two stacked pairs + one passthrough
    assert out[0]["points"].shape == (2, 2, 128, 3)
    assert out[1]["points"].shape == (2, 2, 128, 3)
    assert out[2]["points"].shape == (2, 128, 3)
    # order preserved through stacking
    np.testing.assert_array_equal(out[0]["labels"][1], b2[1]["labels"])
    np.testing.assert_array_equal(out[2]["labels"], b2[4]["labels"])

    # a ragged final batch (smaller B) flushes un-stacked
    mixed = [_batch(4, seed=0), _batch(4, seed=1), _batch(4, seed=2),
             _batch(2, seed=3)]
    out = list(group_batches(iter(mixed), 2))
    shapes = [o["points"].shape for o in out]
    assert shapes == [(2, 4, 128, 3), (4, 128, 3), (2, 128, 3)]


@pytest.mark.slow
def test_train_engine_multistep_runs_and_matches(tmp_path):
    """train() with steps_per_dispatch=2 over an odd batch count (stacked
    group + single tail every epoch) matches the steps_per_dispatch=1 run's
    loss history on the same data/seed."""
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(30000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=128, block_size=4.0, sample_rate=0.3,
        file_name="toy", seed=0,
    )[:13]
    assert len(blocks) == 13  # 3 batches/epoch at B=4 -> 1 stacked + 1 tail
    tr = BlockDataset.from_blocks(blocks, ["toy"], augment=False)

    def run(spd, out):
        cfg = Config.from_dict(
            {
                "case": f"multistep_{spd}",
                "num_classes": 5,
                "batch_size": 4,
                "num_epochs": 2,
                "learning_rate": 1e-3,
                "model": "pointnet2_ssg",
            }
        )
        cfg.model.extra = {"sa_npoints": (32, 16, 8)}
        cfg.loss.name = "ce"
        cfg.train.steps_per_dispatch = spd
        return train(cfg, tr, None, exp_dir=str(tmp_path / out))

    h1 = run(1, "exp1")["history"]
    h2 = run(2, "exp2")["history"]
    # 2% band, not exact: train() uses AdamW, and the K-step program is a
    # DIFFERENT XLA program — fusion-order noise on near-zero grads is
    # amplified to +-lr by Adam (CLAUDE.md), drifting later steps. Exact
    # step semantics are pinned by the optax.identity unit tests above
    # (1e-6); this test certifies the engine plumbing (stacked dispatch +
    # ragged tail + metric flatten) tracks the sequential run.
    for r1, r2 in zip(h1, h2):
        np.testing.assert_allclose(r1["train_loss"], r2["train_loss"],
                                   rtol=0.02)
        np.testing.assert_allclose(r1["train_acc"], r2["train_acc"],
                                   rtol=0.05)


def test_multistep_config_guards(tmp_path):
    from pointcloud_bridge_tpu.train import train

    cfg = Config.from_dict(
        {"case": "g", "num_classes": 5, "batch_size": 4, "num_epochs": 1,
         "model": "pointnet2_ssg"}
    )
    cfg.train.steps_per_dispatch = 2
    cfg.train.accum_steps = 2
    with pytest.raises(ValueError, match="mutually exclusive"):
        train(cfg, None, exp_dir=str(tmp_path / "g"))


@pytest.mark.slow
def test_dp_multi_step_equals_sequential_dp_steps():
    """make_dp_multi_train_step(k) == k sequential make_dp_train_step calls
    on the 8-way mesh (plain-SGD transform; stacked batch sharded on dim 1)."""
    from pointcloud_bridge_tpu.parallel import (
        make_dp_multi_train_step,
        make_dp_train_step,
        make_mesh,
        replicate,
        shard_batch,
    )

    mesh = make_mesh()
    model = get_model(
        "pointnet2_ssg", num_classes=5, axis_name="data",
        sa_npoints=(32, 16, 8), dropout_rate=0.5,
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    k = 2
    batches = [_batch(8, seed=20 + s) for s in range(k)]
    rng = jax.random.PRNGKey(2)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-2)

    state = create_train_state(model, rng, batches[0], opt)
    state = replicate(state, mesh)
    cwr = replicate(cw, mesh)

    single = make_dp_train_step(model, cfg.loss, opt, mesh, donate=False)
    st = state
    seq_losses = []
    for b in batches:
        st, m = single(st, shard_batch(b, mesh), lr, cwr, rng)
        seq_losses.append(float(m["loss"]))

    multi = make_dp_multi_train_step(model, cfg.loss, opt, mesh, k,
                                     donate=False)
    stacked = {key: np.stack([b[key] for b in batches]) for key in batches[0]}
    st_m, ms = multi(state, shard_batch(stacked, mesh, dim=1), lr, cwr, rng)

    assert int(st_m.step) == int(st.step)
    _tree_close(st_m.params, st.params)
    _tree_close(st_m.batch_stats, st.batch_stats)
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                               atol=1e-6, rtol=1e-6)
    # stacked outputs stay replicated
    assert jax.tree.leaves(st_m.params)[0].sharding.is_fully_replicated


@pytest.mark.slow
def test_sp_multi_step_equals_sequential_sp_steps():
    """make_sp_multi_train_step(k) == k sequential make_sp_train_step calls
    on the 8-way mesh (query-sharded SSG, shard_inputs=False, plain SGD)."""
    from pointcloud_bridge_tpu.parallel import (
        make_mesh,
        make_sp_multi_train_step,
        make_sp_train_step,
    )

    mesh = make_mesh(axis="sp")
    model = get_model(
        "pointnet2_ssg", num_classes=5, sp_axis="sp", axis_name="sp",
        sa_npoints=(32, 16, 8), dropout_rate=0.5,
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = optax.identity()
    k = 2
    batches = [_batch(2, seed=30 + s) for s in range(k)]
    rng = jax.random.PRNGKey(3)
    cw = jnp.ones(5)
    lr = jnp.float32(1e-2)

    # init with the plain twin (same param tree; the sp model needs the
    # mesh axis bound) — exactly what train() does
    plain = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(32, 16, 8),
                      dropout_rate=0.5)
    state = create_train_state(plain, rng, batches[0], opt)

    single = make_sp_train_step(model, cfg.loss, opt, mesh, axis="sp",
                                donate=False, shard_inputs=False)
    st = state
    seq_losses = []
    for b in batches:
        jb = {key: jnp.asarray(b[key])
              for key in ("points", "colors", "labels")}
        st, m = single(st, jb, lr, cw, rng)
        seq_losses.append(float(m["loss"]))

    multi = make_sp_multi_train_step(model, cfg.loss, opt, mesh, k,
                                     axis="sp", donate=False,
                                     shard_inputs=False)
    stacked = {key: jnp.asarray(np.stack([b[key] for b in batches]))
               for key in ("points", "colors", "labels")}
    st_m, ms = multi(state, stacked, lr, cw, rng)

    assert int(st_m.step) == int(st.step)
    _tree_close(st_m.params, st.params)
    _tree_close(st_m.batch_stats, st.batch_stats)
    np.testing.assert_allclose(np.asarray(ms["loss"]), seq_losses,
                               atol=1e-6, rtol=1e-6)


@pytest.mark.slow
def test_train_engine_sp_multistep_with_ema(tmp_path):
    """train() with parallel.mode=sp + steps_per_dispatch=2 + EMA runs
    end-to-end on the 8-way mesh (covers the EMA-threaded sp multi-step
    wrapper) and learns."""
    from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
    from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene
    from pointcloud_bridge_tpu.train import train

    xyz, rgb, labels = toy_bridge_scene(30000, seed=0)
    blocks = make_training_blocks(xyz, rgb, labels, num_points=128,
                                  block_size=4.0, sample_rate=0.3,
                                  file_name="toy", seed=0)[:13]
    ds = BlockDataset.from_blocks(blocks, ["toy"], augment=False)
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 4, "num_epochs": 2,
         "model": "pointnet2_ssg"}
    )
    cfg.model.extra = {"sa_npoints": (32, 16, 8)}
    cfg.parallel.num_devices = -1
    cfg.parallel.mode = "sp"
    cfg.train.steps_per_dispatch = 2
    cfg.train.ema_decay = 0.9
    out = train(cfg, ds, ds, exp_dir=str(tmp_path / "exp"))
    assert len(out["history"]) == 2
    assert out["history"][-1]["train_loss"] < out["history"][0]["train_loss"]
    assert out["best_val_acc"] > 0


def test_multi_eval_step_equals_sequential_evals():
    """make_multi_eval_step(eval_step, k) returns the K-summed CM and
    stacked [K] losses of k sequential eval_step calls."""
    from pointcloud_bridge_tpu.train.loop import (
        make_eval_step,
        make_multi_eval_step,
    )

    model = _model()
    opt = optax.identity()
    k = 3
    batches = [_batch(2, seed=40 + s) for s in range(k)]
    state = create_train_state(model, jax.random.PRNGKey(4), batches[0], opt)
    cw = jnp.ones(5)

    single = make_eval_step(model, 5)
    cms, losses = [], []
    for b in batches:
        jb = {key: jnp.asarray(v) for key, v in b.items()}
        cm, loss = single(state.params, state.batch_stats, jb, cw)
        cms.append(np.asarray(cm))
        losses.append(float(loss))

    multi = make_multi_eval_step(single, k)
    cm_m, losses_m = multi(state.params, state.batch_stats, _stack(batches), cw)
    np.testing.assert_array_equal(np.asarray(cm_m), np.sum(cms, axis=0))
    np.testing.assert_allclose(np.asarray(losses_m), losses,
                               atol=1e-6, rtol=1e-6)
