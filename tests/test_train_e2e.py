"""End-to-end training slice (SURVEY.md §7 stage 3): PointNet++ SSG + weighted
CE + Adam on synthetic bridge blocks must actually learn, checkpoint, and log."""

import os

import numpy as np
import pytest

from pointcloud_bridge_tpu.config import Config
from pointcloud_bridge_tpu.data import BlockDataset, make_training_blocks
from pointcloud_bridge_tpu.data.synthetic import toy_bridge_scene


def _tiny_datasets():
    xyz, rgb, labels = toy_bridge_scene(30000, seed=0)
    blocks = make_training_blocks(
        xyz, rgb, labels, num_points=256, block_size=4.0, sample_rate=0.3,
        file_name="toy", seed=0,
    )
    assert len(blocks) >= 8, f"need >=8 blocks, got {len(blocks)}"
    # interleave: every 4th block to val so global/local sampling modes appear
    # in both splits
    val_b = blocks[::4][:4]
    train_b = [b for i, b in enumerate(blocks) if i % 4 != 0]
    tr = BlockDataset.from_blocks(train_b, ["toy"], augment=False)
    va = BlockDataset.from_blocks(val_b, ["toy"])
    return tr, va


@pytest.mark.slow
def test_train_learns_and_checkpoints(tmp_path):
    from pointcloud_bridge_tpu.train import train

    tr, va = _tiny_datasets()
    cfg = Config.from_dict(
        {
            "case": "e2e_test",
            "num_classes": 5,
            "batch_size": 4,
            "num_epochs": 6,
            "learning_rate": 1e-3,
            "model": "pointnet2_ssg",
        }
    )
    cfg.model.extra = {"sa_npoints": (64, 32, 16)}
    cfg.loss.name = "weighted_ce"
    out = train(cfg, tr, va, exp_dir=str(tmp_path / "exp"))

    hist = out["history"]
    assert hist[-1]["train_loss"] < hist[0]["train_loss"]
    # the toy scene is nearly separable by z+color: expect well above chance
    assert out["best_val_acc"] > 0.5
    assert os.path.exists(str(tmp_path / "exp" / "best_model"))
    assert os.path.exists(str(tmp_path / "exp" / "latest_checkpoint"))
    assert os.path.exists(str(tmp_path / "exp" / "scalars.csv"))
    assert os.path.exists(str(tmp_path / "exp" / "training.log"))


@pytest.mark.slow
def test_checkpoint_restore_roundtrip(tmp_path):
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.train import train
    from pointcloud_bridge_tpu.utils.checkpoint import restore_checkpoint

    tr, va = _tiny_datasets()
    cfg = Config.from_dict(
        {"num_classes": 5, "batch_size": 4, "num_epochs": 1, "model": "pointnet2_ssg"}
    )
    cfg.model.extra = {"sa_npoints": (64, 32, 16)}
    out = train(cfg, tr, va, exp_dir=str(tmp_path / "exp"))
    state = out["state"]
    target = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    restored = restore_checkpoint(str(tmp_path / "exp" / "latest_checkpoint"), target)
    for a, b in zip(
        jax.tree.leaves(restored["params"]), jax.tree.leaves(state.params)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b))
    assert restored["epoch"] == 1


def test_prefetch_to_device_order_and_errors():
    from pointcloud_bridge_tpu.train.loop import prefetch_to_device

    batches = [{"x": np.full((2,), i)} for i in range(7)]
    got = list(prefetch_to_device(iter(batches), lambda b: b["x"] + 1, size=3))
    assert [int(g[0]) for g in got] == [1, 2, 3, 4, 5, 6, 7]
    # size<=1 falls back to synchronous
    got = list(prefetch_to_device(iter(batches), lambda b: b["x"], size=0))
    assert len(got) == 7

    def boom(b):
        if int(b["x"][0]) == 3:
            raise RuntimeError("conversion failed")
        return b["x"]

    with pytest.raises(RuntimeError, match="conversion failed"):
        list(prefetch_to_device(iter(batches), boom, size=2))


@pytest.mark.slow
def test_ema_and_warmup(tmp_path):
    """ema_decay>0: EMA weights are validated/deployed (best_model) and the
    EMA tree rides latest_checkpoint for exact resume; warmup_epochs ramps
    the logged lr linearly on top of the base scheduler."""
    import jax

    from pointcloud_bridge_tpu.train import train
    from pointcloud_bridge_tpu.utils.checkpoint import restore_checkpoint

    tr, va = _tiny_datasets()
    cfg = Config.from_dict(
        {
            "num_classes": 5,
            "batch_size": 4,
            "num_epochs": 4,
            "learning_rate": 1e-3,
            "model": "pointnet2_ssg",
        }
    )
    cfg.model.extra = {"sa_npoints": (64, 32, 16)}
    cfg.train.scheduler = "step"  # 0.7^(epoch//10): constant over 4 epochs
    cfg.train.warmup_epochs = 4
    cfg.train.ema_decay = 0.5
    out = train(cfg, tr, va, exp_dir=str(tmp_path / "exp"))

    lrs = [row["lr"] for row in out["history"]]
    np.testing.assert_allclose(lrs, [2.5e-4, 5e-4, 7.5e-4, 1e-3], rtol=1e-6)

    state = out["state"]
    latest = restore_checkpoint(
        str(tmp_path / "exp" / "latest_checkpoint"), {"params": state.params}
    )
    ema = restore_checkpoint(
        str(tmp_path / "exp" / "latest_ema"), {"params": state.params}
    )
    # EMA lags the raw params (decay 0.5, a few epochs of movement)
    deltas = [
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(
            jax.tree.leaves(latest["params"]), jax.tree.leaves(ema["params"])
        )
    ]
    assert max(deltas) > 0.0
    # best_model stores the deployed (EMA) set: its tree matches params'
    best = restore_checkpoint(
        str(tmp_path / "exp" / "best_model"), {"params": state.params}
    )
    assert jax.tree.structure(best["params"]) == jax.tree.structure(state.params)

    # resume must pick the EMA tree back up without crashing
    cfg.train.num_epochs = 5
    out2 = train(cfg, tr, va, exp_dir=str(tmp_path / "exp"), resume=True)
    assert out2["history"][-1]["epoch"] == 5


@pytest.mark.slow
def test_warm_start_params_only(tmp_path):
    """resume=True over an exp dir holding a params-only checkpoint (the
    shape tools/import_ckpt writes for migrated torch weights) warm-starts
    the weights with a FRESH optimizer — the reference's best_model.pth
    warm-start semantics (Partsize train.py:86-94) — instead of crashing on
    the missing opt_state."""
    import jax

    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train import train
    from pointcloud_bridge_tpu.utils.checkpoint import save_checkpoint

    tr, va = _tiny_datasets()
    model = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(64, 32, 16))
    xyz0 = np.zeros((1, 256, 3), np.float32)
    variables = model.init(jax.random.PRNGKey(123), xyz0, xyz0, train=False)
    exp = str(tmp_path / "exp")
    os.makedirs(exp, exist_ok=True)
    save_checkpoint(
        os.path.join(exp, "best_model"),
        {"params": variables["params"],
         "batch_stats": variables["batch_stats"],
         "source_torch": "/fake/best_model.pth", "epoch": 42},
    )

    cfg = Config.from_dict(
        {
            "num_classes": 5,
            "batch_size": 4,
            "num_epochs": 1,
            "learning_rate": 0.0,  # lr 0: params stay at the warm start
            "model": "pointnet2_ssg",
        }
    )
    cfg.model.extra = {"sa_npoints": (64, 32, 16)}
    out = train(cfg, tr, va, exp_dir=exp, resume=True)

    # fresh epoch schedule (NOT 43): params-only => warm start, not resume
    assert out["history"][0]["epoch"] == 1
    # lr=0 Adam leaves params where the warm start put them — proves the
    # checkpointed tree was actually loaded, not a fresh seed-0 init
    for got, want in zip(
        jax.tree.leaves(out["state"].params),
        jax.tree.leaves(variables["params"]),
    ):
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=1e-6
        )
