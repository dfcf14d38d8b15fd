"""Same-data TRAINING parity vs the executed torch reference (SURVEY §7 hard
part #5, VERDICT round-2 missing #2).

Strong form: both frameworks start from the SAME weights (torch init imported
through utils/torch_import.py), see the SAME batches in the SAME order, with
dropout disabled and the FPS start pinned — so per-step losses must track
each other closely (optimizer: Adam lr 1e-3 + L2-in-grad wd 1e-4; BN
train-mode batch stats, torch momentum 0.1 == flax 0.9). This executes the
whole training stack — forward, CE loss, backward, Adam update, BN running
stats — against the reference, not just the forward.

Init-distribution note (VERDICT missing #4): torch Conv/Linear default init
is kaiming-uniform (fan_in, a=sqrt(5)); flax Dense is lecun-normal;
Partsize's weights_init applies xavier-normal (tool_utils.py:5-17). Starting
from imported torch weights removes that difference here; the from-scratch
distributional comparison lives in bench/convergence_parity.py.
"""

import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.torchref

REF_MODELS = "/root/reference/Highway_bridge/models"


@pytest.fixture(scope="module")
def torch():
    import torch as t

    t.manual_seed(0)
    return t


@pytest.fixture(scope="module")
def ref_pkg():
    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(REF_MODELS))
    import importlib

    mod = importlib.import_module("models")
    for sub in ("pointnet2_utils", "model", "PointTransformerV3"):
        importlib.import_module(f"models.{sub}")
    yield mod
    sys.path.pop(0)


def _det_fps_torch():
    import torch as t

    def fps(xyz, npoint):
        device = xyz.device
        B, N, C = xyz.shape
        centroids = t.zeros(B, npoint, dtype=t.long).to(device)
        distance = t.ones(B, N).to(device) * 1e10
        farthest = t.zeros(B, dtype=t.long).to(device)
        batch_indices = t.arange(B, dtype=t.long).to(device)
        for i in range(npoint):
            centroids[:, i] = farthest
            centroid = xyz[batch_indices, farthest, :].view(B, 1, 3)
            dist = t.sum((xyz - centroid) ** 2, -1)
            mask = dist < distance
            distance[mask] = dist[mask]
            farthest = t.max(distance, -1)[1]
        return centroids

    return fps


def _synthetic_batches(n_steps, b, n, num_classes, seed=0):
    rng = np.random.default_rng(seed)
    batches = []
    for _ in range(n_steps):
        xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
        rgb = rng.uniform(size=(b, n, 3)).astype(np.float32)
        # learnable structure: label from z-slabs plus a color cue
        z = xyz[..., 2]
        labels = np.digitize(z, np.linspace(0, 1, num_classes + 1)[1:-1])
        labels = labels.astype(np.int64)
        batches.append((xyz, rgb, labels))
    return batches


@pytest.mark.slow
def test_pointnet2_train_trajectory_matches_reference(torch, ref_pkg, monkeypatch):
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from pointcloud_bridge_tpu.utils.torch_import import convert_state_dict

    utils = sys.modules["models.pointnet2_utils"]
    monkeypatch.setattr(utils, "farthest_point_sample", _det_fps_torch())

    num_classes, b, n, n_steps = 4, 2, 256, 8
    lr, wd = 1e-3, 1e-4
    batches = _synthetic_batches(n_steps, b, n, num_classes)

    # ---- torch side: save the init BEFORE training, then train
    tm = ref_pkg.model.PointNet2(num_classes=num_classes)
    tm.sa1.npoint, tm.sa2.npoint, tm.sa3.npoint = 64, 32, 16
    tm.drop1.p = 0.0
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    torch_losses = []
    for xyz, rgb, labels in batches:
        out = tm(torch.tensor(xyz), torch.tensor(rgb))
        loss = torch.nn.functional.cross_entropy(out, torch.tensor(labels))
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    ours = get_model(
        "pointnet2_ssg", num_classes=num_classes, sa_npoints=(64, 32, 16),
        dropout_rate=0.0,
    )
    variables = convert_state_dict("pointnet2_ssg", sd0, strict=True)
    optimizer = make_optimizer(wd)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    step_fn = make_train_step(ours, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(num_classes)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for xyz, rgb, labels in batches:
        batch = {
            "points": jnp.asarray(xyz),
            "colors": jnp.asarray(rgb),
            "labels": jnp.asarray(labels.astype(np.int32)),
        }
        state, m = step_fn(state, batch, jnp.float32(lr), cw, key)
        our_losses.append(float(m["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    # per-step agreement: identical weights/data/optimizer -> tight tracking
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.02, atol=0.02)
    # both must actually learn (loss decreasing over the window)
    assert our_losses[-1] < our_losses[0]
    assert torch_losses[-1] < torch_losses[0]


def test_ptv3_train_trajectory_matches_reference(torch, ref_pkg):
    """Same-weights/same-data step parity for the TRANSFORMER stack
    (reference PointTransformerV3.py:173-304): attention, LayerNorm, GEGLU
    MLPs, learnable pos-embed, and the BatchNorm-over-B*N head all execute
    forward+backward+Adam against the torch reference. Complements the
    PointNet2 test above, which exercises the conv/neighborhood stack."""
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from pointcloud_bridge_tpu.utils.torch_import import convert_state_dict

    num_classes, b, n, n_steps = 4, 2, 64, 8
    lr, wd = 1e-3, 1e-4
    batches = _synthetic_batches(n_steps, b, n, num_classes, seed=7)

    tm = ref_pkg.PointTransformerV3.PointTransformerV3(
        num_classes=num_classes, d_in=6, embed_dim=96, depth=2, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0,
    )
    for m in tm.modules():  # the head carries a hardcoded Dropout(0.5)
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    torch_losses = []
    for xyz, rgb, labels in batches:
        out = tm(torch.tensor(xyz), torch.tensor(rgb))  # [B, N, C]
        loss = torch.nn.functional.cross_entropy(
            out.reshape(-1, num_classes), torch.tensor(labels).reshape(-1)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    ours = get_model(
        "ptv3", num_classes=num_classes, d_in=6, embed_dim=96, depth=2,
        num_heads=4, drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0,
    )
    variables = convert_state_dict("ptv3", sd0, strict=True)
    optimizer = make_optimizer(wd)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    step_fn = make_train_step(ours, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(num_classes)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for xyz, rgb, labels in batches:
        batch = {
            "points": jnp.asarray(xyz),
            "colors": jnp.asarray(rgb),
            "labels": jnp.asarray(labels.astype(np.int32)),
        }
        state, m = step_fn(state, batch, jnp.float32(lr), cw, key)
        our_losses.append(float(m["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.02, atol=0.02)
    assert our_losses[-1] < our_losses[0]
    assert torch_losses[-1] < torch_losses[0]


@pytest.fixture(scope="module")
def msg_pkg():
    """Partsize pointnet2_sem_seg_msg uses a RELATIVE import — load it under
    a synthetic package (see tests/test_reference_model_parity.py)."""
    models_dir = "/root/reference/Partsize-identical/models"
    if not os.path.isdir(models_dir):
        pytest.skip("Partsize reference not available")
    import importlib
    import types

    pkg = types.ModuleType("partsize_models")
    pkg.__path__ = [models_dir]
    sys.modules.setdefault("partsize_models", pkg)
    mod = importlib.import_module("partsize_models.pointnet2_sem_seg_msg")
    yield {
        "msg": mod,
        "util": sys.modules["partsize_models.pointnet_util"],
    }


@pytest.mark.slow
def test_pointnet2_msg_train_trajectory_matches_reference(torch, msg_pkg, monkeypatch):
    """Same-weights/same-data step parity for the BASELINE north-star model
    (Partsize 9-ch PointNet++ MSG, pointnet2_sem_seg_msg.py:7-42): 4 MSG SA
    levels (dual-radius ball query + branch MLPs), 4 FPs, and the
    log-softmax head execute forward+NLL+backward+Adam against the torch
    reference — the 'equal mIoU' half of the north-star claim, made
    executable at step granularity. Fixed reference npoints (1024/...)
    require n > 1024 blocks, hence the slow mark."""
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from pointcloud_bridge_tpu.utils.torch_import import convert_state_dict

    monkeypatch.setattr(
        msg_pkg["util"], "farthest_point_sample", _det_fps_torch()
    )

    num_classes, b, n, n_steps = 4, 1, 1280, 5
    lr, wd = 1e-3, 1e-4
    rng = np.random.default_rng(13)
    batches = []
    for _ in range(n_steps):
        block9 = rng.uniform(size=(b, n, 9)).astype(np.float32)
        z = block9[..., 2]
        labels = np.digitize(
            z, np.linspace(0, 1, num_classes + 1)[1:-1]
        ).astype(np.int64)
        batches.append((block9, labels))

    torch.manual_seed(21)  # pin the init draw regardless of test order
    tm = msg_pkg["msg"].get_model(num_classes)
    for m in tm.modules():  # drop1 is a hardcoded Dropout(0.5)
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    torch_losses = []
    for block9, labels in batches:
        logprobs, _ = tm(torch.tensor(np.transpose(block9, (0, 2, 1))))
        loss = torch.nn.functional.nll_loss(  # == CE on the logits
            logprobs.reshape(-1, num_classes), torch.tensor(labels).reshape(-1)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    ours = get_model("pointnet2_msg", num_classes=num_classes, dropout_rate=0.0)
    variables = convert_state_dict("pointnet2_msg", sd0, strict=True)
    optimizer = make_optimizer(wd)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    step_fn = make_train_step(ours, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(num_classes)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for block9, labels in batches:
        batch = {
            "points": jnp.asarray(block9[:, :, :3]),
            "colors": jnp.asarray(block9),
            "labels": jnp.asarray(labels.astype(np.int32)),
        }
        state, m = step_fn(state, batch, jnp.float32(lr), cw, key)
        our_losses.append(float(m["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.02, atol=0.02)
    assert our_losses[-1] < our_losses[0]
    assert torch_losses[-1] < torch_losses[0]


def test_dgcnn_train_trajectory_matches_reference(torch, ref_pkg):
    """Same-weights/same-data step parity for the dynamic-graph stack
    (reference model.py:372-482): feature-space kNN rebuilt per layer,
    EdgeConv gather+max, LeakyReLU BN convs, and the global max+avg pooled
    head all execute forward+backward+Adam against the torch reference.
    On CPU both kNNs are exact, so the step-0 neighbor graphs match and the
    first losses agree to ~1e-5. Unlike the fixed-geometry models above,
    DGCNN's graph is rebuilt from FEATURES each layer: after a step or two,
    f32 reassociation noise in backward/Adam flips borderline kNN edges,
    a discrete change that compounds — so later steps are asserted to a
    loose band, not tight tracking (the same run-to-run sensitivity exists
    torch-vs-torch across BLAS builds)."""
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from pointcloud_bridge_tpu.utils.torch_import import convert_state_dict

    num_classes, b, n, n_steps = 4, 2, 96, 8
    lr, wd = 1e-3, 1e-4
    batches = _synthetic_batches(n_steps, b, n, num_classes, seed=11)

    torch.manual_seed(42)  # pin the init draw regardless of test order
    tm = ref_pkg.model.DGCNN(num_classes=num_classes, k=12)
    for m in tm.modules():  # dp1/dp2 are hardcoded Dropout(0.5)
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    torch_losses = []
    for xyz, _rgb, labels in batches:
        out = tm(torch.tensor(xyz))  # [B, N, C]
        loss = torch.nn.functional.cross_entropy(
            out.reshape(-1, num_classes), torch.tensor(labels).reshape(-1)
        )
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    ours = get_model(
        "dgcnn_global", num_classes=num_classes, k=12, dropout_rate=0.0
    )
    variables = convert_state_dict("dgcnn_global", sd0, strict=True)
    optimizer = make_optimizer(wd)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    step_fn = make_train_step(ours, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(num_classes)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for xyz, _rgb, labels in batches:
        batch = {
            "points": jnp.asarray(xyz),
            "colors": None,
            "labels": jnp.asarray(labels.astype(np.int32)),
        }
        state, m = step_fn(state, batch, jnp.float32(lr), cw, key)
        our_losses.append(float(m["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    # identical graphs + weights at step 0: tight agreement (this is the
    # deterministic claim — one Adam step can already flip borderline edges)
    np.testing.assert_allclose(our_losses[0], torch_losses[0], rtol=1e-3)
    # after kNN-edge flips decorrelate the dynamic graphs: same loss band
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.10)


@pytest.mark.slow
def test_randlanet_train_trajectory_matches_reference(torch, ref_pkg, monkeypatch):
    """Same-weights/same-data step parity for the RANDOM-SAMPLING encoder/
    decoder stack (reference RandLANet.py:302-443) — the fifth architecture
    family (VERDICT r3 #5). The reference's unseeded torch.randperm sampling
    is pinned to the same deterministic stride subset our eval path takes
    (make_train_step passes no 'sampling' rng, so our train-mode forward
    uses it too); with sampling pinned, kNN/LSE/attentive-pooling/DRB/
    linear-interp upsampling execute forward+CE+backward+Adam against the
    torch reference. n must keep >= k=16 points at the deepest level
    (.35 * .25^3 * n), hence n=4096 and the slow mark."""
    import importlib

    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.config import Config
    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.train.loop import (
        TrainState,
        make_optimizer,
        make_train_step,
    )
    from pointcloud_bridge_tpu.utils.torch_import import convert_state_dict

    rl = importlib.import_module("models.RandLANet")

    def det_sampling(self, xyz, features=None):
        b, n, _ = xyz.shape
        s = max(1, int(n * self.ratio))
        stride = max(1, n // s)
        idx = (torch.arange(s) * stride) % n
        new_xyz = xyz[:, idx]
        new_features = features[:, idx] if features is not None else None
        return new_xyz, new_features, idx.unsqueeze(0).repeat(b, 1)

    monkeypatch.setattr(rl.RandomSampling, "forward", det_sampling)

    num_classes, b, n, n_steps = 4, 1, 4096, 5
    lr, wd = 1e-3, 1e-4
    batches = _synthetic_batches(n_steps, b, n, num_classes, seed=17)

    torch.manual_seed(33)  # pin the init draw regardless of test order
    tm = rl.RandLANet(num_classes=num_classes, d_in=3)
    for m in tm.modules():  # seg_head carries a hardcoded Dropout(0.5)
        if isinstance(m, torch.nn.Dropout):
            m.p = 0.0
    sd0 = {k: v.detach().clone().numpy() for k, v in tm.state_dict().items()}
    tm.train()
    opt = torch.optim.Adam(tm.parameters(), lr=lr, weight_decay=wd)
    torch_losses = []
    for xyz, _rgb, labels in batches:
        out = tm(torch.tensor(xyz))  # [B, C, N]
        loss = torch.nn.functional.cross_entropy(out, torch.tensor(labels))
        opt.zero_grad()
        loss.backward()
        opt.step()
        torch_losses.append(float(loss.detach()))

    ours = get_model("randlanet", num_classes=num_classes, dropout_rate=0.0)
    variables = convert_state_dict("randlanet", sd0, strict=True)
    optimizer = make_optimizer(wd)
    params = variables["params"]
    state = TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=variables["batch_stats"],
        opt_state=optimizer.init(params),
    )
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    step_fn = make_train_step(ours, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(num_classes)
    key = jax.random.PRNGKey(0)
    our_losses = []
    for xyz, _rgb, labels in batches:
        batch = {
            "points": jnp.asarray(xyz),
            "colors": None,
            "labels": jnp.asarray(labels.astype(np.int32)),
        }
        state, m = step_fn(state, batch, jnp.float32(lr), cw, key)
        our_losses.append(float(m["loss"]))

    torch_losses = np.asarray(torch_losses)
    our_losses = np.asarray(our_losses)
    np.testing.assert_allclose(our_losses, torch_losses, rtol=0.02, atol=0.02)
    assert our_losses[-1] < our_losses[0]
    assert torch_losses[-1] < torch_losses[0]
