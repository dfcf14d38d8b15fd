"""Model-level weight-transfer logits parity vs the EXECUTED torch reference.

For each flagship model we instantiate the torch reference (CPU), randomize
its BatchNorm affine + running stats (fresh-init BN is an identity map — a
mapping bug would be invisible), convert its state_dict through
utils/torch_import.py, and assert eval-mode logits agree on identical inputs.
Param-count parity alone cannot prove architecture equality (BN eps/ordering,
activation placement, head layout can silently diverge); this does.

Reference anchors:
  - PointNet2 SSG  Highway_bridge/models/model.py:12-56
  - PointNetSeg    Highway_bridge/models/pointnet.py:59-173
  - DGCNN (global) Highway_bridge/models/model.py:372-482
  - PTv3           Highway_bridge/models/PointTransformerV3.py:173-304

The reference FPS start is torch.randint (stochastic); we pin it to index 0
on both sides (ours defaults to 0; theirs is monkeypatched) — the FPS
*algorithm* itself is parity-tested in test_reference_op_parity.py.
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
    """Import the reference models as a package (they use relative imports)."""
    if not os.path.isdir(REF_MODELS):
        pytest.skip("reference checkout not available")
    sys.path.insert(0, os.path.dirname(REF_MODELS))
    import importlib

    mod = importlib.import_module("models")
    for sub in ("pointnet2_utils", "model", "pointnet", "PointTransformerV3"):
        importlib.import_module(f"models.{sub}")
    yield mod
    sys.path.pop(0)


def _randomize_bn(torch, model, seed=0):
    """BN affine + running stats away from the identity so the mapping of
    scale/bias/mean/var is actually exercised."""
    g = torch.Generator().manual_seed(seed)
    for m in model.modules():
        if isinstance(
            m, (torch.nn.BatchNorm1d, torch.nn.BatchNorm2d, torch.nn.BatchNorm3d)
        ):
            with torch.no_grad():
                m.weight.copy_(0.5 + torch.rand(m.weight.shape, generator=g))
                m.bias.copy_(0.1 * torch.randn(m.bias.shape, generator=g))
                m.running_mean.copy_(
                    0.1 * torch.randn(m.running_mean.shape, generator=g)
                )
                m.running_var.copy_(0.5 + torch.rand(m.running_var.shape, generator=g))


def _convert_and_check(name, torch_model, our_model, sample_args):
    import jax

    from pointcloud_bridge_tpu.utils.torch_import import (
        convert_state_dict,
        validate_variables,
    )

    sd = {k: v.detach().numpy() for k, v in torch_model.state_dict().items()}
    variables = convert_state_dict(name, sd, strict=True)
    init_vars = our_model.init(jax.random.PRNGKey(0), *sample_args, train=False)
    validate_variables(variables, init_vars)
    return variables


def _det_fps(torch_mod):
    """Deterministic reference FPS: start index pinned to 0 (matches ours)."""
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


def test_pointnet2_ssg_logits_parity(torch, ref_pkg, monkeypatch):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    utils = sys.modules["models.pointnet2_utils"]
    monkeypatch.setattr(utils, "farthest_point_sample", _det_fps(utils))

    rng = np.random.default_rng(0)
    b, n = 2, 512
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = ref_pkg.model.PointNet2(num_classes=5).eval()
    _randomize_bn(torch, tm)
    # shrink SA sizes so CPU torch FPS (python loop) stays fast
    ours = get_model("pointnet2_ssg", num_classes=5, sa_npoints=(128, 64, 16))

    variables = _convert_and_check(
        "pointnet2_ssg", tm, ours, (jnp.asarray(xyz), jnp.asarray(rgb))
    )
    # same SA sizes on the torch side
    tm.sa1.npoint, tm.sa2.npoint, tm.sa3.npoint = 128, 64, 16

    with torch.no_grad():
        theirs = tm(torch.tensor(xyz), torch.tensor(rgb)).numpy()  # [B, C, N]
    theirs = np.transpose(theirs, (0, 2, 1))
    got = np.asarray(
        ours.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb), train=False)
    )
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_pointnet_logits_parity(torch, ref_pkg):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    rng = np.random.default_rng(1)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = ref_pkg.pointnet.PointNetSeg(
        num_classes=5, feature_transform=True, feature_dim=3
    ).eval()
    _randomize_bn(torch, tm, seed=1)
    ours = get_model("pointnet", num_classes=5)

    variables = _convert_and_check(
        "pointnet", tm, ours, (jnp.asarray(xyz), jnp.asarray(rgb))
    )
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz), torch.tensor(rgb)).numpy()  # [B, C, N]
    theirs = np.transpose(theirs, (0, 2, 1))
    got = np.asarray(
        ours.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb), train=False)
    )
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_dgcnn_global_logits_parity(torch, ref_pkg):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    rng = np.random.default_rng(2)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = ref_pkg.model.DGCNN(num_classes=5, k=16).eval()
    _randomize_bn(torch, tm, seed=2)
    ours = get_model("dgcnn_global", num_classes=5, k=16)

    variables = _convert_and_check(
        "dgcnn_global", tm, ours, (jnp.asarray(xyz), None)
    )
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz)).numpy()  # [B, N, C]
    got = np.asarray(ours.apply(variables, jnp.asarray(xyz), None, train=False))
    np.testing.assert_allclose(got, theirs, rtol=5e-4, atol=5e-4)


def test_ptv3_logits_parity(torch, ref_pkg):
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    rng = np.random.default_rng(3)
    b, n = 2, 128
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)
    rgb = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = ref_pkg.PointTransformerV3.PointTransformerV3(
        num_classes=5, d_in=6, embed_dim=96, depth=3, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0,
    ).eval()
    _randomize_bn(torch, tm, seed=3)
    ours = get_model(
        "ptv3", num_classes=5, d_in=6, embed_dim=96, depth=3, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0,
    )

    variables = _convert_and_check(
        "ptv3", tm, ours, (jnp.asarray(xyz), jnp.asarray(rgb))
    )
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz), torch.tensor(rgb)).numpy()  # [B, N, C]
    got = np.asarray(
        ours.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb), train=False)
    )
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_checkpoint_roundtrip_via_file(torch, ref_pkg, tmp_path):
    """load_torch_checkpoint handles the reference's wrapped .pth format."""
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.torch_import import load_torch_checkpoint

    tm = ref_pkg.PointTransformerV3.PointTransformerV3(
        num_classes=5, d_in=6, embed_dim=96, depth=2, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0,
    ).eval()
    _randomize_bn(torch, tm, seed=4)
    path = tmp_path / "ckpt.pth"
    torch.save({"epoch": 3, "model_state_dict": tm.state_dict()}, path)

    variables = load_torch_checkpoint("ptv3", str(path))
    rng = np.random.default_rng(4)
    xyz = rng.uniform(size=(1, 64, 3)).astype(np.float32)
    rgb = rng.uniform(size=(1, 64, 3)).astype(np.float32)
    ours = get_model(
        "ptv3", num_classes=5, d_in=6, embed_dim=96, depth=2, num_heads=4,
        drop_rate=0.0, attn_drop_rate=0.0, head_drop_rate=0.0,
    )
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz), torch.tensor(rgb)).numpy()
    got = np.asarray(
        ours.apply(variables, jnp.asarray(xyz), jnp.asarray(rgb), train=False)
    )
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


PARTSIZE_MODELS = "/root/reference/Partsize-identical/models"


@pytest.fixture(scope="module")
def partsize_pkg():
    """Partsize models use absolute sibling imports (from pointnet_util
    import ...) — load with their dir on sys.path."""
    if not os.path.isdir(PARTSIZE_MODELS):
        pytest.skip("Partsize reference not available")
    sys.path.insert(0, PARTSIZE_MODELS)
    import importlib

    mods = {
        name: importlib.import_module(name)
        for name in ("pointnet_util", "pointnet2_sem_seg", "pointnet_sem_seg")
    }
    # pointnet2_sem_seg_msg uses a RELATIVE import (`from .pointnet_util
    # import ...`), so it must live in a package: register a synthetic one
    # rooted at the Partsize models dir. Its pointnet_util is a SEPARATE
    # module instance from the flat one above — tests that pin FPS for the
    # msg model must patch "partsize_models.pointnet_util".
    import types

    pkg = types.ModuleType("partsize_models")
    pkg.__path__ = [PARTSIZE_MODELS]
    sys.modules.setdefault("partsize_models", pkg)
    mods["pointnet2_sem_seg_msg"] = importlib.import_module(
        "partsize_models.pointnet2_sem_seg_msg"
    )
    mods["msg_pointnet_util"] = sys.modules["partsize_models.pointnet_util"]
    yield mods
    sys.path.pop(0)


def test_partsize_pointnet2_sem_seg_logits_parity(torch, partsize_pkg, monkeypatch):
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.torch_import import (
        convert_state_dict,
        validate_variables,
    )

    utils = partsize_pkg["pointnet_util"]
    monkeypatch.setattr(utils, "farthest_point_sample", _det_fps(utils))

    rng = np.random.default_rng(5)
    b, n = 1, 1280  # > sa1 npoint (1024): reference sizes run as-is
    block9 = rng.uniform(size=(b, n, 9)).astype(np.float32)
    xyz = block9[:, :, :3].copy()

    tm = partsize_pkg["pointnet2_sem_seg"].get_model(5).eval()
    _randomize_bn(torch, tm, seed=5)
    ours = get_model("pointnet2_sem_seg", num_classes=5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict("pointnet2_sem_seg", sd, strict=True)
    init_vars = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(block9), train=False
    )
    validate_variables(variables, init_vars)

    with torch.no_grad():
        theirs, _ = tm(torch.tensor(np.transpose(block9, (0, 2, 1))))
    theirs = theirs.numpy()  # [B, N, C] log-probs
    logits = ours.apply(
        variables, jnp.asarray(xyz), jnp.asarray(block9), train=False
    )
    got = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=3e-4)


def test_partsize_pointnet2_msg_logits_parity(torch, partsize_pkg, monkeypatch):
    """The BASELINE north-star model (PointNet++-MSG 9-ch,
    pointnet2_sem_seg_msg.py:7-42): torch weights transferred branch-by-branch
    (incl. the MSG module's [feats, rel-xyz] concat-order permutation on each
    branch's first conv) must reproduce the reference log-probs."""
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.torch_import import (
        convert_state_dict,
        validate_variables,
    )

    utils = partsize_pkg["msg_pointnet_util"]
    monkeypatch.setattr(utils, "farthest_point_sample", _det_fps(utils))

    rng = np.random.default_rng(8)
    b, n = 1, 1280  # > sa1 npoint (1024): reference sizes run as-is
    block9 = rng.uniform(size=(b, n, 9)).astype(np.float32)
    xyz = block9[:, :, :3].copy()

    tm = partsize_pkg["pointnet2_sem_seg_msg"].get_model(5).eval()
    _randomize_bn(torch, tm, seed=8)
    ours = get_model("pointnet2_msg", num_classes=5)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict("pointnet2_msg", sd, strict=True)
    init_vars = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(block9), train=False
    )
    validate_variables(variables, init_vars)

    with torch.no_grad():
        theirs, _ = tm(torch.tensor(np.transpose(block9, (0, 2, 1))))
    theirs = theirs.numpy()  # [B, N, C] log-probs
    logits = ours.apply(
        variables, jnp.asarray(xyz), jnp.asarray(block9), train=False
    )
    got = np.asarray(jax.nn.log_softmax(logits, axis=-1))
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=3e-4)


def test_partsize_pointnet_sem_seg_logits_parity(torch, partsize_pkg):
    import jax
    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model
    from pointcloud_bridge_tpu.utils.torch_import import (
        convert_state_dict,
        validate_variables,
    )

    rng = np.random.default_rng(6)
    b, n = 2, 256
    block9 = rng.uniform(size=(b, n, 9)).astype(np.float32)
    xyz = block9[:, :, :3].copy()
    feats = block9[:, :, 3:].copy()

    tm = partsize_pkg["pointnet_sem_seg"].get_model(5, with_rgb=True).eval()
    _randomize_bn(torch, tm, seed=6)
    ours = get_model("pointnet_sem_seg", num_classes=5, with_rgb=True)

    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables = convert_state_dict("pointnet_sem_seg", sd, strict=True)
    init_vars = ours.init(
        jax.random.PRNGKey(0), jnp.asarray(xyz), jnp.asarray(feats), train=False
    )
    validate_variables(variables, init_vars)

    with torch.no_grad():
        theirs, _ = tm(torch.tensor(np.transpose(block9, (0, 2, 1))))
    theirs = theirs.numpy()  # [B, N, C] log-probs
    logits = np.asarray(
        ours.apply(variables, jnp.asarray(xyz), jnp.asarray(feats), train=False)
    )
    got = np.asarray(jax.nn.log_softmax(jnp.asarray(logits), axis=-1))
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=3e-4)


def test_dgcnn_seg_logits_parity(torch, ref_pkg):
    """The k=20 TRAINED DGCNN seg variant (Highway_bridge/models/
    DGCNN.py:6-172, the best-mIoU model in the repo's logs): per-point head
    over [local(320) | global(1024)] with the standalone local_bn."""
    import importlib

    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    dg = importlib.import_module("models.DGCNN")

    rng = np.random.default_rng(9)
    b, n = 2, 256
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = dg.DGCNN(num_classes=5, k=16).eval()
    _randomize_bn(torch, tm, seed=9)
    ours = get_model("dgcnn", num_classes=5, k=16)

    variables = _convert_and_check("dgcnn", tm, ours, (jnp.asarray(xyz), None))
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz)).numpy()  # [B, N, C]
    got = np.asarray(ours.apply(variables, jnp.asarray(xyz), None, train=False))
    np.testing.assert_allclose(got, theirs, rtol=5e-4, atol=5e-4)


def _det_random_sampling(torch):
    """Deterministic reference RandomSampling: stride subset matching our
    eval-mode path (models/randlanet.py: idx = (arange(s) * stride) % n)."""

    def fwd(self, xyz, features=None):
        b, n, _ = xyz.shape
        s = max(1, int(n * self.ratio))
        stride = max(1, n // s)
        idx = (torch.arange(s) * stride) % n
        new_xyz = xyz[:, idx]
        new_features = features[:, idx] if features is not None else None
        return new_xyz, new_features, idx.unsqueeze(0).repeat(b, 1)

    return fwd


@pytest.mark.slow
def test_randlanet_logits_parity(torch, ref_pkg, monkeypatch):
    """RandLANet (RandLANet.py:302-443): random sampling pinned to the same
    deterministic stride subset on both sides (the reference's unseeded
    torch.randperm is the ONLY stochastic op; everything downstream — kNN,
    LSE, attentive pooling, DRB, linear-interp upsampling, head — must then
    agree bitwise-ish)."""
    import importlib

    import jax.numpy as jnp

    from pointcloud_bridge_tpu.models import get_model

    rl = importlib.import_module("models.RandLANet")
    monkeypatch.setattr(
        rl.RandomSampling, "forward", _det_random_sampling(torch)
    )

    rng = np.random.default_rng(10)
    # n must keep >= k=16 points at the deepest level (.35 * .25^3 of n):
    # the reference KNN module has a fixed k (RandLANet.py:48-73)
    b, n = 1, 4096
    xyz = rng.uniform(size=(b, n, 3)).astype(np.float32)

    tm = rl.RandLANet(num_classes=5, d_in=3).eval()
    _randomize_bn(torch, tm, seed=10)
    ours = get_model("randlanet", num_classes=5)

    variables = _convert_and_check(
        "randlanet", tm, ours, (jnp.asarray(xyz), None)
    )
    with torch.no_grad():
        theirs = tm(torch.tensor(xyz)).numpy()  # [B, C, N]
    theirs = np.transpose(theirs, (0, 2, 1))
    # eval mode (no sampling rng): ours takes the same stride subsets
    got = np.asarray(ours.apply(variables, jnp.asarray(xyz), None, train=False))
    np.testing.assert_allclose(got, theirs, rtol=5e-4, atol=5e-4)
