"""From-scratch convergence comparison vs the executed torch reference.

tests/test_reference_train_parity.py proves step-level trajectory parity from
IDENTICAL weights; this script answers the distributional question (SURVEY §7
hard part #5): trained from each framework's own init on the same synthetic
scenes/splits/hyperparameters, do both reach the same quality band?

Init distributions differ by design and are documented here (VERDICT round-2
missing #4): torch Conv/Linear default to kaiming-uniform(fan_in, a=sqrt(5));
flax Dense is lecun-normal; Partsize's weights_init applies xavier-normal
(Partsize-identical/tool_utils/tool_utils.py:5-17). The comparison is
therefore distributional over seeds, not per-step.

Usage:  python -m pointcloud_bridge_tpu.bench.convergence_parity
Writes benchmark_results/convergence_parity.json and prints a table.
Runs entirely on CPU (torch has no TPU here); a few minutes.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REF_MODELS = "/root/reference/Highway_bridge/models"

NUM_CLASSES = 4
B, N = 4, 512
SA = (128, 64, 16)
STEPS_PER_EPOCH = 25
EPOCHS = 6
LR, WD = 1e-3, 1e-4
SEEDS = (0, 1, 2)


def make_data(seed):
    rng = np.random.default_rng(seed)

    def batch():
        xyz = rng.uniform(size=(B, N, 3)).astype(np.float32)
        rgb = rng.uniform(size=(B, N, 3)).astype(np.float32)
        z = xyz[..., 2] + 0.08 * rgb[..., 0]
        # fixed global slab edges (z in (0, 1.08)) so the label function is
        # identical across batches/seeds — a genuinely learnable target
        edges = np.array([0.27, 0.54, 0.81])
        labels = np.digitize(z, edges).astype(np.int64)
        return xyz, rgb, labels

    train = [batch() for _ in range(STEPS_PER_EPOCH * EPOCHS)]
    val = [batch() for _ in range(4)]
    return train, val


def miou_from_preds(preds, labels):
    ious = []
    for c in range(NUM_CLASSES):
        inter = np.sum((preds == c) & (labels == c))
        union = np.sum((preds == c) | (labels == c))
        if union:
            ious.append(inter / union)
    return float(np.mean(ious)) if ious else 0.0


def run_torch(train, val, seed):
    import importlib

    import torch
    import torch.nn.functional as F

    sys.path.insert(0, os.path.dirname(REF_MODELS))
    try:
        models = importlib.import_module("models")
        importlib.import_module("models.model")
        importlib.import_module("models.pointnet2_utils")
        utils = sys.modules["models.pointnet2_utils"]

        # pin the FPS start (torch.randint otherwise)
        def det_fps(xyz, npoint):
            device = xyz.device
            Bx, Nx, _ = xyz.shape
            centroids = torch.zeros(Bx, npoint, dtype=torch.long, device=device)
            distance = torch.ones(Bx, Nx, device=device) * 1e10
            farthest = torch.zeros(Bx, dtype=torch.long, device=device)
            bi = torch.arange(Bx, dtype=torch.long, device=device)
            for i in range(npoint):
                centroids[:, i] = farthest
                centroid = xyz[bi, farthest, :].view(Bx, 1, 3)
                dist = torch.sum((xyz - centroid) ** 2, -1)
                mask = dist < distance
                distance[mask] = dist[mask]
                farthest = torch.max(distance, -1)[1]
            return centroids

        utils.farthest_point_sample = det_fps
        torch.manual_seed(seed)
        tm = models.model.PointNet2(num_classes=NUM_CLASSES)
        tm.sa1.npoint, tm.sa2.npoint, tm.sa3.npoint = SA
        opt = torch.optim.Adam(tm.parameters(), lr=LR, weight_decay=WD)
        curve = []
        for e in range(EPOCHS):
            tm.train()
            for xyz, rgb, labels in train[e * STEPS_PER_EPOCH:(e + 1) * STEPS_PER_EPOCH]:
                out = tm(torch.tensor(xyz), torch.tensor(rgb))
                loss = F.cross_entropy(out, torch.tensor(labels))
                opt.zero_grad()
                loss.backward()
                opt.step()
            tm.eval()
            ious = []
            with torch.no_grad():
                for xyz, rgb, labels in val:
                    out = tm(torch.tensor(xyz), torch.tensor(rgb))
                    preds = out.argmax(1).numpy()
                    ious.append(miou_from_preds(preds, labels))
            curve.append(float(np.mean(ious)))
        return curve
    finally:
        sys.path.pop(0)


def run_ours(train, val, seed):
    import jax
    import jax.numpy as jnp

    from ..config import Config
    from ..models import get_model
    from ..train.loop import create_train_state, make_optimizer, make_train_step

    model = get_model("pointnet2_ssg", num_classes=NUM_CLASSES, sa_npoints=SA)
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    optimizer = make_optimizer(WD)
    key = jax.random.PRNGKey(seed)
    sample = {"points": train[0][0][:1], "colors": train[0][1][:1]}
    state = create_train_state(model, key, sample, optimizer)
    step_fn = make_train_step(model, cfg.loss, optimizer, donate=False)
    cw = jnp.ones(NUM_CLASSES)

    @jax.jit
    def fwd(params, batch_stats, xyz, rgb):
        return model.apply(
            {"params": params, "batch_stats": batch_stats}, xyz, rgb, train=False
        )

    curve = []
    for e in range(EPOCHS):
        for xyz, rgb, labels in train[e * STEPS_PER_EPOCH:(e + 1) * STEPS_PER_EPOCH]:
            batch = {
                "points": jnp.asarray(xyz),
                "colors": jnp.asarray(rgb),
                "labels": jnp.asarray(labels.astype(np.int32)),
            }
            state, _ = step_fn(state, batch, jnp.float32(LR), cw, key)
        ious = []
        for xyz, rgb, labels in val:
            logits = fwd(state.params, state.batch_stats, jnp.asarray(xyz), jnp.asarray(rgb))
            ious.append(miou_from_preds(np.argmax(np.asarray(logits), -1), labels))
        curve.append(float(np.mean(ious)))
    return curve


def main():
    results = {"config": dict(
        num_classes=NUM_CLASSES, batch=B, points=N, sa_npoints=SA,
        steps_per_epoch=STEPS_PER_EPOCH, epochs=EPOCHS, lr=LR, wd=WD,
        seeds=list(SEEDS),
        init_note=(
            "torch: kaiming-uniform conv/linear defaults; flax: lecun-normal "
            "Dense. Distributional comparison over seeds; identical-weights "
            "step parity is tests/test_reference_train_parity.py"
        ),
    ), "torch": {}, "ours": {}}
    for seed in SEEDS:
        train, val = make_data(seed)
        results["torch"][str(seed)] = run_torch(train, val, seed)
        train, val = make_data(seed)  # regenerate: same data stream
        results["ours"][str(seed)] = run_ours(train, val, seed)
        print(f"seed {seed}: torch mIoU curve {results['torch'][str(seed)]}")
        print(f"seed {seed}: ours  mIoU curve {results['ours'][str(seed)]}")
    tf = [c[-1] for c in results["torch"].values()]
    of = [c[-1] for c in results["ours"].values()]
    results["summary"] = {
        "torch_final_miou_mean": float(np.mean(tf)),
        "torch_final_miou_std": float(np.std(tf)),
        "ours_final_miou_mean": float(np.mean(of)),
        "ours_final_miou_std": float(np.std(of)),
    }
    print("summary:", json.dumps(results["summary"], indent=2))
    out = os.path.join(os.path.dirname(__file__), "..", "..", "benchmark_results")
    os.makedirs(out, exist_ok=True)
    with open(os.path.join(out, "convergence_parity.json"), "w") as f:
        json.dump(results, f, indent=2)


if __name__ == "__main__":
    main()
