"""ptv3_pooled (hierarchical U-Net) vs flat windowed PTv3 — speed + quality.

VERDICT r4 #5's done-criterion: "measured pts/s vs the flat windowed model at
equal quality on the synthetic benchmark". Two subcommands:

- `speed` (run on the real TPU, solo): amortized chained-jit forward time
  (CLAUDE.md methodology) at the sweep harness shape B=4 x N=4096 for the
  flat trained config (384x8 h2 global), the flat windowed serving config
  (w=512, f32 + bf16 stream), and ptv3_pooled (64/128/256, enc 2/2/6,
  strides 4/4 — levels 4096/1024/256; f32 + bf16 stream). Writes
  benchmark_results/pooled_probe.json.

- `quality` (CPU or TPU): trains flat-windowed and pooled on the SAME
  synthetic bridge scenes (full_pipeline recipe densified to 4096-pt
  blocks), identical split/loss/schedule/epochs, then whole-scene K-vote
  inference on the held-out scene. Reports best val OA + scene mIoU/OA per
  model. Init distributions differ (both flax lecun-normal, so this IS
  apples-to-apples, unlike convergence_parity's torch-vs-flax caveat).

Usage:
    python -m pointcloud_bridge_tpu.bench.pooled_probe speed
    python -m pointcloud_bridge_tpu.bench.pooled_probe quality [workdir]
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

from .ptv3_break import amortized_seconds

B, N = 4, 4096

FLAT_TRAINED = {"embed_dim": 384, "depth": 8, "num_heads": 2}
FLAT_WIN = {"embed_dim": 384, "depth": 8, "num_heads": 2, "window_size": 512}
POOLED = {"dims": (64, 128, 256), "enc_depths": (2, 2, 6),
          "dec_depths": (1, 1), "strides": (4, 4), "window_size": 1024}


def _forward_seconds(name: str, kwargs: dict) -> float:
    import jax
    import jax.numpy as jnp

    from ..models import get_model

    rng = np.random.default_rng(0)
    cpu = jax.devices("cpu")[0]
    dev = jax.devices()[0]
    xyz = jax.device_put(
        jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32)), dev)
    feats = jax.device_put(
        jnp.asarray(rng.uniform(size=(B, N, 3)).astype(np.float32)), dev)
    model = get_model(name, num_classes=5, **kwargs)
    with jax.default_device(cpu):
        variables = model.init(
            jax.random.PRNGKey(0), np.asarray(xyz[:1]), np.asarray(feats[:1]),
            train=False,
        )
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))
    variables = jax.device_put(variables, dev)

    def fwd(x):
        return model.apply(variables, x, feats, train=False)

    sec = amortized_seconds(fwd, xyz, iters=12, reps=5)
    return sec, n_params


def speed(n: int = N) -> None:
    global N
    N = n
    rows = {}
    configs = [
        ("flat_win512", "ptv3", FLAT_WIN),
        ("flat_win512_bf16", "ptv3", {**FLAT_WIN, "stream_dtype": "bfloat16"}),
        ("pooled", "ptv3_pooled", POOLED),
    ]
    if n <= 4096:  # global attention's NxN scores blow up past this
        configs.insert(0, ("flat_global_384x8", "ptv3", FLAT_TRAINED))
    # bf16 stream re-probed at EVERY N: negative at 4096 (coarse attention
    # not HBM-bound there) but the fine level's share grows with N
    configs.append(("pooled_bf16", "ptv3_pooled",
                    {**POOLED, "stream_dtype": "bfloat16"}))
    for label, name, kw in configs:
        sec, n_params = _forward_seconds(name, kw)
        rows[label] = {
            "ms_fwd": round(sec * 1e3, 3),
            "points_per_sec": round(B * n / sec, 1),
            "params": int(n_params),
        }
        print(f"{label:22s}: {sec * 1e3:7.2f} ms/fwd  "
              f"({B * n / sec / 1e6:6.2f}M pts/s, {n_params/1e6:.1f}M params)",
              flush=True)
    out = {"shape": {"B": B, "N": n}, "rows": rows}
    suffix = "" if n == 4096 else f"_n{n}"
    path = os.path.join("benchmark_results", f"pooled_probe{suffix}.json")
    os.makedirs("benchmark_results", exist_ok=True)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"wrote {path}")


def quality(workdir: str = "/tmp/pcb_pooled_quality",
            num_epochs: int = 10) -> None:
    os.makedirs(workdir, exist_ok=True)
    for sub in ("train", "val", "test"):
        os.makedirs(os.path.join(workdir, sub), exist_ok=True)

    from ..data import scene_labelweights, write_las
    from ..data.dataset import _load_scene
    from ..data.synthetic import toy_bridge_scene
    from ..config import Config
    from ..train_cli import build_datasets
    from ..train import train
    from ..infer import whole_scene_vote_predict

    # denser scenes than full_pipeline (160k vs 40k pts) so 4096-pt blocks
    # at the same spatial block size stay honestly populated
    print("== generating scenes ==", flush=True)
    for split, seeds in [("train", (0, 1, 2)), ("val", (10,)),
                         ("test", (20,))]:
        for s in seeds:
            path = os.path.join(workdir, split, f"scene{s}.las")
            if not os.path.exists(path):
                xyz, rgb, labels = toy_bridge_scene(160000, seed=s)
                write_las(path, xyz, rgb, labels)

    results = {}
    for tag, model_name, extra in (
        ("flat_win512", "ptv3", FLAT_WIN),
        ("pooled", "ptv3_pooled", POOLED),
    ):
        print(f"== training {tag} ==", flush=True)
        cfg = Config.from_dict({
            "case": f"pooledq_{tag}",
            "model": model_name,
            "num_classes": 5,
            "num_points": 4096,
            "block_size": 8.0,
            "sample_rate": 0.3,
            "batch_size": 4,
            "num_epochs": num_epochs,
            "learning_rate": 0.001,
            "train_dir": os.path.join(workdir, "train"),
            "val_dir": os.path.join(workdir, "val"),
            "exp_dir_root": os.path.join(workdir, "experiments"),
            "loss": {"name": "weighted_ce", "use_class_weights": True},
        })
        cfg.model.extra = dict(extra)
        cfg.data.augment = False
        cfg.train.steps_per_dispatch = 8
        tr, va = build_datasets(cfg)
        out = train(cfg, tr, va)

        state = out["state"]
        variables = {"params": state.params,
                     "batch_stats": state.batch_stats}
        pts, cols, labels = _load_scene(
            os.path.join(workdir, "test", "scene20.las"))
        lw = scene_labelweights([labels], 5)
        pts6 = np.concatenate([pts, cols], axis=1)
        res = whole_scene_vote_predict(
            out["model"], variables, pts6, labels, lw, 5,
            block_points=4096, block_size=0.65, stride=0.33, num_votes=3,
            normalize_scene=True,
        )
        m = res["metrics"]
        results[tag] = {
            "best_val_oa": round(float(out["best_val_acc"]), 4),
            "scene_miou": round(float(m["mIoU"]), 4),
            "scene_oa": round(float(m["OA"]), 4),
        }
        print(f"{tag}: best val OA {results[tag]['best_val_oa']}, "
              f"scene mIoU {results[tag]['scene_miou']} "
              f"OA {results[tag]['scene_oa']}", flush=True)

    path = os.path.join("benchmark_results", "pooled_quality.json")
    os.makedirs("benchmark_results", exist_ok=True)
    with open(path, "w") as f:
        json.dump({"num_epochs": num_epochs, "num_points": 4096,
                   "results": results}, f, indent=1)
    print(f"wrote {path}")


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "speed"
    if cmd == "speed":
        speed(*(int(a) for a in sys.argv[2:3]))
    elif cmd == "quality":
        quality(*sys.argv[2:3])
    else:
        raise SystemExit(f"unknown subcommand {cmd!r}")
