"""Inference CLI — replaces the reference's inference*.py and
Partsize test_sem_seg.py (SURVEY.md §2.6).

Modes:
  blocks: block-based inference over cached validation blocks with per-file
    metrics, CSVs and figures (inference.py workflow).
  scene: whole-scene sliding-grid K-vote inference per LAS file with per-scene
    IoU and predicted-LAS export (test_sem_seg.py workflow).
"""

from __future__ import annotations

import argparse
import glob
import os

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="run segmentation inference")
    ap.add_argument("mode", choices=["blocks", "scene"])
    ap.add_argument("--checkpoint", required=True, help="experiment dir or ckpt dir")
    ap.add_argument("--model", default="pointnet2_ssg")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--out-dir", default="inference_results")
    ap.add_argument("--num-classes", type=int, default=5)
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--num-votes", type=int, default=5)
    ap.add_argument("--block-size", type=float, default=1.0)
    ap.add_argument("--stride", type=float, default=0.5)
    ap.add_argument("--export-las", action="store_true")
    ap.add_argument("--save-subplots", action="store_true",
                    help="export each figure panel as its own PNG/PDF")
    ap.add_argument("--normalize-scene", action="store_true",
                    help="whole-scene normalization (Highway training contract)")
    ap.add_argument("--from-snapshot", action="store_true",
                    help="import model code from the experiment's "
                         "code_snapshot dir (reference inference.py:72-78 "
                         "reproducibility: results don't drift when the "
                         "working tree moves on)")
    args = ap.parse_args(argv)

    from .utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()  # PCB_COMPILE_CACHE, default off

    import jax

    from .utils.checkpoint import restore_checkpoint

    if args.from_snapshot:
        from .utils.logging import load_snapshot_models

        get_model = load_snapshot_models(args.checkpoint)
    else:
        from .models import get_model

    model = get_model(args.model, num_classes=args.num_classes)

    # build a template to restore into
    key = jax.random.PRNGKey(0)
    import jax.numpy as jnp

    xyz0 = jnp.zeros((1, args.num_points, 3))
    feats0 = jnp.zeros((1, args.num_points, 3))
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        template = model.init(key, xyz0, feats0, train=False)
    ckpt_dir = args.checkpoint
    for cand in ("best_model", "latest_checkpoint"):
        p = os.path.join(args.checkpoint, cand)
        if os.path.exists(p):
            ckpt_dir = p
            break
    restored = restore_checkpoint(
        ckpt_dir,
        {"params": template["params"],
         "batch_stats": template.get("batch_stats", {}),
         },
    )
    variables = {
        "params": restored["params"],
        "batch_stats": restored.get("batch_stats", {}),
    }

    os.makedirs(args.out_dir, exist_ok=True)
    scenes = sorted(
        glob.glob(os.path.join(args.data_dir, "*.las"))
        + glob.glob(os.path.join(args.data_dir, "*.h5"))
    )

    if args.mode == "blocks":
        from .data import BlockDataset
        from .infer import run_block_inference, save_metrics_csv
        from .infer.figures import save_inference_figures

        ds = BlockDataset.from_files(
            scenes, num_points=args.num_points, num_classes=args.num_classes
        )
        res = run_block_inference(
            model, variables, ds, args.num_classes, args.batch_size
        )
        save_metrics_csv(res, args.out_dir)
        try:
            save_inference_figures(
                res, args.out_dir, save_subplots=args.save_subplots
            )
            if res.get("per_file"):
                from .infer.figures import file_comparison_charts

                file_comparison_charts(res["per_file"], args.out_dir)
        except Exception as e:
            print(f"figure generation failed: {e}")
        g = res["global"]
        print(
            f"GLOBAL mIoU={g['mIoU']:.4f} OA={g['OA']:.4f} mAcc={g['mAcc']:.4f} "
            f"F1={g['F1_score']:.4f}"
        )
    else:
        from .data import read_las, scene_labelweights
        from .data.dataset import _load_scene
        from .infer import whole_scene_vote_predict, export_predicted_las
        from .utils.metrics import metrics_from_confusion

        all_labels = []
        loaded = []
        for f in scenes:
            pts, cols, labels = _load_scene(f)
            loaded.append((f, pts, cols, labels))
            all_labels.append(labels)
        lw = scene_labelweights(all_labels, args.num_classes)
        total_cm = np.zeros((args.num_classes, args.num_classes))
        for f, pts, cols, labels in loaded:
            pts6 = np.concatenate([pts, cols], axis=1)
            res = whole_scene_vote_predict(
                model, variables, pts6, labels, lw, args.num_classes,
                block_points=args.num_points, block_size=args.block_size,
                stride=args.stride, num_votes=args.num_votes,
                batch_size=args.batch_size,
                normalize_scene=args.normalize_scene,
            )
            m = res["metrics"]
            total_cm += m["Confusion_Matrix"]
            print(f"{os.path.basename(f)}: mIoU={m['mIoU']:.4f} OA={m['OA']:.4f}")
            if args.export_las:
                out = os.path.join(
                    args.out_dir,
                    os.path.basename(f).replace(".las", "").replace(".h5", "")
                    + "_pred.las",
                )
                export_predicted_las(out, pts, cols, res["pred"])
        g = metrics_from_confusion(total_cm)
        print(f"OVERALL mIoU={g['mIoU']:.4f} OA={g['OA']:.4f}")


if __name__ == "__main__":
    main()
