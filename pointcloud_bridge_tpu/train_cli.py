"""Training CLI — the single config-driven replacement for the reference's
per-model train scripts (train_MulSca*.py, train_DGCNN.py, train_PTV3.py,
Partsize train.py; SURVEY.md §2.5).

Usage:
    python -m pointcloud_bridge_tpu.train_cli --config config.yaml
    python -m pointcloud_bridge_tpu.train_cli --model dgcnn --train-dir data/train \
        --val-dir data/val --num-classes 5 --loss weighted_ce

The reference's per-script choices map to flags: model name, dataset sampling
mode (stratified like BriPCDMulti vs weighted like BriPCD_gen), loss
(weighted_ce / bridge_structure / sol), scheduler (plateau / cosine / step).
"""

from __future__ import annotations

import argparse
import glob
import os


def build_datasets(cfg):
    from .data import BlockDataset

    def files_of(d):
        out = []
        for pat in ("*.las", "*.h5", "*.hdf5"):
            out.extend(glob.glob(os.path.join(d, pat)))
        return sorted(out)

    train_files = files_of(cfg.data.train_dir)
    if not train_files:
        raise FileNotFoundError(f"no LAS/H5 scenes in {cfg.data.train_dir}")
    tr = BlockDataset.from_files(
        train_files,
        num_points=cfg.data.num_points,
        block_size=cfg.data.block_size,
        sample_rate=cfg.data.sample_rate,
        num_classes=cfg.model.num_classes,
        weighted=cfg.data.weighted_sampling,
        sampler=cfg.data.sampler,
        chunk_size=cfg.data.chunk_size,
        overlap=cfg.data.overlap,
        steps_per_file=cfg.data.steps_per_file,
        cache_dir=cfg.data.cache_dir,
        augment=cfg.data.augment,
        seed=cfg.train.seed,
    )
    va = None
    if cfg.data.val_dir:
        val_files = files_of(cfg.data.val_dir)
        if val_files:
            va = BlockDataset.from_files(
                val_files,
                num_points=cfg.data.num_points,
                block_size=cfg.data.block_size,
                sample_rate=cfg.data.sample_rate,
                num_classes=cfg.model.num_classes,
                sampler=cfg.data.sampler,
                chunk_size=cfg.data.chunk_size,
                overlap=cfg.data.overlap,
                steps_per_file=cfg.data.steps_per_file,
                cache_dir=cfg.data.cache_dir,
                seed=cfg.train.seed + 999,
            )
    return tr, va


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(description="train a bridge segmentation model")
    ap.add_argument("--config", help="YAML config (reference config.yaml keys)")
    ap.add_argument("--model", default=None)
    ap.add_argument("--train-dir", default=None)
    ap.add_argument("--val-dir", default=None)
    ap.add_argument("--num-classes", type=int, default=None)
    ap.add_argument("--num-points", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--num-epochs", type=int, default=None)
    ap.add_argument("--learning-rate", type=float, default=None)
    ap.add_argument("--loss", default=None,
                    choices=["ce", "weighted_ce", "bridge_structure", "sol"])
    ap.add_argument("--scheduler", default=None,
                    choices=["plateau", "cosine", "step", "none"])
    ap.add_argument("--weighted-sampling", action="store_true")
    ap.add_argument("--sampler", default=None,
                    choices=["stratified", "weighted", "random", "simple",
                             "chunked"])
    ap.add_argument("--case", default=None)
    args = ap.parse_args(argv)

    from .utils.compile_cache import enable_persistent_compilation_cache

    enable_persistent_compilation_cache()  # PCB_COMPILE_CACHE, default off

    from .config import Config

    cfg = Config.from_yaml(args.config) if args.config else Config()
    if args.model:
        cfg.model.name = args.model
    if args.train_dir:
        cfg.data.train_dir = args.train_dir
    if args.val_dir:
        cfg.data.val_dir = args.val_dir
    if args.num_classes:
        cfg.model.num_classes = args.num_classes
    if args.num_points:
        cfg.data.num_points = args.num_points
    if args.batch_size:
        cfg.train.batch_size = args.batch_size
    if args.num_epochs:
        cfg.train.num_epochs = args.num_epochs
    if args.learning_rate:
        cfg.train.learning_rate = args.learning_rate
    if args.loss:
        cfg.loss.name = args.loss
    if args.scheduler:
        cfg.train.scheduler = args.scheduler
    if args.weighted_sampling:
        cfg.data.weighted_sampling = True
    if args.sampler:
        cfg.data.sampler = args.sampler
    if args.case:
        cfg.case = args.case

    tr, va = build_datasets(cfg)
    from .train import train

    out = train(cfg, tr, va)
    print(f"done: best_val_acc={out['best_val_acc']:.4f} exp_dir={out['exp_dir']}")


if __name__ == "__main__":
    main()
