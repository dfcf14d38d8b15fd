"""One-command torch-checkpoint migration (reference .pth -> our format).

Closes the migration loop for a reference user: the checkpoints their
training runs produced (train_MulSca_PN2.py:290-313 wrapped saves, or raw
state_dicts) become an experiment directory our infer/train CLIs consume
directly:

  python -m pointcloud_bridge_tpu.tools.import_ckpt \
      --model pointnet2_ssg --torch-ckpt /path/best_model.pth --out exp_dir
  python -m pointcloud_bridge_tpu.infer_cli blocks \
      --checkpoint exp_dir --model pointnet2_ssg --data-dir ...

The conversion rules (utils/torch_import.py) are the logits-parity-tested
mappings of tests/test_reference_model_parity.py; by default the converted
tree is additionally validated leaf-for-leaf against a fresh init of the
target flax model, so a wrong --num-classes/--feature-dim fails here, not
as silent garbage at inference time. Wrapper scalars (epoch, best metric)
are preserved into the checkpoint's .meta.json.

Partsize MSG checkpoints use the 9-channel S3DIS column contract: pass
--feature-dim 9 (MIGRATION.md has the per-model table).
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(
        description="import a reference torch .pth checkpoint"
    )
    ap.add_argument("--model", required=True,
                    help="registry name with import rules (pointnet2_ssg, "
                         "pointnet, dgcnn, dgcnn_global, randlanet, ptv3, "
                         "pointnet2_sem_seg, pointnet2_msg, pointnet_sem_seg)")
    ap.add_argument("--torch-ckpt", required=True, help="path to the .pth")
    ap.add_argument("--out", required=True,
                    help="experiment dir to write (checkpoint lands in "
                         "<out>/best_model, where infer_cli looks first)")
    ap.add_argument("--tag", default="best_model",
                    choices=["best_model", "latest_checkpoint"])
    ap.add_argument("--num-classes", type=int, default=5)
    ap.add_argument("--feature-dim", type=int, default=3,
                    help="input feature channels of the trained model "
                         "(9 for Partsize S3DIS-column checkpoints)")
    ap.add_argument("--num-points", type=int, default=4096)
    ap.add_argument("--no-strict", action="store_true",
                    help="tolerate unconsumed torch keys (extra heads etc.)")
    ap.add_argument("--no-validate", action="store_true",
                    help="skip the leaf/shape validation against a fresh "
                         "init of the flax model")
    args = ap.parse_args(argv)

    from ..utils.torch_import import convert_state_dict, load_raw_state_dict

    sd, meta = load_raw_state_dict(args.torch_ckpt)
    variables = convert_state_dict(args.model, sd, strict=not args.no_strict)

    n_params = sum(
        int(np.prod(v.shape)) for v in _leaves(variables.get("params", {}))
    )

    if not args.no_validate:
        import jax

        from ..models import get_model
        from ..utils.torch_import import validate_variables

        model = get_model(args.model, num_classes=args.num_classes)
        # numpy templates keep this offline CLI entirely CPU-side: jnp.zeros
        # outside the default_device block would dispatch to the remote relay
        # (~50 ms round trips; fails outright with no TPU reachable)
        xyz0 = np.zeros((1, args.num_points, 3), np.float32)
        feats0 = np.zeros((1, args.num_points, args.feature_dim), np.float32)
        with jax.default_device(jax.devices("cpu")[0]):
            template = model.init(
                jax.random.PRNGKey(0), xyz0, feats0, train=False
            )
        validate_variables(variables, template)
        print(f"validated: tree matches a fresh {args.model} init "
              f"(num_classes={args.num_classes}, "
              f"feature_dim={args.feature_dim})")

    from ..utils.checkpoint import save_checkpoint

    os.makedirs(args.out, exist_ok=True)
    state = {
        "params": variables["params"],
        "batch_stats": variables.get("batch_stats", {}),
        "source_torch": os.path.abspath(args.torch_ckpt),
    }
    state.update({k: v for k, v in meta.items() if k not in state})
    save_checkpoint(os.path.join(args.out, args.tag), state)
    print(f"imported {args.torch_ckpt} -> {os.path.join(args.out, args.tag)} "
          f"({n_params:,} params"
          + (f", epoch={meta['epoch']}" if "epoch" in meta else "") + ")")


def _leaves(tree):
    if hasattr(tree, "items"):
        for v in tree.values():
            yield from _leaves(v)
    elif hasattr(tree, "shape"):
        yield tree


if __name__ == "__main__":
    main()
