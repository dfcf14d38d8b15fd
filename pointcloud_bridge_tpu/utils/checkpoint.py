"""Checkpointing with the reference's best/latest semantics
(train_MulSca_PN2.py:290-313): `best` saved when val accuracy improves,
`latest` every epoch, both holding {step/epoch, params, batch_stats,
opt_state, metrics}.

Orbax is the backend; a flax-serialization msgpack fallback keeps
checkpoints working if orbax misbehaves in a stripped environment.
"""

from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import jax


def _orbax():
    import orbax.checkpoint as ocp

    return ocp


def save_checkpoint(path: str, state: Dict[str, Any]) -> None:
    """Save a pytree checkpoint to `path` (a directory)."""
    path = os.path.abspath(path)
    meta = {k: v for k, v in state.items() if isinstance(v, (int, float, str))}
    tree = {k: v for k, v in state.items() if k not in meta}
    try:
        ocp = _orbax()
        ckptr = ocp.StandardCheckpointer()
        if os.path.exists(path):
            import shutil

            shutil.rmtree(path)
        ckptr.save(path, tree)
        ckptr.wait_until_finished()
    except Exception:
        from flax import serialization

        os.makedirs(path, exist_ok=True)
        with open(os.path.join(path, "state.msgpack"), "wb") as f:
            f.write(serialization.to_bytes(tree))
    with open(path + ".meta.json", "w") as f:
        json.dump(meta, f)


def checkpoint_keys(path: str) -> set:
    """Top-level keys stored in a checkpoint's TREE (meta.json scalars like
    'epoch' are not included). Used to positively detect params-only
    checkpoints (tools/import_ckpt migrations, deployed best_model trees)
    before choosing a restore target — resuming must never silently fall back
    to a warm start on a genuine restore failure (ADVICE r4)."""
    path = os.path.abspath(path)
    msgpack = os.path.join(path, "state.msgpack")
    if os.path.exists(msgpack):
        from flax import serialization

        with open(msgpack, "rb") as f:
            return set(serialization.msgpack_restore(f.read()).keys())
    ocp = _orbax()
    try:
        # metadata() reads the tree structure without loading arrays
        return set(ocp.StandardCheckpointer().metadata(path).keys())
    except Exception:
        return set(ocp.StandardCheckpointer().restore(path).keys())


def restore_checkpoint(
    path: str, target: Optional[Dict[str, Any]] = None
) -> Dict[str, Any]:
    """Restore a checkpoint saved by save_checkpoint. `target` provides the
    pytree structure/dtypes (required for the msgpack fallback; recommended
    always)."""
    path = os.path.abspath(path)
    msgpack = os.path.join(path, "state.msgpack")
    if os.path.exists(msgpack):
        from flax import serialization

        if target is None:
            raise ValueError("msgpack restore requires a target pytree")
        with open(msgpack, "rb") as f:
            tree = serialization.from_bytes(target, f.read())
    else:
        ocp = _orbax()
        ckptr = ocp.StandardCheckpointer()
        if target is None:
            tree = ckptr.restore(path)
        else:
            try:
                tree = ckptr.restore(path, target)
            except ValueError:
                # target is a subset of the stored tree (e.g. inference wants
                # only params/batch_stats, not opt_state; or a pre-EMA target
                # against an EMA-bearing checkpoint): restore the full tree,
                # project it onto the requested top-level keys, and re-impose
                # each target's pytree structure — a targetless orbax restore
                # yields raw dicts, which would hand optax namedtuple states
                # back as dicts and crash the resumed optimizer.
                from flax import serialization

                def as_state_dict(v):
                    # orbax's targetless restore yields lists for sequence
                    # nodes; flax state dicts spell those as {'0': ..., ...}
                    if isinstance(v, list):
                        return {str(i): as_state_dict(x) for i, x in enumerate(v)}
                    if isinstance(v, dict):
                        return {k: as_state_dict(x) for k, x in v.items()}
                    return v

                full = ckptr.restore(path)
                tree = {
                    k: serialization.from_state_dict(target[k], as_state_dict(full[k]))
                    for k in target
                }
    meta_path = path + ".meta.json"
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            tree = dict(tree)
            tree.update(json.load(f))
    return tree
