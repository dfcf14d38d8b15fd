"""Whole-scene K-vote inference.

Capability parity with Partsize-identical/test_sem_seg.py (SURVEY.md §3.3):
the scene is covered num_votes times by the sliding-grid sampler (fresh
random pad-resampling each vote), every block is classified, and per-point
class votes weighted by labelweight are accumulated at the ORIGINAL point
indices; the final label is the argmax of the vote pool.

TPU-first delta: the reference's Python triple loop add_vote
(test_sem_seg.py:58-65) is a single np.add.at scatter per scene (the scatter
is host-side because scene sizes are ragged; the model forward stays on
device with fixed [B, P] shapes).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.blocks import whole_scene_grid_blocks
from ..utils import metrics as M


@jax.jit
def _concat_parts(*parts):
    # Concatenation of the per-batch prediction parts happens under jit:
    # eager concatenate of mesh-sharded arrays intermittently aborts the
    # multi-device CPU runtime (SIGABRT in apply_primitive), while the jitted
    # op is plain GSPMD and also fuses the copy on TPU.
    return jnp.concatenate(parts, axis=0)


def whole_scene_vote_predict(
    model,
    variables: Dict[str, Any],
    points6: np.ndarray,
    labels: np.ndarray,
    labelweights: np.ndarray,
    num_classes: int,
    block_points: int = 4096,
    block_size: float = 1.0,
    stride: float = 0.5,
    num_votes: int = 5,
    batch_size: int = 16,
    feature_mode: str = "xyz_rgb",
    normalize_scene: bool = False,
    seed: int = 0,
    mesh=None,
) -> Dict[str, Any]:
    """Predict labels for every point of one scene.

    Args:
      points6: [N, 6] xyzrgb scene; labels: [N]; labelweights: [C] vote weights.
      feature_mode: 'xyz_rgb' feeds (xyz=cols 0:3 of block, feats=rgb);
        'nine' feeds the full 9-channel block as features (Partsize models).
      mesh: optional jax.sharding.Mesh with a "data" axis — the block batch
        is sharded over it (pure data parallelism: params replicated, blocks
        split across devices; batch_size is rounded up to a multiple of the
        axis size). Predictions are identical to the single-device path.
      normalize_scene: apply the BriPCDMulti whole-scene normalization
        (centroid-center + divide by max radius) to the coordinates before
        gridding — REQUIRED for models trained on Highway-style blocks
        (which see normalized coordinates); block_size/stride are then in
        normalized units. Partsize models (raw-centered columns) leave this
        False, matching test_sem_seg.py.
    Returns {pred [N], metrics, vote_pool [N, C]}.
    """
    n = len(points6)
    if normalize_scene:
        from ..data.blocks import normalize_points

        points6 = points6.copy()
        points6[:, :3] = normalize_points(points6[:, :3].astype(np.float64))
    vote_pool = np.zeros((n, num_classes), np.float64)

    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape["data"]
        batch_size = ((batch_size + ndev - 1) // ndev) * ndev
        data_sh = NamedSharding(mesh, P("data"))
        repl_sh = NamedSharding(mesh, P())
        variables = jax.device_put(variables, repl_sh)

        @jax.jit
        def forward(xyz, feats):
            xyz = jax.lax.with_sharding_constraint(xyz, data_sh)
            feats = jax.lax.with_sharding_constraint(feats, data_sh)
            logits = model.apply(variables, xyz, feats, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)
    else:

        @jax.jit
        def forward(xyz, feats):
            logits = model.apply(variables, xyz, feats, train=False)
            return jnp.argmax(logits, axis=-1).astype(jnp.int32)

    # Per-vote pipeline: all of a vote's forward batches are DISPATCHED
    # (async, jax enqueues) and concatenated on device, but the single
    # blocking fetch is deferred until after the NEXT vote's host gridding —
    # device compute rides under host work, and the whole vote's predictions
    # cross the relay in one transfer instead of one ~RTT-bound round trip
    # per batch (152 fetches -> 1 at 1M pts / B=4; ~6.1 s -> ~0.8 s).
    #
    # CPU-mesh exception: the virtual multi-device CPU backend runs
    # collectives through an in-process rendezvous; concurrently enqueued
    # sharded executions oversubscribe the shared thread pool, partitions of
    # different runs starve each other's rendezvous, and XLA aborts the
    # process after its 40 s stuck-collective timeout (seen as a flaky
    # SIGABRT in AllGatherThunk under tests). Real TPUs serialize dispatch
    # per core, so only the CPU+mesh combination must run synchronously.
    sync_dispatch = mesh is not None and jax.default_backend() == "cpu"
    pending = []  # [(device preds [nb,P], idxs, weights, nb)]

    def drain():
        for preds_dev, idxs, weights, nb in pending:
            preds = np.asarray(preds_dev)[:nb]
            np.add.at(
                vote_pool,
                (idxs.reshape(-1), preds.reshape(-1)),
                weights.reshape(-1),
            )
        pending.clear()

    for vote in range(num_votes):
        data, _, weights, idxs = whole_scene_grid_blocks(
            points6,
            labels,
            labelweights,
            block_points=block_points,
            block_size=block_size,
            stride=stride,
            center_xy=not normalize_scene,
            seed=seed + vote * 1009,
        )
        nb = len(data)
        if nb == 0:
            continue
        preds_parts = []
        for s in range(0, nb, batch_size):
            e = min(s + batch_size, nb)
            chunk = data[s:e]
            if e - s < batch_size:  # pad to fixed shape for jit
                pad = batch_size - (e - s)
                chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, 0)])
            xyz = jnp.asarray(chunk[:, :, :3])
            if feature_mode == "nine":
                feats = jnp.asarray(chunk)
            else:
                feats = jnp.asarray(chunk[:, :, 3:6])
            preds_parts.append(forward(xyz, feats))
            if sync_dispatch:
                preds_parts[-1].block_until_ready()
        allp = (
            preds_parts[0]
            if len(preds_parts) == 1
            else _concat_parts(*preds_parts)
        )
        pending.append((allp, idxs, weights, nb))
        if sync_dispatch:
            drain()

    drain()
    pred = vote_pool.argmax(axis=1).astype(np.int32)
    cm = np.asarray(
        M.confusion_matrix(jnp.asarray(pred), jnp.asarray(labels.astype(np.int32)), num_classes)
    )
    return {
        "pred": pred,
        "metrics": M.metrics_from_confusion(cm),
        "vote_pool": vote_pool,
    }
