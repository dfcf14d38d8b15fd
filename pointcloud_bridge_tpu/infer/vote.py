"""Whole-scene K-vote inference.

Capability parity with Partsize-identical/test_sem_seg.py (SURVEY.md §3.3):
the scene is covered num_votes times by the sliding-grid sampler (fresh
random pad-resampling each vote), every block is classified, and per-point
class votes weighted by labelweight are accumulated at the ORIGINAL point
indices; the final label is the argmax of the vote pool.

TPU-first delta: the reference's Python triple loop add_vote
(test_sem_seg.py:58-65) is one np.bincount scatter per vote (host-side
because scene sizes are ragged; the model forward stays on device with
fixed [B, P] shapes). The default device_gather path uploads the scene's
per-point feature table once and streams only int32 block indices per vote;
the next vote's host gridding runs on a background thread under the current
vote's device compute + fetch.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..data.blocks import (
    precompute_grid_cells,
    scene_feature_table,
    whole_scene_grid_blocks,
    whole_scene_grid_indices,
)
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
    device_gather: bool = True,
    collect_timings: bool = False,
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
      device_gather: stream int32 block INDICES to the device and gather the
        per-point feature table there (uploaded once per scene), instead of
        assembling + shipping [nb, P, 9] f32 blocks per vote. Identical
        predictions (same rng, same f32 arithmetic, exact gather); 6x less
        host->device traffic and no 9-channel host materialization. False
        restores the host-assembly path.
      collect_timings: also return per-phase wall times (VERDICT r3 #8) —
        {'table_upload_s', and per-vote lists 'grid_s' (host gridding; runs
        on the background thread OVERLAPPED with the previous vote's device
        work, so it only bounds wall time when it exceeds that), 'h2d_s'
        (index/center uploads), 'dispatch_s' (async enqueue of the forward
        batches), 'fetch_s' (blocking D2H — includes waiting out device
        compute, inseparable on an async relay), 'scatter_s' (host vote
        bincount)}. Adds only perf_counter() calls; phase semantics, not a
        profiler.
    Returns {pred [N], metrics, vote_pool [N, C][, timings]}.
    """
    import time as _time
    n = len(points6)
    if normalize_scene:
        from ..data.blocks import normalize_points

        points6 = points6.copy()
        points6[:, :3] = normalize_points(points6[:, :3].astype(np.float64))
    vote_pool = np.zeros((n, num_classes), np.float64)

    data_sh = repl_sh = None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        ndev = mesh.shape["data"]
        batch_size = ((batch_size + ndev - 1) // ndev) * ndev
        data_sh = NamedSharding(mesh, P("data"))
        repl_sh = NamedSharding(mesh, P())
        variables = jax.device_put(variables, repl_sh)

    # predictions cross the (slow) host link as uint8 when classes fit —
    # 4x less D2H traffic than int32 at zero information loss
    pred_dtype = jnp.uint8 if num_classes <= 255 else jnp.int32

    def _predict(xyz, feats):
        if data_sh is not None:
            xyz = jax.lax.with_sharding_constraint(xyz, data_sh)
            feats = jax.lax.with_sharding_constraint(feats, data_sh)
        logits = model.apply(variables, xyz, feats, train=False)
        return jnp.argmax(logits, axis=-1).astype(pred_dtype)

    @jax.jit
    def forward(xyz, feats):
        return _predict(xyz, feats)

    @jax.jit
    def forward_idx(table, all_idx, all_centers, start):
        # Slice batch `start` out of the vote's device-resident index array
        # (dynamic_slice on a RUNTIME scalar: one executable for every
        # batch — python-slicing idx_dev[s:e] instead bakes each (s, e)
        # into a distinct tiny executable, and each of those pays a remote
        # compile round trip on this relay), gather the block rows ([B, P]
        # rows of the scene table; XLA's hardware row gather) and apply the
        # per-block XY centering — reproduces whole_scene_grid_blocks'
        # host assembly bit-for-bit.
        idx = jax.lax.dynamic_slice_in_dim(all_idx, start, batch_size, 0)
        centers = jax.lax.dynamic_slice_in_dim(
            all_centers, start, batch_size, 0
        )
        if data_sh is not None:
            idx = jax.lax.with_sharding_constraint(idx, data_sh)
            centers = jax.lax.with_sharding_constraint(centers, data_sh)
        g = jnp.take(table, idx, axis=0)  # [B, P, 6 or 9]
        offs = jnp.concatenate(
            [centers, jnp.zeros_like(centers[:, :1])], axis=-1
        )
        xyz = g[..., :3] - offs[:, None, :]
        if feature_mode == "nine":
            feats = jnp.concatenate([xyz, g[..., 3:]], axis=-1)
        else:
            feats = g[..., 3:6]
        return _predict(xyz, feats)

    def _build_table():
        ncols = 9 if feature_mode == "nine" else 6
        table = np.ascontiguousarray(scene_feature_table(points6)[:, :ncols])
        # Bucket the table length (zero-row padding; gathered indices are
        # always < n) so the compiled executable is reused across scene
        # sizes — the row count is baked into the jitted gather, and a
        # fresh remote compile costs minutes on this relay. Small scenes
        # bucket to powers of two, large ones to 1M-row steps.
        n_rows = len(table)
        if n_rows >= (1 << 20):
            bucket = -(-n_rows // (1 << 20)) * (1 << 20)
        else:
            bucket = 1 << max(n_rows - 1, 1).bit_length()
        if bucket > n_rows:
            table = np.concatenate(
                [table, np.zeros((bucket - n_rows, ncols), np.float32)]
            )
        dev = jnp.asarray(table)
        if repl_sh is not None:
            dev = jax.device_put(dev, repl_sh)
        return dev

    # Per-vote pipeline: a vote's forward batches are all DISPATCHED (async,
    # jax enqueues) and concatenated on device; the vote's single blocking
    # fetch then overlaps (a) device compute and (b) the NEXT vote's host
    # gridding, which runs on a background thread (numpy releases the GIL).
    # The vote scatter is one np.bincount on flattened (point, class) keys —
    # np.add.at is an order of magnitude slower on multi-M updates.
    #
    # CPU-mesh exception: the virtual multi-device CPU backend runs
    # collectives through an in-process rendezvous; concurrently enqueued
    # sharded executions oversubscribe the shared thread pool, partitions of
    # different runs starve each other's rendezvous, and XLA aborts the
    # process after its 40 s stuck-collective timeout (seen as a flaky
    # SIGABRT in AllGatherThunk under tests). Real TPUs serialize dispatch
    # per core, so only the CPU+mesh combination must run synchronously.
    sync_dispatch = mesh is not None and jax.default_backend() == "cpu"
    flat_pool = vote_pool.reshape(-1)

    timings: Dict[str, Any] = {
        "table_upload_s": 0.0,
        "grid_s": [], "h2d_s": [], "dispatch_s": [],
        "fetch_s": [], "scatter_s": [],
    }

    def scatter(parts, idxs, weights, nb):
        # parts: [(device preds [k*B, P], real_rows)] — fetched here, one
        # blocking D2H per chunk, then a single bincount for the vote
        t0 = _time.perf_counter()
        preds = np.concatenate(
            [np.asarray(p)[:rows] for p, rows in parts]
        )[:nb]
        t1 = _time.perf_counter()
        flat = idxs.reshape(-1) * num_classes + preds.reshape(-1)
        flat_pool[:] += np.bincount(
            flat, weights=weights.reshape(-1), minlength=flat_pool.size
        )
        timings["fetch_s"].append(t1 - t0)
        timings["scatter_s"].append(_time.perf_counter() - t1)

    def _pad_batch(a, s, e):
        part = a[s:e]
        if e - s < batch_size:  # pad to fixed shape for jit
            part = np.concatenate(
                [part, np.repeat(part[-1:], batch_size - (e - s), 0)]
            )
        return part

    grid_kw = dict(
        block_points=block_points,
        block_size=block_size,
        stride=stride,
        center_xy=not normalize_scene,
    )

    cells = [None]  # geometry-only membership, computed once (vote 0)

    def _grid(vote):
        t0 = _time.perf_counter()
        if cells[0] is None:
            cells[0] = precompute_grid_cells(
                points6, block_size, stride, padding=0.001
            )
        vote_seed = seed + vote * 1009
        if device_gather:
            out = whole_scene_grid_indices(
                points6, labels, labelweights, seed=vote_seed,
                cells=cells[0], **grid_kw
            )
        else:
            out = whole_scene_grid_blocks(
                points6, labels, labelweights, seed=vote_seed, cells=cells[0],
                **grid_kw
            )
        timings["grid_s"].append(_time.perf_counter() - t0)
        return out

    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=1) as gridder:
        # vote 0's gridding overlaps the table build + upload below
        fut = gridder.submit(_grid, 0)
        t_tab = _time.perf_counter()
        table_dev = _build_table() if device_gather else None
        if device_gather and collect_timings:
            # blocking only in timing mode: the default path leaves the
            # upload async under vote 0's host gridding
            table_dev.block_until_ready()
        timings["table_upload_s"] = _time.perf_counter() - t_tab
        for vote in range(num_votes):
            got = fut.result()
            if vote + 1 < num_votes:
                fut = gridder.submit(_grid, vote + 1)
            if device_gather:
                idxs, weights, centers = got
                nb = len(idxs)
            else:
                data, _, weights, idxs = got
                nb = len(data)
            if nb == 0:
                continue
            preds_parts = []
            h2d_acc = disp_acc = 0.0
            if device_gather:
                # Indices go up in FIXED-SIZE chunks of 16 batches: per-batch
                # feeds are ~0.5 MB and the link is round-trip-bound
                # (measured 5.5 -> ~2 s/vote at 5M pts for bulk), while a
                # whole-vote upload would bake the scene's block count into
                # the executable shapes and recompile per scene (minutes on
                # this relay). Chunked uploads keep every executable
                # shape-stable; batches are device-side dynamic slices and
                # dispatch asynchronously.
                chunk_rows = 16 * batch_size
                for cs in range(0, nb, chunk_rows):
                    ce = min(cs + chunk_rows, nb)
                    ci = idxs[cs:ce].astype(np.int32)
                    cc = centers[cs:ce]
                    if ce - cs < chunk_rows:  # pad to the fixed chunk shape
                        pad = chunk_rows - (ce - cs)
                        ci = np.concatenate([ci, np.repeat(ci[-1:], pad, 0)])
                        cc = np.concatenate([cc, np.repeat(cc[-1:], pad, 0)])
                    t_h = _time.perf_counter()
                    idx_dev = jnp.asarray(ci)
                    ctr_dev = jnp.asarray(np.ascontiguousarray(cc))
                    t_d = _time.perf_counter()
                    h2d_acc += t_d - t_h
                    cparts = []
                    for s in range(0, ce - cs, batch_size):
                        cparts.append(
                            forward_idx(
                                table_dev, idx_dev, ctr_dev, np.int32(s)
                            )
                        )
                        if sync_dispatch:
                            cparts[-1].block_until_ready()
                    disp_acc += _time.perf_counter() - t_d
                    cpred = (
                        cparts[0]
                        if len(cparts) == 1
                        else _concat_parts(*cparts)
                    )
                    preds_parts.append((cpred, ce - cs))
            else:
                cparts, crows = [], 0

                def _flush():
                    nonlocal cparts, crows
                    if cparts:
                        cpred = (
                            cparts[0]
                            if len(cparts) == 1
                            else _concat_parts(*cparts)
                        )
                        preds_parts.append((cpred, crows))
                        cparts, crows = [], 0

                for s in range(0, nb, batch_size):
                    e = min(s + batch_size, nb)
                    chunk = _pad_batch(data, s, e)
                    t_h = _time.perf_counter()
                    xyz = jnp.asarray(chunk[:, :, :3])
                    if feature_mode == "nine":
                        feats = jnp.asarray(chunk)
                    else:
                        feats = jnp.asarray(chunk[:, :, 3:6])
                    t_d = _time.perf_counter()
                    h2d_acc += t_d - t_h
                    cparts.append(forward(xyz, feats))
                    crows += e - s
                    if sync_dispatch:
                        cparts[-1].block_until_ready()
                    disp_acc += _time.perf_counter() - t_d
                    if len(cparts) == 16:  # bound concat arity + fetch count
                        _flush()
                _flush()
            timings["h2d_s"].append(h2d_acc)
            timings["dispatch_s"].append(disp_acc)
            scatter(preds_parts, idxs, weights, nb)
    pred = vote_pool.argmax(axis=1).astype(np.int32)
    # host bincount: identical integer counts to the device confusion
    # matrix without shipping two [N] arrays across the link
    cm = (
        np.bincount(
            labels.astype(np.int64) * num_classes + pred,
            minlength=num_classes * num_classes,
        )
        .reshape(num_classes, num_classes)
        .astype(np.int64)
    )
    out = {
        "pred": pred,
        "metrics": M.metrics_from_confusion(cm),
        "vote_pool": vote_pool,
    }
    if collect_timings:
        out["timings"] = timings
    return out
