"""Cross-model speed/size benchmark — the eva_model.py harness
(Highway_bridge/eva_model.py:53-382) rebuilt for TPU:

per model: parameter count & size (:38-51), warmup, timed inference ->
ms + points/second (:147-172), timed train step -> estimated epoch time
(:188-264), results CSV (model_performance_comparison.csv schema) and bar
charts.

TPU methodology note: wall-clock of a single dispatch measures the host<->
device round trip, not the device. Each timing here runs K chained
iterations inside ONE jit (the output perturbs the next input so iterations
serialize and cannot be hoisted) and reports (T_K - T_1)/(K-1).
"""

from __future__ import annotations

import csv
import os
import time

# Serving configuration, matching bench.py: the Pallas FPS kernel is opt-in
# (unsupported inside lax loop bodies — CLAUDE.md) and all chains here are
# unrolled, so it is safe and ~3x faster. Without this the sweep silently
# benchmarks the jnp FPS fallback.
os.environ.setdefault("PCB_FPS_PALLAS", "1")
from typing import Any, Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..models import get_model
from ..train.loop import create_train_state, make_optimizer, make_train_step
from ..config import Config

# The full 7-model reference zoo (eva_model.py:463-527): PointNet, DGCNN
# (k=32 in the benchmark config), PointNet2, SPG, RandLA, PTv3 (depth=12,
# heads=6), BridgeSeg. A row's "_model" key overrides the registry name so
# one architecture can appear in several configs; "_note" documents config
# deltas vs the reference CSV.
DEFAULT_ZOO: Dict[str, Dict[str, Any]] = {
    "pointnet": {},
    "dgcnn": {"k": 20, "_note": "trained variant (k=20); no same-config ref row"},
    "dgcnn_k32": {"_model": "dgcnn_global", "k": 32,
                  "_note": "reference CSV variant (model.py:372-482, k=32)"},
    "pointnet2_ssg": {},
    "pointnet2_msg": {"_feature_dim": 9,
                      "_note": "BASELINE north-star model (Partsize MSG); fed "
                               "its 9-ch S3DIS column contract"},
    "spg": {},
    "spt": {"_note": "SuperPointTransformer point-level segmenter"},
    "randlanet": {},
    "ptv3": {"embed_dim": 384, "depth": 8, "num_heads": 2,
             "_note": "trained config (train_PTV3.py:123-128)"},
    "ptv3_big": {"_model": "ptv3", "embed_dim": 384, "depth": 12,
                 "num_heads": 6,
                 "_note": "reference benchmark config (eva_model.py:506-513)"},
    "ptv3_big_bf16": {"_model": "ptv3", "embed_dim": 384, "depth": 12,
                      "num_heads": 6, "stream_dtype": "bfloat16",
                      "_note": "bf16 residual stream serving config "
                               "(argmax ~99.8% vs f32; params f32)"},
    "ptv3_win_bf16": {"_model": "ptv3", "embed_dim": 384, "depth": 8,
                      "num_heads": 2, "window_size": 512,
                      "stream_dtype": "bfloat16",
                      "_note": "fastest PTv3 serving config (round 3): "
                               "Morton-windowed w=512 + bf16 stream"},
    "ptv3_pooled": {"dims": (64, 128, 256), "enc_depths": (2, 2, 6),
                    "dec_depths": (1, 1), "strides": (4, 4),
                    "window_size": 1024,
                    "_note": "true-PTv3 hierarchical U-Net (round 5): "
                             "serialized grid pooling, depth at the coarse "
                             "levels (train_ptv3_pooled.yaml config)"},
    "bristrunet": {},
}

# reference GPU numbers (model_performance_comparison.csv:2-5, BASELINE.md);
# the reference CSV's DGCNN row is the k=32 eva config (1,546,245 params).
REFERENCE_POINTS_PER_SEC: Dict[str, float] = {
    "pointnet": 5_852_032.0,
    "dgcnn_k32": 2_916.0,
    "pointnet2_ssg": 35_557.0,
    "pointnet2": 35_557.0,
    "bristrunet": 43_465.0,
    "bridgeseg": 43_465.0,
}


def _init_on_cpu(model, key, xyz, feats):
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        v = model.init(
            {"params": key, "dropout": key, "sampling": key},
            xyz[:1],
            feats[:1],
            train=False,
        )
    return jax.device_put(v, jax.devices()[0])


def _chained_forward_time(
    model, variables, xyz, feats, iters: int, reps: int = 4
) -> float:
    """Amortized per-forward seconds via K chained iterations; T_K and T_1
    are each the MIN over `reps` trials before differencing (the relay adds
    multi-ms jitter per dispatch — single-trial differencing can even go
    negative for sub-ms models)."""

    def chained(v, x, f, count):
        # UNROLLED (not lax.fori_loop): the Pallas FPS kernel is unsupported
        # inside lax loop bodies on the current stack; unrolled iterations
        # still serialize through the data dependency.
        acc = 0.0
        for _ in range(count):
            out = model.apply(v, x, f, train=False)
            x = x + jnp.tanh(jnp.mean(out)) * 1e-3
            acc = acc + jnp.mean(out)
        return acc

    run = jax.jit(chained, static_argnums=(3,))

    def measure(k: int) -> float:
        np.asarray(run(variables, xyz, feats, k))
        np.asarray(run(variables, xyz, feats, 1))
        tk = t1 = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(run(variables, xyz, feats, k))
            tk = min(tk, time.perf_counter() - t0)
            t0 = time.perf_counter()
            np.asarray(run(variables, xyz, feats, 1))
            t1 = min(t1, time.perf_counter() - t0)
        return max((tk - t1) / (k - 1), 1e-9)

    fwd_s = measure(iters)
    # Sub-ms models: a 10-iteration chain differences into the relay's ~1-2ms
    # jitter floor (a pointnet chain is ~2.4ms total). Lengthen the chain
    # until it spans >=12ms so the subtraction resolves.
    while fwd_s * iters < 12e-3 and iters < 640:
        iters *= 4
        fwd_s = measure(iters)
    return max(fwd_s, 1e-6)


def evaluate_model(
    name: str,
    num_classes: int = 5,
    batch_size: int = 4,
    num_points: int = 4096,
    iters: int = 10,
    train_iters: int = 5,
    steps_per_epoch: int = 100,
    model_kwargs: Optional[Dict] = None,
) -> Dict[str, Any]:
    """Benchmark one model; returns the eva_model CSV row fields."""
    model_kwargs = dict(model_kwargs or {})
    registry_name = model_kwargs.pop("_model", name)
    config_note = model_kwargs.pop("_note", None)
    feature_dim = model_kwargs.pop("_feature_dim", 3)
    model = get_model(registry_name, num_classes=num_classes, **model_kwargs)
    rng = np.random.default_rng(0)
    xyz = jnp.asarray(
        rng.uniform(size=(batch_size, num_points, 3)), jnp.float32
    )
    feats = jnp.asarray(
        rng.uniform(size=(batch_size, num_points, feature_dim)), jnp.float32
    )
    key = jax.random.PRNGKey(0)
    variables = _init_on_cpu(model, key, np.asarray(xyz), np.asarray(feats))
    n_params = sum(x.size for x in jax.tree.leaves(variables["params"]))

    fwd_s = _chained_forward_time(model, variables, xyz, feats, iters)
    pts_per_sec = batch_size * num_points / fwd_s

    # Device peak memory of the compiled inference graph, the analogue of the
    # reference's torch.cuda.max_memory_allocated (eva_model.py:174-182). The
    # relay's device.memory_stats() is unavailable, so we use XLA's static
    # memory analysis: arguments (params + inputs) + outputs + peak temps.
    device_mem_mb = None
    try:
        fwd = jax.jit(lambda v, x, f: model.apply(v, x, f, train=False))
        ma = fwd.lower(variables, xyz, feats).compile().memory_analysis()
        device_mem_mb = round(
            (ma.argument_size_in_bytes + ma.output_size_in_bytes
             + ma.temp_size_in_bytes) / 1024 / 1024, 1,
        )
    except Exception:
        pass

    # train step timing
    batch = {
        "points": np.asarray(xyz),
        "colors": np.asarray(feats),
        "labels": rng.integers(0, num_classes, (batch_size, num_points)).astype(
            np.int32
        ),
        "mask": np.ones(batch_size, bool),
        "block_ids": np.arange(batch_size, dtype=np.int32),
    }
    cfg = Config()
    cfg.loss.name = "ce"
    cfg.loss.use_class_weights = False
    opt = make_optimizer()
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        state = create_train_state(model, key, batch, opt)
    state = jax.device_put(state, jax.devices()[0])
    step = make_train_step(model, cfg.loss, opt, donate=False)
    jbatch = {k: jnp.asarray(v) for k, v in batch.items()}
    cw = jnp.ones(num_classes)
    # chained train steps: state evolves, so iterations serialize naturally.
    # MIN over reps (bench.py hardening, r5): a single rep can catch a relay
    # jitter spike — one pooled row read 80.7 ms for a 16 ms step that way.
    np.asarray(step(state, jbatch, jnp.float32(1e-3), cw, key)[1]["loss"])
    train_s = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        s = state
        for _ in range(train_iters):
            s, m = step(s, jbatch, jnp.float32(1e-3), cw, key)
        np.asarray(m["loss"])
        train_s = min(train_s, (time.perf_counter() - t0) / train_iters)

    row = {
        "model": name,
        "params": int(n_params),
        "model_size_mb": round(n_params * 4 / 1024 / 1024, 2),
        "inference_ms": round(fwd_s * 1e3, 3),
        "points_per_sec": round(pts_per_sec, 1),
        "train_step_ms": round(train_s * 1e3, 2),
        "est_epoch_time_s": round(train_s * steps_per_epoch, 1),
    }
    if device_mem_mb is not None:
        row["device_peak_mb"] = device_mem_mb
    if config_note:
        row["config_note"] = config_note
    ref = REFERENCE_POINTS_PER_SEC.get(name)
    if ref:
        row["reference_gpu_points_per_sec"] = ref
        row["vs_reference"] = round(pts_per_sec / ref, 2)
    try:  # host RSS like eva_model.py:184-186
        import psutil

        row["host_rss_mb"] = round(
            psutil.Process().memory_info().rss / 1024 / 1024, 1
        )
    except Exception:
        pass
    return row


def run_benchmark(
    zoo: Optional[Dict[str, Dict]] = None,
    out_dir: str = "benchmark_results",
    **kwargs,
) -> List[Dict[str, Any]]:
    zoo = zoo if zoo is not None else DEFAULT_ZOO
    rows = []
    for name, mkw in zoo.items():
        try:
            row = evaluate_model(name, model_kwargs=mkw, **kwargs)
        except Exception as e:  # keep the sweep alive (eva_model.py behavior)
            row = {"model": name, "error": str(e)[:200]}
        rows.append(row)
        print(row, flush=True)
    os.makedirs(out_dir, exist_ok=True)
    save_results_csv(rows, os.path.join(out_dir, "model_performance_comparison.csv"))
    try:
        _charts(rows, out_dir)
    except Exception:
        pass
    return rows


def save_results_csv(rows: List[Dict[str, Any]], path: str) -> None:
    fields = sorted({k for r in rows for k in r})
    lead = [f for f in ("model", "params", "model_size_mb", "inference_ms",
                        "points_per_sec", "train_step_ms", "est_epoch_time_s")
            if f in fields]
    fields = lead + [f for f in fields if f not in lead]
    with open(path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=fields)
        w.writeheader()
        w.writerows(rows)


def _charts(rows: List[Dict[str, Any]], out_dir: str) -> None:
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    ok = [r for r in rows if "points_per_sec" in r]
    if not ok:
        return
    names = [r["model"] for r in ok]
    for key, title in [
        ("points_per_sec", "Inference throughput (points/sec)"),
        ("inference_ms", "Inference latency (ms)"),
        ("params", "Parameters"),
        ("train_step_ms", "Train step (ms)"),
    ]:
        fig, ax = plt.subplots(figsize=(8, 4))
        ax.bar(names, [r[key] for r in ok])
        ax.set_title(title)
        ax.tick_params(axis="x", rotation=30)
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"{key}.png"), dpi=150)
        plt.close(fig)

    # radar chart of normalized metrics (eva_model.py:281-382 radar)
    import numpy as _np

    axes_keys = ["points_per_sec", "inference_ms", "params", "train_step_ms"]
    vals = _np.array([[r[k] for k in axes_keys] for r in ok], float)
    # lower-is-better columns inverted, then max-normalize
    for j, k in enumerate(axes_keys):
        if k != "points_per_sec":
            vals[:, j] = 1.0 / _np.maximum(vals[:, j], 1e-9)
    vals = vals / _np.maximum(vals.max(axis=0, keepdims=True), 1e-12)
    ang = _np.linspace(0, 2 * _np.pi, len(axes_keys), endpoint=False).tolist()
    ang += ang[:1]
    fig = plt.figure(figsize=(7, 7))
    ax = fig.add_subplot(111, polar=True)
    for name, row in zip(names, vals):
        data = row.tolist() + row[:1].tolist()
        ax.plot(ang, data, label=name)
        ax.fill(ang, data, alpha=0.08)
    ax.set_xticks(ang[:-1])
    ax.set_xticklabels(["throughput", "1/latency", "1/params", "1/train_ms"])
    ax.legend(loc="upper right", bbox_to_anchor=(1.25, 1.1), fontsize=8)
    fig.tight_layout()
    fig.savefig(os.path.join(out_dir, "radar.png"), dpi=150)
    plt.close(fig)


if __name__ == "__main__":
    run_benchmark()
