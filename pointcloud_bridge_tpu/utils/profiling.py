"""Profiling & timing utilities (SURVEY.md §5 'Tracing/profiling').

The reference uses manual wall-clock spans + torch.cuda.synchronize timing
(eva_model.py:147-182) and max_memory_allocated peaks. TPU equivalents:
  - span(): wall-clock context manager (train_MulSca_PN2.py:225-270 style).
  - trace(): jax.profiler trace context writing TensorBoard-viewable traces.
  - device_time(): amortized per-iteration device time via chained execution
    (single-dispatch wall time only measures the host<->device round trip).
  - points_per_second(): the eva_model throughput metric.
  - live_memory(): device memory stats when the backend exposes them.
"""

from __future__ import annotations

import contextlib
import time
from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np


@contextlib.contextmanager
def span(name: str, sink: Optional[Dict[str, float]] = None):
    t0 = time.perf_counter()
    yield
    dt = time.perf_counter() - t0
    if sink is not None:
        sink[name] = sink.get(name, 0.0) + dt
    else:
        print(f"[span] {name}: {dt*1e3:.2f} ms")


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace (view in TensorBoard / xprof)."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def device_time(fn: Callable, *args, iters: int = 10) -> float:
    """Per-iteration seconds of fn(*args) measured via chained execution.

    fn must map its first argument to an output of compatible shape OR return
    anything reducible; the chain perturbs the first arg with a tiny
    output-dependent delta so iterations serialize.
    """
    from jax import lax

    def chained(x, rest, count):
        def body(i, carry):
            x, acc = carry
            out = fn(x, *rest)
            delta = jnp.tanh(jnp.mean(
                jax.tree.leaves(out)[0].astype(jnp.float32))) * 1e-6
            return (x + delta, acc + delta)

        _, acc = lax.fori_loop(0, count, body, (x, 0.0))
        return acc

    run = jax.jit(chained, static_argnums=(2,))
    x, rest = args[0], args[1:]
    np.asarray(run(x, rest, iters))
    np.asarray(run(x, rest, 1))
    # T_K and T_1 each MIN over reps before differencing (relay dispatch
    # jitter is multi-ms; differencing single trials can go negative)
    tk = t1 = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(run(x, rest, iters))
        tk = min(tk, time.perf_counter() - t0)
        t0 = time.perf_counter()
        np.asarray(run(x, rest, 1))
        t1 = min(t1, time.perf_counter() - t0)
    return max((tk - t1) / (iters - 1), 1e-9)


def points_per_second(fn: Callable, xyz, *rest, iters: int = 10) -> float:
    dt = device_time(fn, xyz, *rest, iters=iters)
    b, n = xyz.shape[:2]
    return b * n / dt


def live_memory() -> Dict[str, float]:
    """Per-device memory stats in MB (empty when unsupported)."""
    out = {}
    for d in jax.devices():
        try:
            stats = d.memory_stats()
            out[str(d)] = {
                k: v / 1024 / 1024 for k, v in stats.items() if "bytes" in k
            }
        except Exception:
            pass
    return out
