"""Mesh construction and sharding helpers."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: int = 0, axis: str = "data") -> Mesh:
    """1-D device mesh over the first `num_devices` devices (0 = all)."""
    devices = jax.devices()
    if num_devices:
        devices = devices[:num_devices]
    return Mesh(np.array(devices), (axis,))


def make_named_mesh(shape, axes) -> Mesh:
    """N-D device mesh, e.g. make_named_mesh((2, 4), ("data", "pp")) for the
    composite dp x pp training config."""
    n = int(np.prod(shape))
    devices = np.array(jax.devices()[:n]).reshape(shape)
    return Mesh(devices, tuple(axes))


def shard_batch(
    batch: Dict[str, Any], mesh: Mesh, axis: str = "data", dim: int = 0
):
    """Put a host batch onto the mesh, sharded along array dim `dim`.

    dim=0 is the plain per-step batch (shard B); dim=1 handles the stacked
    [K, B, ...] batches of multi-step dispatch (shard B, replicate the step
    axis K)."""
    def put(x):
        if np.ndim(x) > dim:
            spec = P(*([None] * dim + [axis]))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return {k: put(np.asarray(v)) for k, v in batch.items()}


def replicate(tree: Any, mesh: Mesh):
    """Replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)
