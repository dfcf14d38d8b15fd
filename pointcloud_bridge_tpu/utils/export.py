"""Model export (savemodel.py:22-60 equivalent).

The reference exports a TensorBoard graph and has a commented-out ONNX path.
TPU-native equivalents:
  - export_stablehlo(): serialize the jitted forward via jax.export
    (StableHLO) — the portable deployment format for JAX models.
  - dump_hlo_text(): human-readable optimized HLO for inspection.
"""

from __future__ import annotations

import os
from typing import Any, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def export_stablehlo(
    model, variables: Any, out_path: str, batch_size: int = 1,
    num_points: int = 4096, feat_ch: int = 3,
) -> str:
    """Serialize the inference function to a StableHLO artifact."""
    from jax import export as jexport

    def fwd(xyz, feats):
        return model.apply(variables, xyz, feats, train=False)

    xyz = jax.ShapeDtypeStruct((batch_size, num_points, 3), jnp.float32)
    feats = jax.ShapeDtypeStruct((batch_size, num_points, feat_ch), jnp.float32)
    exported = jexport.export(jax.jit(fwd))(xyz, feats)
    blob = exported.serialize()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "wb") as f:
        f.write(blob)
    return out_path


def load_stablehlo(path: str):
    """Deserialize and return a callable."""
    from jax import export as jexport

    with open(path, "rb") as f:
        exported = jexport.deserialize(f.read())
    return exported.call


def dump_hlo_text(
    model, variables: Any, out_path: str, batch_size: int = 1,
    num_points: int = 4096, feat_ch: int = 3,
) -> str:
    def fwd(xyz, feats):
        return model.apply(variables, xyz, feats, train=False)

    xyz = np.zeros((batch_size, num_points, 3), np.float32)
    feats = np.zeros((batch_size, num_points, feat_ch), np.float32)
    lowered = jax.jit(fwd).lower(xyz, feats)
    txt = lowered.as_text()
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    with open(out_path, "w") as f:
        f.write(txt)
    return out_path
