"""Pallas kernels vs jnp canonical implementations (interpret mode on CPU;
the same kernels compile on TPU and are exercised by bench.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pointcloud_bridge_tpu.ops.sampling import _fps_jnp
from pointcloud_bridge_tpu.ops.pallas_kernels.fps import fps_pallas


@pytest.mark.parametrize("b,n,npoint", [(2, 128, 32), (1, 256, 64), (3, 64, 64)])
def test_fps_pallas_matches_jnp(rng, b, n, npoint):
    xyz = jnp.asarray(rng.uniform(size=(b, n, 3)).astype(np.float32))
    want = np.asarray(_fps_jnp(xyz, npoint))
    got = np.asarray(fps_pallas(xyz, npoint, interpret=True))
    np.testing.assert_array_equal(got, want)


def test_fps_pallas_start_idx_array(rng):
    xyz = jnp.asarray(rng.uniform(size=(2, 96, 3)).astype(np.float32))
    starts = jnp.array([5, 17], jnp.int32)
    want = np.asarray(_fps_jnp(xyz, 16, starts))
    got = np.asarray(fps_pallas(xyz, 16, starts, interpret=True))
    np.testing.assert_array_equal(got, want)
