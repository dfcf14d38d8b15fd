"""Test env: force the CPU backend with 8 virtual devices so multi-chip
sharding paths (pjit/shard_map over a Mesh) are exercised without TPU hardware.

Note: this image's sitecustomize force-registers a remote TPU PJRT plugin
("axon") and re-appends it to JAX_PLATFORMS, so the env var alone is not
enough — we must also override jax_platforms via jax.config after import,
which is authoritative for default-backend selection.
"""

import os

# Dryrun runs under pytest (tests/test_graft_entry.py) must not overwrite the
# committed solo-measured per-mode wall artifact with contended/tiny-mesh
# numbers (the bootstrap subprocess inherits this env).
os.environ.setdefault("PCB_DRYRUN_WALLS", "0")

if os.environ.get("PCB_TEST_BACKEND", "cpu") == "cpu":
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
else:
    # PCB_TEST_BACKEND=tpu: leave the image's default (axon TPU) backend so
    # the @skipif(backend != "tpu") hardware-exactness tests execute:
    #   PCB_TEST_BACKEND=tpu python -m pytest tests/test_pallas_kernels.py
    import jax  # noqa: F401

import numpy as np
import pytest


def pytest_configure(config):
    # Tiering (VERDICT r4 #3): the full suite is ~55 min on this 1-core box.
    # Smoke tier (documented in CLAUDE.md): pytest -m "not slow" — target
    # ~10 min. Category markers select subsystems: -m mesh (8-device
    # shard_map parallelism), -m torchref (suites that execute torch
    # reference models for parity).
    config.addinivalue_line(
        "markers", "slow: minutes-scale on this box (excluded from smoke tier)"
    )
    config.addinivalue_line(
        "markers", "mesh: exercises the 8-device virtual mesh (shard_map/pjit)"
    )
    config.addinivalue_line(
        "markers", "torchref: executes torch reference models for parity"
    )


@pytest.fixture
def rng():
    return np.random.default_rng(0)
