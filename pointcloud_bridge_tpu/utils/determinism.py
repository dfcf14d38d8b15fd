"""Determinism helpers (utils/misc.py:63-88 set_random_seed equivalent).

JAX is deterministic by construction given fixed PRNG keys; this seeds the
host-side RNGs the data layer uses and returns a root jax key."""

from __future__ import annotations

import random

import jax
import numpy as np


def set_random_seed(seed: int, deterministic: bool = True) -> jax.Array:
    """Seed python/numpy RNGs; returns jax.random.PRNGKey(seed).

    deterministic=True additionally disables XLA autotune nondeterminism
    sources where applicable (no-op on current TPU backends, kept for the
    reference's API shape)."""
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)
