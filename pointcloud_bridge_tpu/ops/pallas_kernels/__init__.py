"""Fused Pallas TPU kernels for the hot point-cloud ops.

Each kernel has a jnp canonical twin in `ops/`; public dispatchers fall back to
the jnp path off-TPU. Kernels are validated against the jnp implementations in
tests (interpret mode on CPU, compiled on TPU).
"""
