"""Jittable compute ops: geometry, features, matching, robust estimation.

All functions here are pure, shape-static, and safe to `jax.jit` / `vmap` /
`shard_map`. Hot kernels have Pallas TPU implementations under `ops.pallas`
with jnp fallbacks for CPU testing.
"""
