"""Backend-aware top-k for FEATURE SELECTION.

`jax.lax.top_k` at k in the thousands lowers to a large sorting network on
TPU whose compile time dominates the whole feature frontend (observed:
the ORB pipeline's 8 per-level top-k selections pushed the remote XLA
compile past 18 minutes). `jax.lax.approx_max_k` is the TPU-native
selection primitive (recall ~0.95 at default settings) and compiles in
seconds.

Feature selection is exactly the workload where approximate top-k is safe:
the k-th..(k+eps)-th strongest corners are interchangeable, and every
selected feature still carries its true score. CPU keeps the exact path so
oracle tests against OpenCV stay deterministic.
"""

from __future__ import annotations

import jax


def select_top_k(scores: jax.Array, k: int) -> tuple[jax.Array, jax.Array]:
    """(values, indices) of the ~top-k scores along the last axis,
    descending. Exact on CPU/GPU, approximate (approx_max_k) on TPU.

    k may exceed the axis size (an "unlimited" feature budget on a small
    image/octave): the result is then every candidate, padded to k with
    -inf values / index 0 so downstream `vals > 0` validity masks drop the
    padding."""
    import jax.numpy as jnp

    n = scores.shape[-1]
    if k >= n:
        vals, idx = jax.lax.top_k(scores, n)
        pad = [(0, 0)] * (scores.ndim - 1) + [(0, k - n)]
        return (
            jnp.pad(vals, pad, constant_values=-jnp.inf),
            jnp.pad(idx, pad, constant_values=0),
        )
    if jax.default_backend() == "tpu":
        return jax.lax.approx_max_k(scores, k)
    return jax.lax.top_k(scores, k)
