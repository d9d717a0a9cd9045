"""Pallas TPU kernel: tiled pairwise descriptor distances + running 2-NN.

The #1 hot loop of the reference pipeline (knnMatch over all descriptor
pairs; ref: src/photogrammetrie/sfm/UnorderedFeatureMatchingStrategy.cpp:50-65,
SURVEY.md §3.2) mapped onto the MXU:

    dist^2(q, t) = |q|^2 + |t|^2 - 2 q.t

The dot product tile rides the 128x128 systolic array; the running top-2
(best distance, second distance, best index) is merged on the VPU across
target tiles. One kernel serves SIFT-L2 (f32/bf16, D=128) and ORB-Hamming
(+-1 expansion, D=256; see ops/matching.py).

Grid: (F/TILE_Q, F/TILE_T), target-tile axis innermost. Outputs use a
j-independent index map so the accumulator block stays resident in VMEM
across the whole target sweep (the canonical matmul-accumulate pattern);
it is initialized at j == 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38

TILE_Q = 256
TILE_T = 512


def _two_nn_kernel(q_ref, t_ref, vt_ref, dists_ref, idx_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        dists_ref[:, 0] = jnp.full((TILE_Q,), _BIG, dtype=jnp.float32)
        dists_ref[:, 1] = jnp.full((TILE_Q,), _BIG, dtype=jnp.float32)
        idx_ref[:, 0] = jnp.zeros((TILE_Q,), dtype=jnp.int32)

    q = q_ref[:]
    t = t_ref[:]
    qn = jnp.sum(q.astype(jnp.float32) * q.astype(jnp.float32), axis=1)
    tn = jnp.sum(t.astype(jnp.float32) * t.astype(jnp.float32), axis=1)
    # fold the invalid-target mask into the (TILE_T,) norm vector — one
    # vector op instead of a full (TILE_Q, TILE_T) where-pass on the VPU
    tn = jnp.where(vt_ref[0, :] != 0, tn, _BIG)
    # precision MUST be explicit: default-precision f32 dots lower to a
    # catastrophically slow path on this TPU generation (~0.9 TFLOP/s vs
    # ~420 TFLOP/s with any explicit precision, measured on v5e-lite).
    dot = jax.lax.dot_general(
        q,
        t,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST,
    )
    # no clamp-at-0 pass here: tiny negatives from rounding order the same
    # near-tie candidates either way; final outputs are clamped by the caller
    dist = qn[:, None] + tn[None, :] - 2.0 * dot

    # per-row top-2 within this tile
    m1 = jnp.min(dist, axis=1)
    a1 = jnp.argmin(dist, axis=1).astype(jnp.int32)
    col = jax.lax.broadcasted_iota(jnp.int32, dist.shape, 1)
    dist2 = jnp.where(col == a1[:, None], _BIG, dist)
    m2 = jnp.min(dist2, axis=1)
    gidx = a1 + j * TILE_T

    # merge with running (best <= second)
    best = dists_ref[:, 0]
    second = dists_ref[:, 1]
    bidx = idx_ref[:, 0]

    new_best = jnp.minimum(best, m1)
    new_second = jnp.minimum(jnp.minimum(second, m2), jnp.maximum(best, m1))
    new_bidx = jnp.where(m1 < best, gidx, bidx)

    dists_ref[:, 0] = new_best
    dists_ref[:, 1] = new_second
    idx_ref[:, 0] = new_bidx


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


@functools.partial(jax.jit, static_argnames=("interpret",))
def two_nn_pallas(
    desc_q: jax.Array,
    desc_t: jax.Array,
    valid_q: jax.Array,
    valid_t: jax.Array,
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """2-NN squared distances. Same contract as matching.two_nn_jnp.

    desc_*: (F, D) float32/bfloat16; valid_*: (F,) bool.
    Returns (best_idx (Fq,) int32, best_sq (Fq,) f32, second_sq (Fq,) f32).
    """
    fq, d = desc_q.shape
    ft = desc_t.shape[0]
    fq_p = pl.cdiv(fq, TILE_Q) * TILE_Q
    ft_p = pl.cdiv(ft, TILE_T) * TILE_T
    d_p = pl.cdiv(d, 128) * 128

    q = _pad_to(_pad_to(desc_q, fq_p, 0), d_p, 1)
    t = _pad_to(_pad_to(desc_t, ft_p, 0), d_p, 1)
    vt = _pad_to(valid_t.astype(jnp.int32), ft_p, 0)[None, :]

    grid = (fq_p // TILE_Q, ft_p // TILE_T)
    dists, idx = pl.pallas_call(
        _two_nn_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, d_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, d_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, 2), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((fq_p, 2), jnp.float32),
            jax.ShapeDtypeStruct((fq_p, 1), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, vt)

    best = jnp.where(valid_q, jnp.maximum(dists[:fq, 0], 0.0), _BIG)
    second = jnp.maximum(dists[:fq, 1], 0.0)
    best_idx = jnp.clip(idx[:fq, 0], 0, ft - 1)
    return best_idx, best, second
