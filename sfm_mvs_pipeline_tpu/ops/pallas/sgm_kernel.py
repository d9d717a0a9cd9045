"""Pallas TPU kernel: bidirectional SGM cost aggregation.

The SGM recurrence (mvs/sgm.py, replacing openMVS's SGM path — ref:
src/photogrammetrie/mvs/MVS.cpp:113-116) is sequential along the scan axis
and VPU-parallel across (lanes = disparities, sublanes = the cross axis).
This kernel runs BOTH directions of one axis in a single grid sweep: grid
step s processes scan position s for the forward recurrence and position
S-1-s for the backward one (two input blocks with mirrored index maps), so
each step does 2·L·D of VPU work while Pallas double-buffers the HBM->VMEM
streams. The carried SGM state lives in VMEM scratch, which persists across
grid steps on TPU. The vertical pair reuses the same kernel on the
transposed volume.

Layout: disparity D on lanes (128), the cross axis L on sublanes, scan axis
S as the (sequential) grid dimension.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 1e9


def _sgm_step(prev: jax.Array, c: jax.Array, p1, p2) -> jax.Array:
    """One SGM update: prev, c: (L, D) -> L_r(s) = c + min(prev, prev[d+-1]
    + P1, min_d' prev + P2) - min_d' prev."""
    m = jnp.min(prev, axis=-1, keepdims=True)
    up = jnp.concatenate([prev[:, :1] + p1, prev[:, :-1] + p1], axis=1)
    dn = jnp.concatenate([prev[:, 1:] + p1, prev[:, -1:] + p1], axis=1)
    best = jnp.minimum(jnp.minimum(prev, up), jnp.minimum(dn, m + p2))
    return c + best - m


def _sgm_kernel(p_ref, cf_ref, cb_ref, of_ref, ob_ref, state_f, state_b):
    p1 = p_ref[0, 0]
    p2 = p_ref[0, 1]
    # grid = (l_chunks, S): the sequential scan dim is INNERMOST so the
    # VMEM scratch state persists across the whole sweep of one L-chunk
    # and re-initializes at s == 0 of the next chunk
    s = pl.program_id(1)

    cf = cf_ref[0]
    cb = cb_ref[0]

    @pl.when(s == 0)
    def _():
        of_ref[0] = cf
        ob_ref[0] = cb
        state_f[:] = cf
        state_b[:] = cb

    @pl.when(s > 0)
    def _():
        out_f = _sgm_step(state_f[:], cf, p1, p2)
        out_b = _sgm_step(state_b[:], cb, p1, p2)
        of_ref[0] = out_f
        ob_ref[0] = out_b
        state_f[:] = out_f
        state_b[:] = out_b


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# cross-axis rows are independent recurrences, so the L axis is tiled:
# holding a full (L, 128) row block per buffer overflowed the 16 MB VMEM
# budget at the reference's 3200-px ladder (L=3200: ~19 MB scoped)
_L_TILE = 512


@functools.partial(jax.jit, static_argnames=("interpret",))
def _sgm_bidir_sld(cost_sld: jax.Array, p1, p2, interpret: bool = False):
    """Forward + backward SGM along axis 0 of (S, L, D); returns their sum."""
    s, l, d = cost_sld.shape
    lt = min(_L_TILE, _round_up(l, 8))
    lp = _round_up(l, lt)
    dp = _round_up(d, 128)
    cost = jnp.pad(
        cost_sld.astype(jnp.float32),
        ((0, 0), (0, lp - l), (0, dp - d)),
        constant_values=_BIG,
    )
    params = jnp.array([[p1, p2]], jnp.float32)
    n_l = lp // lt

    out_f, out_b = pl.pallas_call(
        _sgm_kernel,
        out_shape=(
            jax.ShapeDtypeStruct((s, lp, dp), jnp.float32),
            jax.ShapeDtypeStruct((s, lp, dp), jnp.float32),
        ),
        grid=(n_l, s),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, lt, dp), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, lt, dp), lambda j, i: (s - 1 - i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, lt, dp), lambda j, i: (i, j, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, lt, dp), lambda j, i: (s - 1 - i, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        scratch_shapes=[
            pltpu.VMEM((lt, dp), jnp.float32),
            pltpu.VMEM((lt, dp), jnp.float32),
        ],
        interpret=interpret,
    )(params, cost, cost)
    return (out_f + out_b)[:, :l, :d]


def sgm_bidir_pallas(
    cost_hwd: jax.Array,  # (H, W, D) float32
    p1,
    p2,
    interpret: bool = False,
) -> jax.Array:
    """Sum of left->right and right->left SGM aggregations along axis 1.
    Returns (H, W, D)."""
    out = _sgm_bidir_sld(
        jnp.swapaxes(cost_hwd, 0, 1), p1, p2, interpret=interpret
    )
    return jnp.swapaxes(out, 0, 1)
