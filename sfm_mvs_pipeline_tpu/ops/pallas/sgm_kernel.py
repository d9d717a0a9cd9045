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
    # c + (best - m), NOT (c + best) - m: best-m is bounded by p2 while
    # best/m themselves reach the ~1e9 pad level in the staged sweeps —
    # the left-associated form catastrophically cancels c there (c < ulp)
    return c + (best - m)


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


# ---------------------------------------------------------------------------
# r5 staged variant (VERDICT item 2): at the reference's 3200-px ladder the
# fused bidirectional form needs ~5 full f32 volumes live (cost, out_f,
# out_b, their sum, the transposed copy) and overflows the 15.75 GB HBM.
# The staged form holds exactly ONE f32 volume — a running accumulator that
# each single-direction sweep updates IN PLACE via input_output_aliasing —
# plus bf16 cost copies (4x smaller). Peak liveness at 3200x1800x128 drops
# from ~16 GB to ~8 GB.


def _sgm_dir_kernel(p_ref, c_ref, a_ref, o_ref, state):
    """One direction along the scan axis, accumulating: o = a + L_r.

    Grid (n_l, S) like _sgm_kernel; the direction is encoded in the index
    maps (reversed block order for the backward sweep). o_ref aliases a_ref
    so the accumulator is updated in place block by block."""
    p1 = p_ref[0, 0]
    p2 = p_ref[0, 1]
    s = pl.program_id(1)

    c = c_ref[0].astype(jnp.float32)

    @pl.when(s == 0)
    def _():
        o_ref[0] = a_ref[0] + c
        state[:] = c

    @pl.when(s > 0)
    def _():
        out = _sgm_step(state[:], c, p1, p2)
        o_ref[0] = a_ref[0] + out
        state[:] = out


def _sgm_dir_acc(cost, acc, p1, p2, reverse: bool, lt: int,
                 interpret: bool = False):
    """acc += L_r for one scan direction along axis 0 of cost (S, L, D).

    cost: (S, lp, dp) bf16 (padded, pad value _BIG; lp a multiple of lt);
    acc: (S, lp, dp) f32, DONATED (aliased to the output). Returns the
    updated accumulator."""
    s, lp, dp = cost.shape
    n_l = lp // lt
    params = jnp.array([[p1, p2]], jnp.float32)

    if reverse:
        def idx(j, i):
            return (s - 1 - i, j, 0)
    else:
        def idx(j, i):
            return (i, j, 0)

    return pl.pallas_call(
        _sgm_dir_kernel,
        out_shape=jax.ShapeDtypeStruct((s, lp, dp), jnp.float32),
        grid=(n_l, s),
        in_specs=[
            pl.BlockSpec((1, 2), lambda j, i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, lt, dp), idx, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lt, dp), idx, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, lt, dp), idx, memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((lt, dp), jnp.float32)],
        input_output_aliases={2: 0},
        interpret=interpret,
    )(params, cost, acc)


def sgm_staged_hwd(
    cost_hwd: jax.Array,  # (H, W, D) float32 (or bf16)
    p1,
    p2,
    interpret: bool = False,
) -> jax.Array:
    """Memory-staged 4-path SGM. Returns the SUM of the 4 directional
    aggregations, (H, W, Dp) f32 with the D axis padded to the lane
    multiple (padded lanes hold ~_BIG and never win an argmin). The caller
    divides by 4 / slices as needed."""
    h, w, d = cost_hwd.shape
    dp = _round_up(d, 128)
    # each axis serves once as the scan axis and once as the (tiled) lane
    # axis, so both are padded to a tile-divisible size
    lt_w = min(_L_TILE, _round_up(w, 8))
    lt_h = min(_L_TILE, _round_up(h, 8))
    wp = _round_up(w, lt_w)
    hp = _round_up(h, lt_h)
    cv = jnp.pad(
        cost_hwd.astype(jnp.bfloat16),
        ((0, hp - h), (0, wp - w), (0, dp - d)),
        constant_values=_BIG,
    )  # (hp, wp, dp) bf16

    # horizontal pair: scan axis W, lanes-of-rows H
    cv_h = jnp.swapaxes(cv, 0, 1)  # (wp, hp, dp) bf16
    acc = jnp.zeros((wp, hp, dp), jnp.float32)
    acc = _sgm_dir_acc(cv_h, acc, p1, p2, reverse=False, lt=lt_h,
                       interpret=interpret)
    acc = _sgm_dir_acc(cv_h, acc, p1, p2, reverse=True, lt=lt_h,
                       interpret=interpret)
    acc = jnp.swapaxes(acc, 0, 1)  # (hp, wp, dp) f32

    # vertical pair: scan axis H, lanes-of-columns W — native layout
    acc = _sgm_dir_acc(cv, acc, p1, p2, reverse=False, lt=lt_w,
                       interpret=interpret)
    acc = _sgm_dir_acc(cv, acc, p1, p2, reverse=True, lt=lt_w,
                       interpret=interpret)
    return acc[:h, :w, :]
