"""Pallas TPU kernel: tiled pairwise descriptor distances + running 2-NN.

The #1 hot loop of the reference pipeline (knnMatch over all descriptor
pairs; ref: src/photogrammetrie/sfm/UnorderedFeatureMatchingStrategy.cpp:50-65,
SURVEY.md §3.2) mapped onto the MXU:

    dist^2(q, t) = |q|^2 + |t|^2 - 2 q.t

The dot product tile rides the 128x128 systolic array. The top-2 selection
is **lane-blocked**: the kernel keeps a per-(query-row, lane) running top-2
(best, second, best-index) and merges each target tile with purely
elementwise VPU ops — no cross-lane reductions in the hot loop. (Cross-lane
min/argmin per grid step was the previous bottleneck: each one costs a
multi-step lane shuffle; with 4 of them per tile the kernel ran ~7x slower
than this formulation.) The single cross-lane reduce that collapses the 128
per-lane candidates to the global top-2 happens once at the end, in XLA, on
an (F, 128) array.

|q|^2 is a per-row constant that cannot change any within-row ordering, so
the kernel ranks by the shifted score |t|^2 - 2 q.t and the caller adds
|q|^2 back onto the returned distances. |t|^2 is precomputed on the host
side of the call with the invalid-target mask folded in (BIG), so the
kernel never touches a mask tile.

One kernel serves SIFT-L2 (f32/bf16, D=128) and ORB-Hamming (+-1 expansion,
D=256; see ops/matching.py).

Grid: (F/TILE_Q, F/TILE_T), target-tile axis innermost. Outputs use a
j-independent index map so the accumulator blocks stay resident in VMEM
across the whole target sweep (the canonical matmul-accumulate pattern);
they are initialized at j == 0.

Tie-breaking: within a lane, earlier targets win (strict <); across lanes
the final argmin picks the lowest lane, which is not necessarily the lowest
global index. Exact f32 distance ties ARE common on the ORB/Hamming path
(the +-1 expansion yields integer-valued distances), so on a tie best_idx
may differ from two_nn_jnp/OpenCV (lowest-lane vs lowest-index winner).
The contract guarantee is therefore "identical post-ratio-test results",
not identical best_idx on exact ties: a tied best/second gives ratio 1.0
and is rejected by the Lowe test on every backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38

# tile sizes: larger query tiles amortize the per-grid-step accumulator
# traffic; measured on the v5e chip for the 8192x8192x128 bf16-split shape:
# (1024, 1024) -> 916 pairs/s, (2048, 1024) -> 976 pairs/s,
# (1024, 2048) and (512, 2048) regress. VMEM at (2048, 1024): ~2.5 MB
# operand double-buffers + 3 MB accumulators + the 8 MB f32 score tile —
# inside the 16 MB budget; (2048, 2048) would blow it.
TILE_Q = 2048
TILE_T = 1024
LANES = 128
_SUB = TILE_T // LANES


def _two_nn_kernel(q_ref, t_ref, tn_ref, best_ref, second_ref, idx_ref,
                   *, precision):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        best_ref[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        second_ref[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        idx_ref[...] = jnp.zeros((TILE_Q, LANES), dtype=jnp.int32)

    # On TPU the operands arrive as bf16 (native +-1 Hamming expansion, or
    # the hi|lo bf16 split of f32 built by two_nn_pallas) and the MXU
    # accumulates bf16 products into f32 — single-pass bf16 is 3x the
    # f32-HIGHEST (6-pass) throughput for the same D. (Pallas/Mosaic does
    # not lower Precision.HIGH, hence the explicit bf16x2 split.) Off-TPU
    # (the CPU interpret path of the unit tests) XLA accumulates bf16 dots
    # IN bf16, so f32 operands stay f32 with precision=HIGHEST there.
    dot = jax.lax.dot_general(
        q_ref[:],
        t_ref[:],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    # shifted squared distance: |t|^2 - 2 q.t. The -2 is pre-folded into
    # the query operand on the host side (exact: power of two), so the
    # per-entry VPU work here is ONE add instead of mul+sub.
    s = tn_ref[0, :][None, :] + dot

    lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, LANES), 1)
    best = best_ref[...]
    second = second_ref[...]
    bidx = idx_ref[...]
    for sub in range(_SUB):
        cand = s[:, sub * LANES : (sub + 1) * LANES]
        cidx = lane + (j * TILE_T + sub * LANES)
        hi = jnp.maximum(best, cand)
        second = jnp.minimum(second, hi)
        bidx = jnp.where(cand < best, cidx, bidx)
        best = jnp.minimum(best, cand)
    best_ref[...] = best
    second_ref[...] = second
    idx_ref[...] = bidx


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

    qf = q.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=1)  # (fq_p,)
    tn = jnp.sum(tf * tf, axis=1)  # (ft_p,)
    tn = jnp.where(_pad_to(valid_t, ft_p, 0), tn, _BIG)[None, :]

    # MXU operand prep (the -2 of the distance expansion is folded into the
    # query side here — exact, it is a power of two):
    #  * bf16 inputs (the ORB +-1 Hamming expansion): EXACT in one bf16
    #    pass (products are +-2, accumulation is f32).
    #  * f32 inputs (SIFT): split into hi|lo bf16 halves concatenated
    #    along D, so ONE bf16 dot of width 2D computes
    #    qhi.thi + qhi.tlo + qlo.thi + qlo.tlo — bf16x4 accuracy
    #    (~1e-7 relative) at 3x the throughput of the 6-pass f32 HIGHEST.
    precision = jax.lax.Precision.DEFAULT
    if q.dtype == jnp.bfloat16:
        q = (q.astype(jnp.float32) * -2.0).astype(jnp.bfloat16)
    elif jax.default_backend() == "tpu":
        q2 = qf * -2.0
        q_hi = q2.astype(jnp.bfloat16)
        q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = tf.astype(jnp.bfloat16)
        t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate([q_hi, q_lo], axis=1)
        t = jnp.concatenate([t_hi, t_lo], axis=1)
        d_p = 2 * d_p
    else:
        q = qf * -2.0
        t = tf
        precision = jax.lax.Precision.HIGHEST

    grid = (fq_p // TILE_Q, ft_p // TILE_T)
    best, second, idx = pl.pallas_call(
        functools.partial(_two_nn_kernel, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, d_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, d_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((TILE_Q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_Q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((fq_p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((fq_p, LANES), jnp.float32),
            jax.ShapeDtypeStruct((fq_p, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, tn)

    # collapse the 128 per-lane top-2 candidates to the global top-2: the
    # global best is some lane's best; the global second is either another
    # lane's best or the winning lane's second.
    a = jnp.argmin(best, axis=1)
    l1 = jnp.take_along_axis(best, a[:, None], axis=1)[:, 0]
    gidx = jnp.take_along_axis(idx, a[:, None], axis=1)[:, 0]
    lane = jax.lax.broadcasted_iota(jnp.int32, best.shape, 1)
    rest = jnp.where(lane == a[:, None], _BIG, best)
    l2 = jnp.minimum(jnp.min(second, axis=1), jnp.min(rest, axis=1))

    best_sq = jnp.where(valid_q, jnp.maximum(l1[:fq] + qn[:fq], 0.0), _BIG)
    second_sq = jnp.maximum(l2[:fq] + qn[:fq], 0.0)
    best_idx = jnp.clip(gidx[:fq], 0, ft - 1)
    return best_idx, best_sq, second_sq
