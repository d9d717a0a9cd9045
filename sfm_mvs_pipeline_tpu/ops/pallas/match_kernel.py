"""Pallas TPU kernel: tiled pairwise descriptor distances + running 2-NN.

The #1 hot loop of the reference pipeline (knnMatch over all descriptor
pairs; ref: src/photogrammetrie/sfm/UnorderedFeatureMatchingStrategy.cpp:50-65,
SURVEY.md §3.2) mapped onto the MXU:

    dist^2(q, t) = |q|^2 + |t|^2 - 2 q.t

The dot product tile rides the 128x128 systolic array. The top-2 selection
is **lane-blocked**: the kernel keeps a per-(query-row, lane) running top-2
(best, second, best-index) in VMEM scratch and merges each target tile with
purely elementwise VPU ops — no cross-lane reductions in the hot loop; the
single cross-lane collapse to the global top-2 happens once at the end in
XLA on an (F, 128) array.

|q|^2 is a per-row constant that cannot change any within-row ordering, so
the kernel ranks by the shifted score |t|^2 - 2 q.t and the caller adds
|q|^2 back onto the returned distances. |t|^2 is precomputed outside the
kernel with the invalid-target mask folded in (BIG), and the -2 is
pre-folded into the query operand (exact: a power of two).

Operand precision (r4, fixing the r3 ADVICE finding that the former
[q_hi|q_lo].[t_hi|t_lo] width-2D split dropped the dominant cross terms and
delivered plain-bf16 accuracy at 2x MXU cost):
  * fast (default): ONE bf16 pass at width D. Relative dot error ~1.3e-3
    (measured max vs f64, random SIFT-scale data) — distance ranking noise
    far below the Lowe-ratio margin; post-ratio matches are identical to
    the f32 oracle on real SIFT data (tests/test_matching.py TPU check,
    bench_suite/match_accuracy.py). Measured 0.10 ms for 8192x8192x128 —
    ~92% of the chip's measured 183 TF/s matmul rate on the kernel's
    useful work (2*F^2*D flops).
  * exact: a THREE-term split [q_hi|q_lo|q_hi].[t_hi|t_hi|t_lo] whose one
    width-3D bf16 pass computes qhi.thi + qlo.thi + qhi.tlo — max relative
    error ~3.2e-6 (measured vs f64; the dropped qlo.tlo term is O(2^-18)).
    3x the MXU work of fast; measured 0.30 ms (~95% of the 3D-width MXU
    floor): use when bit-level distance fidelity matters more than speed.
  * ORB/Hamming (+-1 bf16 expansion, D=256): products are +-1 and the f32
    accumulator is exact — single pass, no split, exact Hamming.
Off-TPU (the CPU interpret path of the unit tests) operands stay f32 with
precision=HIGHEST, so oracle tests are deterministic.

Grid: (F/TILE_Q, F/TILE_T), target-tile axis innermost. Accumulators live
in VMEM scratch across the target sweep; outputs are written once at the
last target step. (An alternative 1D-grid form holding all of t in VMEM
compiles >10x slower remotely and gained nothing — the 2D grid with
scratch is within noise of the merge-only floor, 0.08 ms measured.)

Tie-breaking: within a lane, earlier targets win (strict <); across lanes
the final argmin picks the lowest lane, which is not necessarily the lowest
global index. Exact f32 distance ties ARE common on the ORB/Hamming path
(integer-valued distances), so on a tie best_idx may differ from
two_nn_jnp/OpenCV (lowest-lane vs lowest-index winner). The contract
guarantee is therefore "identical post-ratio-test results", not identical
best_idx on exact ties: a tied best/second gives ratio 1.0 and is rejected
by the Lowe test on every backend.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_BIG = 3.0e38

# tile sizes: (2048, 1024) measured best on the v5e chip with difference
# timing (TILE_T=2048 regresses 0.10 -> 0.15 ms; see
# bench_suite/match_variants5.py). VMEM at (2048, 1024), bf16 width D=128:
# 0.5 MB q + 0.25 MB t operand double-buffers + 8 MB f32 score tile +
# 3 MB scratch accumulators — well inside the 16 MB budget.
TILE_Q = 2048
TILE_T = 1024
LANES = 128
_SUB = TILE_T // LANES


def _two_nn_kernel(q_ref, t_ref, tn_ref, best_ref, second_ref, idx_ref,
                   b_s, s_s, i_s, *, precision):
    j = pl.program_id(1)
    # hoisted: program_id inside the pl.when body breaks the CPU interpret
    # lowering (cond branch jaxprs don't inline it there)
    qtile = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        b_s[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        s_s[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        i_s[...] = jnp.zeros((TILE_Q, LANES), dtype=jnp.int32)

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
    best = b_s[...]
    second = s_s[...]
    bidx = i_s[...]
    for sub in range(_SUB):
        cand = s[:, sub * LANES : (sub + 1) * LANES]
        cidx = lane + (j * TILE_T + sub * LANES)
        hi = jnp.maximum(best, cand)
        second = jnp.minimum(second, hi)
        bidx = jnp.where(cand < best, cidx, bidx)
        best = jnp.minimum(best, cand)
    b_s[...] = best
    s_s[...] = second
    i_s[...] = bidx

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        # collapse the 128 per-lane top-2 to the global top-2 IN-KERNEL
        # (once per query tile): the r4.0 kernel emitted 3x (F, 128)
        # blocks (12 MB written + re-read by an XLA collapse pass, ~25%
        # of the measured time); the collapsed outputs are 3x (1, TILE_Q).
        # The global best is some lane's best; the global second is either
        # another lane's best or the winning lane's second.
        bl = b_s[...]
        sl = s_s[...]
        il = i_s[...]
        g_best = jnp.min(bl, axis=1)  # (TILE_Q,)
        a = jnp.argmin(bl, axis=1)
        sel = lane == a[:, None]
        g_idx = jnp.sum(jnp.where(sel, il, 0), axis=1)
        rest = jnp.where(sel, _BIG, bl)
        g_second = jnp.minimum(jnp.min(sl, axis=1), jnp.min(rest, axis=1))
        best_ref[qtile, :] = g_best
        second_ref[qtile, :] = g_second
        idx_ref[qtile, :] = g_idx


def _pad_to(x, n, axis, value=0):
    pad = n - x.shape[axis]
    if pad <= 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths, constant_values=value)


def prepare_descriptors(descriptors: jax.Array, valid: jax.Array):
    """Per-shot MXU operand prep for the batched TPU match path.

    The per-pair wrapper spends ~0.09 ms on casts/norms/the -2 fold —
    comparable to the 0.10 ms kernel itself. When S shots feed P ~ S^2/2
    pairs, doing it once per SHOT amortizes it to noise. Returns
    (q_ops (S,F,D) bf16 query operands with -2 folded,
     t_ops (S,F,D) bf16 target operands,
     qn (S,F) f32 squared norms,
     tn (S,F) f32 squared norms with invalid slots at BIG)."""
    df = descriptors.astype(jnp.float32)
    n = jnp.sum(df * df, axis=-1)  # (S, F)
    q_ops = (df * -2.0).astype(jnp.bfloat16)
    t_ops = df.astype(jnp.bfloat16)
    tn = jnp.where(valid, n, _BIG)
    return q_ops, t_ops, n, tn


def two_nn_pallas_prepared(
    q_op: jax.Array,  # (Fq, D) bf16, -2 pre-folded
    t_op: jax.Array,  # (Ft, D) bf16
    qn: jax.Array,  # (Fq,) f32
    tn: jax.Array,  # (Ft,) f32, invalid slots = BIG
    valid_q: jax.Array,  # (Fq,) bool
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """2-NN on pre-built operands (see prepare_descriptors). TPU fast
    path; same contract as two_nn_pallas."""
    fq, d = q_op.shape
    ft = t_op.shape[0]
    fq_p = pl.cdiv(fq, TILE_Q) * TILE_Q
    ft_p = pl.cdiv(ft, TILE_T) * TILE_T
    d_p = pl.cdiv(d, 128) * 128
    q = _pad_to(_pad_to(q_op, fq_p, 0), d_p, 1)
    t = _pad_to(_pad_to(t_op, ft_p, 0), d_p, 1)
    tn_p = _pad_to(tn, ft_p, 0, value=_BIG)[None, :]

    best, second, idx = _call_kernel(
        q, t, tn_p, fq_p, ft_p, d_p, jax.lax.Precision.DEFAULT, interpret
    )
    l1, l2, gidx = _collapse(best, second, idx)
    best_sq = jnp.where(valid_q, jnp.maximum(l1[:fq] + qn[:fq], 0.0), _BIG)
    second_sq = jnp.maximum(l2[:fq] + qn[:fq], 0.0)
    best_idx = jnp.clip(gidx[:fq], 0, ft - 1)
    return best_idx, best_sq, second_sq


def _call_kernel(q, t, tn, fq_p, ft_p, d_p, precision, interpret):
    """Returns the COLLAPSED per-query (best, second, idx), each shaped
    (n_qtiles, TILE_Q) — row i holds query tile i."""
    grid = (fq_p // TILE_Q, ft_p // TILE_T)
    n_q = fq_p // TILE_Q
    return pl.pallas_call(
        functools.partial(_two_nn_kernel, precision=precision),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE_Q, d_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE_T, d_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, TILE_T), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            # whole-(n_q, TILE_Q) blocks (tiny) with dynamic row writes at
            # the last j step — a (1, TILE_Q) block would violate the
            # (8, 128)-divisible block rule
            pl.BlockSpec((n_q, TILE_Q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, TILE_Q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n_q, TILE_Q), lambda i, j: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, TILE_Q), jnp.float32),
            jax.ShapeDtypeStruct((n_q, TILE_Q), jnp.float32),
            jax.ShapeDtypeStruct((n_q, TILE_Q), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_Q, LANES), jnp.float32),
            pltpu.VMEM((TILE_Q, LANES), jnp.float32),
            pltpu.VMEM((TILE_Q, LANES), jnp.int32),
        ],
        interpret=interpret,
    )(q, t, tn)


def _collapse(best, second, idx):
    """Flatten the kernel's per-tile rows to (Fq_p,) vectors."""
    return best.reshape(-1), second.reshape(-1), idx.reshape(-1)


@functools.partial(jax.jit, static_argnames=("interpret", "exact"))
def two_nn_pallas(
    desc_q: jax.Array,
    desc_t: jax.Array,
    valid_q: jax.Array,
    valid_t: jax.Array,
    interpret: bool = False,
    exact: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """2-NN squared distances. Same contract as matching.two_nn_jnp.

    desc_*: (F, D) float32/bfloat16; valid_*: (F,) bool.
    exact=True selects the 3-term-split operands (~3e-6 relative dot error,
    3x MXU work) instead of the default single bf16 pass (~1.3e-3).
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

    # MXU operand prep (see module docstring): the -2 of the distance
    # expansion is folded into the query side here (exact: power of two).
    precision = jax.lax.Precision.DEFAULT
    if q.dtype == jnp.bfloat16:
        # ORB +-1 Hamming expansion: EXACT in one bf16 pass (products are
        # +-2 after the fold, accumulation is f32)
        q = (q.astype(jnp.float32) * -2.0).astype(jnp.bfloat16)
    elif jax.default_backend() == "tpu":
        q2 = qf * -2.0
        if exact:
            q_hi = q2.astype(jnp.bfloat16)
            q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            t_hi = tf.astype(jnp.bfloat16)
            t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            q = jnp.concatenate([q_hi, q_lo, q_hi], axis=1)
            t = jnp.concatenate([t_hi, t_hi, t_lo], axis=1)
            d_p = 3 * d_p
        else:
            q = q2.astype(jnp.bfloat16)
            t = tf.astype(jnp.bfloat16)
    else:
        q = qf * -2.0
        t = tf
        precision = jax.lax.Precision.HIGHEST

    best, second, idx = _call_kernel(
        q, t, tn, fq_p, ft_p, d_p, precision, interpret
    )
    l1, l2, gidx = _collapse(best, second, idx)
    best_sq = jnp.where(valid_q, jnp.maximum(l1[:fq] + qn[:fq], 0.0), _BIG)
    second_sq = jnp.maximum(l2[:fq] + qn[:fq], 0.0)
    best_idx = jnp.clip(gidx[:fq], 0, ft - 1)
    return best_idx, best_sq, second_sq
