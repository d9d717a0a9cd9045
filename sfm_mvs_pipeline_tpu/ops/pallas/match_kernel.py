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

Grid (r5, _two_nn_fused_kernel): (n_pairs, F/TILE_Q, F/TILE_T) with the
pair table SCALAR-PREFETCHED — block index maps read (q_shot, t_shot) rows
and stream tiles straight out of the stacked (S, F, D) operand arrays, so
a whole pair batch is ONE kernel dispatch with no per-pair slicing and no
lax.map. Accumulators live in VMEM scratch across the target sweep; the
cross-lane top-2 collapse, |q|^2 add-back and 0-clip happen at the flush
step, so outputs are 3 tiny (P, F) vectors. Operand prep (casts, -2 fold,
norms) stays in XLA per SHOT (prepare_operands): moving it in-kernel
serializes the MXU against the VPU (the dot then depends on kernel VPU
output and cannot overlap the previous step's merge — measured 0.145 ms
vs 0.10 ms, bench_suite/match_fused_probe3.py); per-shot prep amortizes
to noise across the O(S^2) pair batch. (The legacy 2D-grid form,
_two_nn_kernel, remains for the exact 3-term-split mode.)

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


def _two_nn_fused_kernel(pairs_ref, q_ref, t_ref, tn_ref, qn_ref,
                         best_ref, second_ref, idx_ref,
                         b_s, s_s, i_s, *, f32_ops):
    """Batched 2-NN on PREPARED operands: grid (P, n_qtiles, n_ttiles).

    r5 (VERDICT item 1): the kernel reads pre-built MXU operand tiles
    (bf16 with the -2 fold on the query side; f32 off-TPU) straight out of
    the stacked (S, F, D) arrays via a scalar-prefetched pair table — no
    per-pair slicing, no lax.map, one dispatch for the whole pair batch.
    The |q|^2 add-back, 0-clip and the cross-lane top-2 collapse happen at
    flush, so outputs are tiny (3 x (P, F)) full squared distances.

    Operand prep stays in XLA (prepare_operands) because in-kernel casting
    SERIALIZES the MXU against the VPU: a dot whose operand is produced by
    kernel VPU code cannot overlap the previous step's top-2 merge —
    measured 0.145 ms vs 0.10 ms for this same kernel on prepared tiles
    (bench_suite/match_fused_probe3.py). Per-shot prep is O(S) and
    amortizes across the O(S^2) pair batch.
    """
    j = pl.program_id(2)
    qtile = pl.program_id(1)

    @pl.when(j == 0)
    def _init():
        b_s[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        s_s[...] = jnp.full((TILE_Q, LANES), _BIG, dtype=jnp.float32)
        i_s[...] = jnp.zeros((TILE_Q, LANES), dtype=jnp.int32)

    precision = (
        jax.lax.Precision.HIGHEST if f32_ops else jax.lax.Precision.DEFAULT
    )
    dot = jax.lax.dot_general(
        q_ref[0], t_ref[0],
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=precision,
    )
    s = tn_ref[0, 0, :][None, :] + dot

    best = b_s[...]
    second = s_s[...]
    bidx = i_s[...]
    for sub in range(_SUB):
        cand = s[:, sub * LANES : (sub + 1) * LANES]
        # per-element index bookkeeping is a SCALAR block id: the winning
        # lane is positional, so global idx = block_id * 128 + lane
        # (saves the per-element iota add of the r4 form)
        blk = j * _SUB + sub
        hi = jnp.maximum(best, cand)
        second = jnp.minimum(second, hi)
        bidx = jnp.where(cand < best, blk, bidx)
        best = jnp.minimum(best, cand)
    b_s[...] = best
    s_s[...] = second
    i_s[...] = bidx

    @pl.when(j == pl.num_programs(2) - 1)
    def _flush():
        qn = qn_ref[0, 0, :]  # (TILE_Q,) |q|^2 add-back
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, LANES), 1)
        bl = b_s[...]
        sl = s_s[...]
        il = i_s[...]
        g_best = jnp.min(bl, axis=1)
        a = jnp.argmin(bl, axis=1)
        sel = lane == a[:, None]
        g_blk = jnp.sum(jnp.where(sel, il, 0), axis=1)
        g_idx = g_blk * LANES + a  # block id -> global target index
        rest = jnp.where(sel, _BIG, bl)
        g_second = jnp.minimum(jnp.min(sl, axis=1), jnp.min(rest, axis=1))
        best_ref[0, qtile, :] = jnp.maximum(g_best + qn, 0.0)
        second_ref[0, qtile, :] = jnp.maximum(g_second + qn, 0.0)
        idx_ref[0, qtile, :] = g_idx


def prepare_operands(descriptors: jax.Array, valid: jax.Array,
                     f32_ops: bool, fp: int, d_p: int):
    """Per-shot MXU operand prep for the fused batched kernel.

    Returns (q_ops (S, fp, d_p) with -2 folded, t_ops (S, fp, d_p),
    qn (S, 1, fp) f32 |q|^2, tn (S, 1, fp) f32 with invalid slots at BIG).
    bf16 on TPU (f32_ops=False), f32 otherwise."""
    df = _pad_to(_pad_to(descriptors, fp, 1), d_p, 2).astype(jnp.float32)
    n = jnp.sum(df * df, axis=-1)  # (S, fp)
    q_ops = df * -2.0
    t_ops = df
    if not f32_ops:
        q_ops = q_ops.astype(jnp.bfloat16)
        t_ops = t_ops.astype(jnp.bfloat16)
    tn = jnp.where(_pad_to(valid, fp, 1), n, _BIG)[:, None, :]
    return q_ops, t_ops, n[:, None, :], tn


def _fused_call(q_arr, t_arr, tn, qn, pairs, interpret, f32_ops):
    """Dispatch the fused kernel.

    q_arr (Sq, Fq_p, d_p) prepared query operands (-2 folded);
    t_arr (St, Ft_p, d_p) prepared target operands;
    tn (St, 1, Ft_p) f32 squared target norms with invalid slots at BIG;
    qn (Sq, 1, Fq_p) f32 squared query norms
    (the middle singletons keep the (sublane, lane) block dims legal);
    pairs (P, 2) int32 rows (q_shot, t_shot).
    Returns (best_sq, second_sq, idx), each (P, n_qtiles, TILE_Q)."""
    n_pairs = pairs.shape[0]
    fq_p = q_arr.shape[1]
    ft_p = t_arr.shape[1]
    d_p = q_arr.shape[2]
    n_q = fq_p // TILE_Q
    grid = (n_pairs, n_q, ft_p // TILE_T)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, TILE_Q, d_p), lambda p, i, j, pr: (pr[p, 0], i, 0)),
            pl.BlockSpec((1, TILE_T, d_p), lambda p, i, j, pr: (pr[p, 1], j, 0)),
            pl.BlockSpec((1, 1, TILE_T), lambda p, i, j, pr: (pr[p, 1], 0, j)),
            pl.BlockSpec((1, 1, TILE_Q), lambda p, i, j, pr: (pr[p, 0], 0, i)),
        ],
        out_specs=[
            pl.BlockSpec((1, n_q, TILE_Q), lambda p, i, j, pr: (p, 0, 0)),
            pl.BlockSpec((1, n_q, TILE_Q), lambda p, i, j, pr: (p, 0, 0)),
            pl.BlockSpec((1, n_q, TILE_Q), lambda p, i, j, pr: (p, 0, 0)),
        ],
        scratch_shapes=[
            pltpu.VMEM((TILE_Q, LANES), jnp.float32),
            pltpu.VMEM((TILE_Q, LANES), jnp.float32),
            pltpu.VMEM((TILE_Q, LANES), jnp.int32),
        ],
    )
    return pl.pallas_call(
        functools.partial(_two_nn_fused_kernel, f32_ops=f32_ops),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((n_pairs, n_q, TILE_Q), jnp.float32),
            jax.ShapeDtypeStruct((n_pairs, n_q, TILE_Q), jnp.float32),
            jax.ShapeDtypeStruct((n_pairs, n_q, TILE_Q), jnp.int32),
        ],
        interpret=interpret,
    )(pairs, q_arr, t_arr, tn, qn)


def two_nn_batch_fused(
    descriptors: jax.Array,  # (S, F, D) f32 (or bf16 +-1 Hamming expansion)
    valid: jax.Array,  # (S, F) bool
    pairs: jax.Array,  # (P, 2) int32
    interpret: bool = False,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """All pairs in ONE fused kernel dispatch (see _two_nn_fused_kernel).

    Returns (best_idx (P, F) int32, best_sq (P, F) f32, second_sq (P, F)).
    XLA-side work is one per-SHOT operand-prep pass (amortized over the
    O(S^2) pair batch) and the per-pair valid_q gather.
    """
    s, f, d = descriptors.shape
    fp = pl.cdiv(f, TILE_Q) * TILE_Q  # shared capacity: q and t tiles both
    d_p = pl.cdiv(d, 128) * 128
    f32_ops = interpret or jax.default_backend() != "tpu"
    q_ops, t_ops, qn, tn = prepare_operands(
        descriptors, valid, f32_ops, fp, d_p
    )

    best, second, idx = _fused_call(
        q_ops, t_ops, tn, qn, pairs, interpret, f32_ops
    )
    p = pairs.shape[0]
    best = best.reshape(p, -1)[:, :f]
    second = second.reshape(p, -1)[:, :f]
    idx = jnp.clip(idx.reshape(p, -1)[:, :f], 0, f - 1)
    vq = valid[pairs[:, 0]]  # (P, F)
    best = jnp.where(vq, best, _BIG)
    return idx, best, second


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

    on_tpu = jax.default_backend() == "tpu" and not interpret

    if not exact or desc_q.dtype == jnp.bfloat16 or not on_tpu:
        # fused path (r5): prepared operands + the scalar-prefetch batched
        # kernel with n_pairs=1 (see _two_nn_fused_kernel). Covers fast
        # bf16, the Hamming bf16 expansion, and the f32 CPU/interpret path
        # (exact falls through to it off-TPU: operands are already f32).
        f32_ops = not on_tpu
        # the unused halves of each prepare_operands call are dead code
        # inside this jit and XLA eliminates them — no wasted prep work
        q3, _, qn1, _ = prepare_operands(
            desc_q[None], valid_q[None], f32_ops, fq_p, d_p
        )
        _, t3, _, tn1 = prepare_operands(
            desc_t[None], valid_t[None], f32_ops, ft_p, d_p
        )
        pair0 = jnp.zeros((1, 2), jnp.int32)
        best, second, idx = _fused_call(
            q3, t3, tn1, qn1, pair0, interpret, f32_ops
        )
        best_sq = jnp.where(valid_q, best.reshape(-1)[:fq], _BIG)
        second_sq = second.reshape(-1)[:fq]
        best_idx = jnp.clip(idx.reshape(-1)[:fq], 0, ft - 1)
        return best_idx, best_sq, second_sq

    # exact mode (TPU): 3-term bf16 split with XLA-side operand build
    q = _pad_to(_pad_to(desc_q, fq_p, 0), d_p, 1)
    t = _pad_to(_pad_to(desc_t, ft_p, 0), d_p, 1)
    qf = q.astype(jnp.float32)
    tf = t.astype(jnp.float32)
    qn = jnp.sum(qf * qf, axis=1)  # (fq_p,)
    tn = jnp.sum(tf * tf, axis=1)  # (ft_p,)
    tn = jnp.where(_pad_to(valid_t, ft_p, 0), tn, _BIG)[None, :]

    q2 = qf * -2.0
    q_hi = q2.astype(jnp.bfloat16)
    q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    t_hi = tf.astype(jnp.bfloat16)
    t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    q = jnp.concatenate([q_hi, q_lo, q_hi], axis=1)
    t = jnp.concatenate([t_hi, t_hi, t_lo], axis=1)
    d_p = 3 * d_p

    best, second, idx = _call_kernel(
        q, t, tn, fq_p, ft_p, d_p, jax.lax.Precision.DEFAULT, interpret
    )
    l1, l2, gidx = _collapse(best, second, idx)
    best_sq = jnp.where(valid_q, jnp.maximum(l1[:fq] + qn[:fq], 0.0), _BIG)
    second_sq = jnp.maximum(l2[:fq] + qn[:fq], 0.0)
    best_idx = jnp.clip(gidx[:fq], 0, ft - 1)
    return best_idx, best_sq, second_sq
