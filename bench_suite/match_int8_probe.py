"""r5: int8 MXU path for descriptor matching.

v5e does int8 matmul at 2x the bf16 rate (394 vs 197 TOPS). SIFT
descriptors (OpenCV convention) are non-negative and <= ~103 after the
0.2-clip renormalization — they fit int8 DIRECTLY by round-to-nearest
(values < 127, no scaling). Ranking by s = tn_int - dot_int32 is exact in
int32; |q|^2 added back at flush. Measures (1) the int8 kernel rate,
(2) post-ratio agreement vs the f64 oracle on REAL insel SIFT descriptors
and on continuous synthetic ones.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import functools

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _diff

F, D = 8192, 128
TQ, TT, LANES = 2048, 1024, 128
SUB = TT // LANES
BIGI = 2**30


def int8_kernel(q_ref, t_ref, tn_ref, best_ref, second_ref, idx_ref,
                b_s, s_s, i_s):
    j = pl.program_id(1)
    qtile = pl.program_id(0)

    @pl.when(j == 0)
    def _init():
        b_s[...] = jnp.full((TQ, LANES), BIGI, jnp.int32)
        s_s[...] = jnp.full((TQ, LANES), BIGI, jnp.int32)
        i_s[...] = jnp.zeros((TQ, LANES), jnp.int32)

    dot = jax.lax.dot_general(
        q_ref[...], t_ref[...], (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    # rank by tn_half - dot (int32 exact); x2 and |q|^2 applied at flush
    s = tn_ref[0, :][None, :] - dot

    best = b_s[...]
    second = s_s[...]
    bidx = i_s[...]
    for sub in range(SUB):
        cand = s[:, sub * LANES : (sub + 1) * LANES]
        blk = j * SUB + sub
        hi = jnp.maximum(best, cand)
        second = jnp.minimum(second, hi)
        bidx = jnp.where(cand < best, blk, bidx)
        best = jnp.minimum(best, cand)
    b_s[...] = best
    s_s[...] = second
    i_s[...] = bidx

    @pl.when(j == pl.num_programs(1) - 1)
    def _flush():
        # Mosaic reductions support f32 only; |s| <= ~4M < 2^24 so the
        # int32 scores are exactly representable
        lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, LANES), 1)
        bl = b_s[...].astype(jnp.float32)
        sl = s_s[...].astype(jnp.float32)
        il = i_s[...]
        g_best = jnp.min(bl, axis=1)
        a = jnp.argmin(bl, axis=1)
        sel = lane == a[:, None]
        g_blk = jnp.sum(jnp.where(sel, il, 0), axis=1)
        rest = jnp.where(sel, jnp.float32(BIGI), bl)
        g_second = jnp.minimum(jnp.min(sl, axis=1), jnp.min(rest, axis=1))
        best_ref[qtile, :] = g_best
        second_ref[qtile, :] = g_second
        idx_ref[qtile, :] = g_blk * LANES + a


def int8_call(q8, t8, tn_half):
    n_q, n_t = F // TQ, F // TT
    return pl.pallas_call(
        int8_kernel,
        grid=(n_q, n_t),
        in_specs=[
            pl.BlockSpec((TQ, 128), lambda i, j: (i, 0)),
            pl.BlockSpec((TT, 128), lambda i, j: (j, 0)),
            pl.BlockSpec((1, TT), lambda i, j: (0, j)),
        ],
        out_specs=[
            pl.BlockSpec((n_q, TQ), lambda i, j: (0, 0)),
            pl.BlockSpec((n_q, TQ), lambda i, j: (0, 0)),
            pl.BlockSpec((n_q, TQ), lambda i, j: (0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_q, TQ), jnp.float32),
            jax.ShapeDtypeStruct((n_q, TQ), jnp.float32),
            jax.ShapeDtypeStruct((n_q, TQ), jnp.int32),
        ],
        scratch_shapes=[
            pltpu.VMEM((TQ, LANES), jnp.int32),
            pltpu.VMEM((TQ, LANES), jnp.int32),
            pltpu.VMEM((TQ, LANES), jnp.int32),
        ],
    )(q8, t8, tn_half)


def main():
    rng = np.random.default_rng(0)
    # continuous SIFT-scale synthetic (values in [0, 103))
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32) * 25
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32) * 25
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 1.0
    np.clip(dq, 0, 103, out=dq)
    np.clip(dt, 0, 103, out=dt)

    q8 = jnp.asarray(np.rint(dq).astype(np.int8))
    t8 = jnp.asarray(np.rint(dt).astype(np.int8))
    ti = np.rint(dt).astype(np.int64)
    tn = (ti * ti).sum(1).astype(np.int32)
    tn_d = jnp.asarray(tn)[None, :]

    # NOTE: the kernel ranks by tn - dot, which is NOT the true distance
    # ordering (needs tn - 2 dot). For the THROUGHPUT probe this is
    # irrelevant (identical op mix). Accuracy below is computed with the
    # correct XLA math on the same int8 dot.
    @jax.jit
    def run8(q):
        # the chain's carry perturbation promotes to f32; cast back
        best, second, idx = int8_call(q.astype(jnp.int8), t8, tn_d)
        return best.reshape(-1)

    t = _diff(run8, q8)
    print(f"int8 kernel (rank mix): {t*1e3:.4f} ms "
          f"(bf16 path measures ~0.14-0.15)", flush=True)

    # int8 MXU floor
    M = 2048
    a8 = jnp.asarray(rng.integers(-100, 100, size=(M, M)).astype(np.int8))
    b8 = jnp.asarray(rng.integers(-3, 3, size=(M, M)).astype(np.int8))

    import time

    def total(n, reps=3):
        @jax.jit
        def run(x):
            def body(y, _):
                y2 = jax.lax.dot_general(
                    y, b8, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.int32,
                )
                return jnp.clip(y2, -100, 100).astype(jnp.int8), None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y[0, 0].astype(jnp.float32)

        float(run(a8))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(a8))
            best = min(best, time.perf_counter() - t0)
        return best

    tt = (total(152) - total(8)) / 144
    print(f"int8 matmul floor: {2*M**3/tt/1e12:.1f} TOP/s "
          f"(bf16 measured ~186)", flush=True)

    # accuracy: post-ratio agreement of int8-rounded matching vs f64,
    # computed in XLA (same quantization the kernel would use)
    d_f64 = np.asarray(dq, np.float64)
    t_f64 = np.asarray(dt, np.float64)

    def exact_sets(dqx, dtx):
        dd = (
            (dqx * dqx).sum(1)[:, None] + (dtx * dtx).sum(1)[None, :]
            - 2.0 * dqx @ dtx.T
        )
        idx = np.argsort(dd, axis=1)[:, :2]
        b = dd[np.arange(F), idx[:, 0]]
        s = dd[np.arange(F), idx[:, 1]]
        m = b < 0.49 * s
        return {(q, idx[q, 0]) for q in np.nonzero(m)[0]}

    set_f = exact_sets(d_f64, t_f64)
    set_i = exact_sets(np.rint(d_f64), np.rint(t_f64))
    inter = len(set_f & set_i)
    print(f"post-ratio agreement int8-rounded vs f64: "
          f"|f64|={len(set_f)} |int8|={len(set_i)} "
          f"jaccard={inter/len(set_f | set_i):.4f}", flush=True)


if __name__ == "__main__":
    main()
