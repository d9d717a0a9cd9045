"""r5: strict A/B of the old 2D-grid kernel vs the new scalar-prefetch
batched kernel on IDENTICAL prepared bf16 operands, interleaved x3."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import _diff
from sfm_mvs_pipeline_tpu.ops.pallas import match_kernel as MK

F, D = 8192, 128


def main():
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    qb = jnp.asarray(dq * -2.0).astype(jnp.bfloat16)
    tb = jnp.asarray(dt).astype(jnp.bfloat16)
    tn = jnp.sum(jnp.asarray(dt) ** 2, axis=1)
    qn = jnp.sum(jnp.asarray(dq) ** 2, axis=1)

    tn2 = tn[None, :]
    t3 = tb[None]
    tn3 = tn[None, None]
    qn3 = qn[None, None]
    pair0 = jnp.zeros((1, 2), jnp.int32)

    @jax.jit
    def old(q):
        q = q.astype(jnp.bfloat16)
        best, second, idx = MK._call_kernel(
            q, tb, tn2, F, F, D, jax.lax.Precision.DEFAULT, False
        )
        return best.reshape(-1)

    @jax.jit
    def new(q):
        q = q.astype(jnp.bfloat16)
        best, second, idx = MK._fused_call(
            q[None], t3, tn3, qn3, pair0, False, False
        )
        return best.reshape(-1)

    # experimental: cross-step double-buffered score scratch — the dot of
    # step j and the merge of step j-1's scores are INDEPENDENT, giving the
    # scheduler real MXU/VPU overlap (one big dot + immediate merge
    # serializes: ~0.092 + ~0.06 back-to-back)
    import functools
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TQ, TT, LANES = 1024, 512, 128
    SUB = TT // LANES
    BIG = MK._BIG

    def db_kernel(q_ref, t_ref, tn_ref, best_ref, second_ref, idx_ref,
                  b_s, s_s, i_s, sc0, sc1):
        j = pl.program_id(1)
        qtile = pl.program_id(0)
        n_t = pl.num_programs(1) - 1

        @pl.when(j == 0)
        def _init():
            b_s[...] = jnp.full((TQ, LANES), BIG, jnp.float32)
            s_s[...] = jnp.full((TQ, LANES), BIG, jnp.float32)
            i_s[...] = jnp.zeros((TQ, LANES), jnp.int32)

        even = jax.lax.rem(j, 2) == 0

        # the dot runs unconditionally (Mosaic rejects matmuls inside
        # cond regions: "Bad lhs type"); at j == n_t it recomputes the
        # clamped last block whose write is skipped — ~6% extra MXU
        dot = jax.lax.dot_general(
            q_ref[...], t_ref[...], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        )
        s = tn_ref[0, :][None, :] + dot

        @pl.when((j < n_t) & even)
        def _w0():
            sc0[...] = s

        @pl.when((j < n_t) & ~even)
        def _w1():
            sc1[...] = s

        def merge_from(scr):
            best = b_s[...]
            second = s_s[...]
            bidx = i_s[...]
            prev = scr[...]
            for sub in range(SUB):
                cand = prev[:, sub * LANES : (sub + 1) * LANES]
                blk = (j - 1) * SUB + sub
                hi = jnp.maximum(best, cand)
                second = jnp.minimum(second, hi)
                bidx = jnp.where(cand < best, blk, bidx)
                best = jnp.minimum(best, cand)
            b_s[...] = best
            s_s[...] = second
            i_s[...] = bidx

        # split branches: merging "the other" scratch via a traced select
        # reads BOTH buffers; these read one each
        @pl.when((j > 0) & ~even)
        def _merge0():
            merge_from(sc0)

        @pl.when((j > 0) & even)
        def _merge1():
            merge_from(sc1)

        @pl.when(j == n_t)
        def _flush():
            lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, LANES), 1)
            bl = b_s[...]
            sl = s_s[...]
            il = i_s[...]
            g_best = jnp.min(bl, axis=1)
            a = jnp.argmin(bl, axis=1)
            sel = lane == a[:, None]
            g_blk = jnp.sum(jnp.where(sel, il, 0), axis=1)
            rest = jnp.where(sel, BIG, bl)
            g_second = jnp.minimum(jnp.min(sl, axis=1), jnp.min(rest, axis=1))
            best_ref[qtile, :] = g_best
            second_ref[qtile, :] = g_second
            idx_ref[qtile, :] = g_blk * LANES + a

    n_q, n_t = F // TQ, F // TT

    def db_call(q, t, tn):
        return pl.pallas_call(
            db_kernel,
            grid=(n_q, n_t + 1),
            in_specs=[
                pl.BlockSpec((TQ, 128), lambda i, j: (i, 0)),
                pl.BlockSpec(
                    (TT, 128), lambda i, j: (jnp.minimum(j, n_t - 1), 0)
                ),
                pl.BlockSpec(
                    (1, TT), lambda i, j: (0, jnp.minimum(j, n_t - 1))
                ),
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
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, LANES), jnp.int32),
                pltpu.VMEM((TQ, TT), jnp.float32),
                pltpu.VMEM((TQ, TT), jnp.float32),
            ],
        )(q, t, tn)

    @jax.jit
    def db(q):
        q = q.astype(jnp.bfloat16)
        best, second, idx = db_call(q, tb, tn2)
        return best.reshape(-1)

    # correctness of db vs old
    o_b = np.asarray(old(qb))
    d_b = np.asarray(db(qb))
    print("db matches old best:", np.allclose(o_b, d_b), flush=True)

    res = {"old": [], "new": [], "db": []}
    for i in range(3):
        res["old"].append(_diff(old, qb))
        res["new"].append(_diff(new, qb))
        res["db"].append(_diff(db, qb))
        print(f"round {i}: " + " ".join(
            f"{k}={res[k][-1]*1e3:.4f}ms" for k in res), flush=True)
    for k, v in res.items():
        print(f"{k}: median {np.median(v)*1e3:.4f} spread "
              f"{min(v)*1e3:.4f}-{max(v)*1e3:.4f}", flush=True)


if __name__ == "__main__":
    main()
