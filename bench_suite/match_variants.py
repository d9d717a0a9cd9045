"""Match-kernel variant sweep on the real TPU chip (VERDICT r3 item 1).

Measures, with the chained-dependency harness (the only honest timing
through the axon tunnel), the 8192x8192x128 2-NN kernel under different
MXU-operand and VPU-merge formulations:

  split2   -- r3 shipped kernel: [q_hi|q_lo].[t_hi|t_lo] width-2D dot.
              ADVICE r3: computes qhi.thi + qlo.tlo only (drops the
              dominant cross terms) => accuracy == plain bf16 at 2x cost.
  bf16     -- plain single-pass bf16 dot, width D (half the MXU work).
  split3   -- honest 3-term split [q_hi|q_lo|q_hi].[t_hi|t_hi|t_lo]:
              qhi.thi + qlo.thi + qhi.tlo (~1e-7 relative), width 3D.
  x merge  -- f32 vs bf16 score merge (packed VPU ops at 2x rate), and a
              min-only merge (no second/idx) to isolate merge cost.
  floor    -- the merge loop with the dot replaced by a broadcast add:
              the measured VPU-merge floor with no MXU work at all.

Writes JSON to stdout; run with no other TPU client active.
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import functools
import json
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

import os

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

F, D = 8192, 128
_BIG = 3.0e38
LANES = 128


def _chain(f, x, n):
    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1.0 + c * 1e-20))
            return jnp.ravel(r)[0].astype(jnp.float32) * 1e-20 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chain(x))
    t0 = time.perf_counter()
    float(chain(x))
    return (time.perf_counter() - t0) / n


def make_kernel(tile_q, tile_t, score_dtype, merge, cheap_s):
    sub_n = tile_t // LANES

    def kernel(q_ref, t_ref, tn_ref, best_ref, second_ref, idx_ref):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _init():
            best_ref[...] = jnp.full((tile_q, LANES), _BIG, dtype=score_dtype)
            second_ref[...] = jnp.full((tile_q, LANES), _BIG, dtype=score_dtype)
            idx_ref[...] = jnp.zeros((tile_q, LANES), dtype=jnp.int32)

        if cheap_s:
            # merge-floor mode: scores from one broadcast add, no MXU
            s = (q_ref[:, :1] + t_ref[:1, :].reshape(1, -1)[:, :tile_t]).astype(
                score_dtype
            )
        else:
            dot = jax.lax.dot_general(
                q_ref[:], t_ref[:],
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=score_dtype,
                precision=jax.lax.Precision.DEFAULT,
            )
            s = tn_ref[0, :][None, :].astype(score_dtype) + dot

        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, LANES), 1)
        best = best_ref[...]
        second = second_ref[...]
        bidx = idx_ref[...]
        for sub in range(sub_n):
            cand = s[:, sub * LANES : (sub + 1) * LANES]
            if merge == "full":
                cidx = lane + (j * tile_t + sub * LANES)
                hi = jnp.maximum(best, cand)
                second = jnp.minimum(second, hi)
                bidx = jnp.where(cand < best, cidx, bidx)
                best = jnp.minimum(best, cand)
            elif merge == "minonly":
                best = jnp.minimum(best, cand)
        best_ref[...] = best
        second_ref[...] = second
        idx_ref[...] = bidx

    return kernel


def run_variant(split, score_dtype, merge, tile_q, tile_t, cheap_s=False):
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01

    qf = jnp.asarray(dq)
    tf = jnp.asarray(dt)
    tn = jnp.sum(tf * tf, axis=1)[None, :]

    q2 = qf * -2.0
    if split == "bf16":
        q = q2.astype(jnp.bfloat16)
        t = tf.astype(jnp.bfloat16)
        d_p = D
    elif split == "split2":
        q_hi = q2.astype(jnp.bfloat16)
        q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = tf.astype(jnp.bfloat16)
        t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate([q_hi, q_lo], axis=1)
        t = jnp.concatenate([t_hi, t_lo], axis=1)
        d_p = 2 * D
    elif split == "split3":
        q_hi = q2.astype(jnp.bfloat16)
        q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = tf.astype(jnp.bfloat16)
        t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate([q_hi, q_lo, q_hi], axis=1)
        t = jnp.concatenate([t_hi, t_hi, t_lo], axis=1)
        d_p = 3 * D
    else:
        raise ValueError(split)

    sdt = jnp.bfloat16 if score_dtype == "bf16" else jnp.float32
    kern = make_kernel(tile_q, tile_t, sdt, merge, cheap_s)
    grid = (F // tile_q, F // tile_t)

    @jax.jit
    def call(qx):
        best, second, idx = pl.pallas_call(
            kern,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, d_p), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, d_p), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, LANES), sdt),
                jax.ShapeDtypeStruct((F, LANES), sdt),
                jax.ShapeDtypeStruct((F, LANES), jnp.int32),
            ],
        )(qx.astype(q.dtype), t, tn)
        return best.astype(jnp.float32)

    t_s = _chain(call, q, 30)
    return t_s


def accuracy(split):
    """Max relative dot error of the operand formulation vs f64 numpy."""
    rng = np.random.default_rng(3)
    a = np.abs(rng.normal(size=(256, D))).astype(np.float32)
    b = np.abs(rng.normal(size=(256, D))).astype(np.float32)
    exact = a.astype(np.float64) @ b.astype(np.float64).T

    af = jnp.asarray(a)
    bf = jnp.asarray(b)
    if split == "bf16":
        got = jax.lax.dot_general(
            af.astype(jnp.bfloat16), bf.astype(jnp.bfloat16),
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    else:
        a_hi = af.astype(jnp.bfloat16)
        a_lo = (af - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = bf.astype(jnp.bfloat16)
        b_lo = (bf - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        if split == "split2":
            qa = jnp.concatenate([a_hi, a_lo], axis=1)
            qb = jnp.concatenate([b_hi, b_lo], axis=1)
        else:
            qa = jnp.concatenate([a_hi, a_lo, a_hi], axis=1)
            qb = jnp.concatenate([b_hi, b_hi, b_lo], axis=1)
        got = jax.lax.dot_general(
            qa, qb, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    err = np.abs(np.asarray(got) - exact) / np.abs(exact)
    return float(err.max())


def main():
    out = {"backend": jax.default_backend()}
    for split in ("bf16", "split2", "split3"):
        out[f"acc_{split}"] = accuracy(split)

    variants = [
        # (name, split, score_dtype, merge, tile_q, tile_t, cheap)
        ("r3_split2_f32_full_2048x1024", "split2", "f32", "full", 2048, 1024, False),
        ("bf16_f32_full_2048x1024", "bf16", "f32", "full", 2048, 1024, False),
        ("bf16_bf16_full_2048x1024", "bf16", "bf16", "full", 2048, 1024, False),
        ("bf16_bf16_full_2048x2048", "bf16", "bf16", "full", 2048, 2048, False),
        ("bf16_bf16_full_1024x2048", "bf16", "bf16", "full", 1024, 2048, False),
        ("bf16_f32_minonly_2048x1024", "bf16", "f32", "minonly", 2048, 1024, False),
        ("bf16_bf16_minonly_2048x1024", "bf16", "bf16", "minonly", 2048, 1024, False),
        ("split3_f32_full_2048x1024", "split3", "f32", "full", 2048, 1024, False),
        ("split3_bf16_full_2048x1024", "split3", "bf16", "full", 2048, 1024, False),
        ("floor_f32_full_2048x1024", "bf16", "f32", "full", 2048, 1024, True),
        ("floor_bf16_full_2048x1024", "bf16", "bf16", "full", 2048, 1024, True),
        ("floor_bf16_full_2048x2048", "bf16", "bf16", "full", 2048, 2048, True),
    ]
    for name, split, sd, merge, tq, tt, cheap in variants:
        try:
            t_s = run_variant(split, sd, merge, tq, tt, cheap)
            out[name] = {"ms": round(t_s * 1e3, 4), "pairs_per_s": round(1.0 / t_s, 1)}
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
