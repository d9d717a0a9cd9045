"""Match-kernel structural sweep #2: where do the 33 us/grid-step go?

Sweep #1 showed merge ops and MXU width are NOT the wall (min-only merge ==
full merge == 1.09 ms; half-width bf16 saves only 2%). Hypotheses tested
here:
  noop     -- same grid/specs, body only initializes: pure grid+DMA floor.
  sanity   -- bf16 dot + full merge, 2D grid (repro of sweep #1).
  scratch  -- accumulators in VMEM scratch (not revisited out blocks),
              outputs written once at the last j step.
  jloop    -- 1D grid over query tiles; the WHOLE target matrix lives in
              VMEM; j loop inside the kernel (no per-j grid steps at all).
  colblk   -- 1D grid; inner loop does (TQ,D)@(D,128) dots per column block
              and merges immediately (no (TQ,TT) score tile).
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import functools
import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

F, D = 8192, 128
_BIG = 3.0e38
LANES = 128


def _chain(f, x, n=30):
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


def _operands():
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01
    qf = jnp.asarray(dq)
    tf = jnp.asarray(dt)
    tn = jnp.sum(tf * tf, axis=1)[None, :]
    q = (qf * -2.0).astype(jnp.bfloat16)
    t = tf.astype(jnp.bfloat16)
    return q, t, tn


def merge_step(best, second, bidx, cand, cidx):
    hi = jnp.maximum(best, cand)
    second = jnp.minimum(second, hi)
    bidx = jnp.where(cand < best, cidx, bidx)
    best = jnp.minimum(best, cand)
    return best, second, bidx


# ------------------------------------------------------------- 2D variants
def two_d_variant(kind, tile_q=2048, tile_t=1024):
    q, t, tn = _operands()
    sub_n = tile_t // LANES

    if kind == "scratch":
        def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out, b_s, s_s, i_s):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                b_s[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
                s_s[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
                i_s[...] = jnp.zeros((tile_q, LANES), jnp.int32)

            dot = jax.lax.dot_general(
                q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            s = tn_ref[0, :][None, :] + dot
            lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, LANES), 1)
            best, second, bidx = b_s[...], s_s[...], i_s[...]
            for sub in range(sub_n):
                cand = s[:, sub * LANES : (sub + 1) * LANES]
                cidx = lane + (j * tile_t + sub * LANES)
                best, second, bidx = merge_step(best, second, bidx, cand, cidx)
            b_s[...] = best
            s_s[...] = second
            i_s[...] = bidx

            @pl.when(j == pl.num_programs(1) - 1)
            def _():
                b_out[...] = b_s[...]
                s_out[...] = s_s[...]
                i_out[...] = i_s[...]

        scratch = [
            pltpu.VMEM((tile_q, LANES), jnp.float32),
            pltpu.VMEM((tile_q, LANES), jnp.float32),
            pltpu.VMEM((tile_q, LANES), jnp.int32),
        ]
    else:  # noop / sanity
        def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out):
            j = pl.program_id(1)

            @pl.when(j == 0)
            def _():
                b_out[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
                s_out[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
                i_out[...] = jnp.zeros((tile_q, LANES), jnp.int32)

            if kind == "sanity":
                dot = jax.lax.dot_general(
                    q_ref[:], t_ref[:], (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = tn_ref[0, :][None, :] + dot
                lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, LANES), 1)
                best, second, bidx = b_out[...], s_out[...], i_out[...]
                for sub in range(sub_n):
                    cand = s[:, sub * LANES : (sub + 1) * LANES]
                    cidx = lane + (j * tile_t + sub * LANES)
                    best, second, bidx = merge_step(best, second, bidx, cand, cidx)
                b_out[...] = best
                s_out[...] = second
                i_out[...] = bidx

        scratch = []

    grid = (F // tile_q, F // tile_t)

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_t, D), lambda i, j: (j, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_t), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.int32),
            ],
            scratch_shapes=scratch,
        )(qx.astype(jnp.bfloat16), t, tn)
        return outs[0]

    return _chain(call, q)


# ------------------------------------------------------------- 1D variants
def one_d_variant(kind, tile_q=2048, tile_t=1024):
    """1D grid over query tiles; full t in VMEM; inner j loop."""
    q, t, tn = _operands()
    sub_n = tile_t // LANES
    n_j = F // tile_t

    def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out):
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, LANES), 1)
        best = jnp.full((tile_q, LANES), _BIG, jnp.float32)
        second = jnp.full((tile_q, LANES), _BIG, jnp.float32)
        bidx = jnp.zeros((tile_q, LANES), jnp.int32)
        qv = q_ref[:]
        if kind == "jloop":
            for j in range(n_j):
                dot = jax.lax.dot_general(
                    qv, t_ref[pl.ds(j * tile_t, tile_t), :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                s = tn_ref[0, pl.ds(j * tile_t, tile_t)][None, :] + dot
                for sub in range(sub_n):
                    cand = s[:, sub * LANES : (sub + 1) * LANES]
                    cidx = lane + (j * tile_t + sub * LANES)
                    best, second, bidx = merge_step(best, second, bidx, cand, cidx)
        else:  # colblk: per-128-column dot + immediate merge
            for c in range(F // LANES):
                dot = jax.lax.dot_general(
                    qv, t_ref[pl.ds(c * LANES, LANES), :],
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                cand = tn_ref[0, pl.ds(c * LANES, LANES)][None, :] + dot
                cidx = lane + c * LANES
                best, second, bidx = merge_step(best, second, bidx, cand, cidx)
        b_out[...] = best
        s_out[...] = second
        i_out[...] = bidx

    grid = (F // tile_q,)

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec((tile_q, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((tile_q, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((tile_q, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.int32),
            ],
        )(qx.astype(jnp.bfloat16), t, tn)
        return outs[0]

    return _chain(call, q)


def main():
    out = {"backend": jax.default_backend()}
    jobs = [
        ("noop_2048x1024", lambda: two_d_variant("noop")),
        ("sanity_2048x1024", lambda: two_d_variant("sanity")),
        ("scratch_2048x1024", lambda: two_d_variant("scratch")),
        ("jloop_2048", lambda: one_d_variant("jloop", 2048)),
        ("jloop_4096", lambda: one_d_variant("jloop", 4096)),
        ("jloop_8192", lambda: one_d_variant("jloop", 8192)),
        ("colblk_2048", lambda: one_d_variant("colblk", 2048)),
        ("colblk_4096", lambda: one_d_variant("colblk", 4096)),
    ]
    for name, fn in jobs:
        try:
            t_s = fn()
            out[name] = {"ms": round(t_s * 1e3, 4), "pairs_per_s": round(1.0 / t_s, 1)}
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
