"""Match-kernel sweep #4: DIFFERENCE timing (slope between two chain
lengths), which cancels the ~25 ms fixed dispatch+fetch cost of the axon
tunnel that sweep #3 exposed (a trivial x+1 'cost' 0.92 ms/iter at n=30).

t_iter = (T(n2) - T(n1)) / (n2 - n1), all work on-device and chained.

Re-measures the serious kernel candidates and the hardware floors.
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


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


def _chain_n(f, x, n):
    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1.0 + c * 1e-20))
            return jnp.ravel(r)[0].astype(jnp.float32) * 1e-20 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chain(x))
    best = np.inf
    for _ in range(3):
        t0 = time.perf_counter()
        float(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best


def diff_time(f, x, n1=8, n2=48):
    t1 = _chain_n(f, x, n1)
    t2 = _chain_n(f, x, n2)
    return (t2 - t1) / (n2 - n1)


def _operands():
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01
    return dq, dt


def merge_step(best, second, bidx, cand, cidx):
    hi = jnp.maximum(best, cand)
    second = jnp.minimum(second, hi)
    bidx = jnp.where(cand < best, cidx, bidx)
    best = jnp.minimum(best, cand)
    return best, second, bidx


def r3_shipped():
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    dq, dt = _operands()
    q = jnp.asarray(dq)
    t = jnp.asarray(dt)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)
    return diff_time(lambda x: two_nn_pallas(x, t, vq, vt)[1], q)


def colblk(split, merge, tile_q=2048):
    """1D grid over query tiles, full t resident in VMEM, per-128-col dots."""
    dq, dt = _operands()
    qf = jnp.asarray(dq)
    tf = jnp.asarray(dt)
    tn = jnp.sum(tf * tf, axis=1)[None, :]
    q2 = qf * -2.0
    if split == "bf16":
        q = q2.astype(jnp.bfloat16)
        t = tf.astype(jnp.bfloat16)
        d_p = D
    else:  # split3
        q_hi = q2.astype(jnp.bfloat16)
        q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = tf.astype(jnp.bfloat16)
        t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate([q_hi, q_lo, q_hi], axis=1)
        t = jnp.concatenate([t_hi, t_hi, t_lo], axis=1)
        d_p = 3 * D

    def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out):
        lane = jax.lax.broadcasted_iota(jnp.int32, (tile_q, LANES), 1)
        best = jnp.full((tile_q, LANES), _BIG, jnp.float32)
        second = jnp.full((tile_q, LANES), _BIG, jnp.float32)
        bidx = jnp.zeros((tile_q, LANES), jnp.int32)
        qv = q_ref[:]
        for c in range(F // LANES):
            dot = jax.lax.dot_general(
                qv, t_ref[pl.ds(c * LANES, LANES), :],
                (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            cand = tn_ref[0, pl.ds(c * LANES, LANES)][None, :] + dot
            if merge == "full":
                best, second, bidx = merge_step(
                    best, second, bidx, cand, lane + c * LANES
                )
            else:
                best = jnp.minimum(best, cand)
        b_out[...] = best
        s_out[...] = second
        i_out[...] = bidx

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=(F // tile_q,),
            in_specs=[
                pl.BlockSpec((tile_q, d_p), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((F, d_p), lambda i: (0, 0), memory_space=pltpu.VMEM),
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
        )(qx.astype(q.dtype), t, tn)
        return outs[0]

    return diff_time(call, q)


def scratch2d(split="bf16", tile_q=2048, tile_t=1024):
    dq, dt = _operands()
    qf = jnp.asarray(dq)
    tf = jnp.asarray(dt)
    tn = jnp.sum(tf * tf, axis=1)[None, :]
    q = (qf * -2.0).astype(jnp.bfloat16)
    t = tf.astype(jnp.bfloat16)
    d_p = D
    sub_n = tile_t // LANES

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

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=(F // tile_q, F // tile_t),
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
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((tile_q, LANES), jnp.float32),
                pltpu.VMEM((tile_q, LANES), jnp.float32),
                pltpu.VMEM((tile_q, LANES), jnp.int32),
            ],
        )(qx.astype(jnp.bfloat16), t, tn)
        return outs[0]

    return diff_time(call, q)


def floors():
    rng = np.random.default_rng(1)
    M = 4096
    a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t = diff_time(mm, a)
    mxu = 2 * M * M * M / t

    x = jnp.asarray(rng.normal(size=(1024, 2048)).astype(np.float32))

    def vop(v):
        for _ in range(32):
            v = jnp.minimum(jnp.maximum(v * 1.000001, 0.25 * v), 3e38)
        return v

    t = diff_time(vop, x)
    vpu = 96 * x.size / t

    y = jnp.asarray(rng.normal(size=(64, 1024, 1024)).astype(np.float32))
    t = diff_time(lambda v: v + 1.0, y)
    hbm = 2 * y.size * 4 / t
    return mxu, vpu, hbm


def main():
    out = {"backend": jax.default_backend()}
    mxu, vpu, hbm = floors()
    out["floors"] = {
        "mxu_tflops": round(mxu / 1e12, 1),
        "vpu_tops": round(vpu / 1e12, 2),
        "hbm_gbs": round(hbm / 1e9, 1),
    }
    print("floors", out["floors"], flush=True)

    jobs = [
        ("r3_shipped_split2", r3_shipped),
        ("colblk_bf16_full", lambda: colblk("bf16", "full")),
        ("colblk_bf16_full_tq4096", lambda: colblk("bf16", "full", 4096)),
        ("colblk_bf16_minonly", lambda: colblk("bf16", "minonly")),
        ("colblk_split3_full", lambda: colblk("split3", "full")),
        ("scratch2d_bf16_full", scratch2d),
    ]
    for name, fn in jobs:
        try:
            t_s = fn()
            mxu_t = 2 * F * F * D / mxu  # useful-work floor (width D)
            out[name] = {
                "ms": round(t_s * 1e3, 4),
                "pairs_per_s": round(1.0 / t_s, 1),
                "pct_sol_useful": round(mxu_t / t_s * 100.0, 1),
            }
        except Exception as e:
            out[name] = {"error": str(e)[:200]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
