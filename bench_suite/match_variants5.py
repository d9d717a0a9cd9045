"""Match-kernel sweep #5: final candidates, difference timing.

All variants use the proven 2D-grid + VMEM-scratch accumulator structure
(sweep #2's fastest compilable shape). Measures:
  bf16 width-D full merge      -- the accuracy-honest default candidate
  bf16 minonly                 -- isolates the merge cost (measured merge
                                  floor = full - minonly)
  bf16 tile_t 2048             -- fewer grid steps
  split3 full                  -- the exact (~3e-6) mode's price
  ham256 full                  -- ORB Hamming headline (bf16 +-1, D=256)
  mergefloor                   -- full merge with the dot replaced by one
                                  broadcast add: VPU-merge floor, no MXU
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


def merge_step(best, second, bidx, cand, cidx):
    hi = jnp.maximum(best, cand)
    second = jnp.minimum(second, hi)
    bidx = jnp.where(cand < best, cidx, bidx)
    best = jnp.minimum(best, cand)
    return best, second, bidx


def build(split="bf16", merge="full", tile_q=2048, tile_t=1024, ham=False,
          cheap=False):
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01

    if ham:
        qb = np.sign(dq)
        tb = np.sign(dt)
        qf = jnp.asarray(np.concatenate([qb, qb], axis=1))
        tf = jnp.asarray(np.concatenate([tb, tb], axis=1))
        d0 = 2 * D
    else:
        qf = jnp.asarray(dq)
        tf = jnp.asarray(dt)
        d0 = D
    tn = jnp.sum(tf * tf, axis=1)[None, :]
    q2 = qf * -2.0
    if split == "bf16":
        q = q2.astype(jnp.bfloat16)
        t = tf.astype(jnp.bfloat16)
        d_p = d0
    else:  # split3
        q_hi = q2.astype(jnp.bfloat16)
        q_lo = (q2 - q_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        t_hi = tf.astype(jnp.bfloat16)
        t_lo = (tf - t_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        q = jnp.concatenate([q_hi, q_lo, q_hi], axis=1)
        t = jnp.concatenate([t_hi, t_hi, t_lo], axis=1)
        d_p = 3 * d0
    sub_n = tile_t // LANES

    def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out, b_s, s_s, i_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_s[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
            s_s[...] = jnp.full((tile_q, LANES), _BIG, jnp.float32)
            i_s[...] = jnp.zeros((tile_q, LANES), jnp.int32)

        if cheap:
            s = q_ref[:, :1].astype(jnp.float32) + tn_ref[0, :][None, :]
        else:
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
            if merge == "full":
                best, second, bidx = merge_step(best, second, bidx, cand, cidx)
            else:
                best = jnp.minimum(best, cand)
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
        )(qx.astype(q.dtype), t, tn)
        return outs[0]

    return lambda: diff_time(call, q)


def main():
    out = {"backend": jax.default_backend()}
    jobs = [
        ("bf16_full", build("bf16", "full")),
        ("bf16_minonly", build("bf16", "minonly")),
        ("bf16_full_tt2048", build("bf16", "full", tile_t=2048)),
        ("split3_full", build("split3", "full")),
        ("ham256_full", build("bf16", "full", ham=True)),
        ("mergefloor", build("bf16", "full", cheap=True)),
    ]
    for name, fn in jobs:
        try:
            t_s = fn()
            out[name] = {"ms": round(t_s * 1e3, 4), "pairs_per_s": round(1.0 / t_s, 1)}
        except Exception as e:
            out[name] = {"error": str(e)[:160]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
