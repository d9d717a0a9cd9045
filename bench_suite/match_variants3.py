"""Match-kernel sweep #3: is the ~1 ms a fixed per-pallas_call overhead?

Sweep #2 showed a NOOP kernel with the same grid/specs costs 0.98 ms — the
compute is nearly free. Hypotheses:
  tiny_pallas  -- minimal pallas call (grid (1,), one (8,128) block):
                  the per-call floor through this runtime.
  tiny_jnp     -- a trivial jnp op under the same chain: scan overhead.
  batchN       -- the REAL fix candidate: N pairs in ONE pallas call
                  (grid (N, i, j)); reports ms per pair.
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
TILE_Q, TILE_T = 2048, 1024


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


def tiny_pallas():
    def kernel(x_ref, o_ref):
        o_ref[...] = x_ref[...] + 1.0

    x = jnp.zeros((8, 128), jnp.float32)

    @jax.jit
    def call(xx):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xx)

    return _chain(call, x)


def tiny_jnp():
    x = jnp.zeros((8, 128), jnp.float32)
    return _chain(lambda xx: xx + 1.0, x)


def merge_step(best, second, bidx, cand, cidx):
    hi = jnp.maximum(best, cand)
    second = jnp.minimum(second, hi)
    bidx = jnp.where(cand < best, cidx, bidx)
    best = jnp.minimum(best, cand)
    return best, second, bidx


def batched(n_pairs):
    """N pairs in one call: grid (N, F/TILE_Q, F/TILE_T), bf16 width-D."""
    rng = np.random.default_rng(0)
    sub_n = TILE_T // LANES

    dq = np.abs(rng.normal(size=(n_pairs, F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(n_pairs, F, D))).astype(np.float32)
    q = jnp.asarray(dq * -2.0).astype(jnp.bfloat16)
    t = jnp.asarray(dt).astype(jnp.bfloat16)
    tn = jnp.sum(jnp.asarray(dt) ** 2, axis=2)[:, None, :]  # (N, 1, F)

    def kernel(q_ref, t_ref, tn_ref, b_out, s_out, i_out, b_s, s_s, i_s):
        j = pl.program_id(2)

        @pl.when(j == 0)
        def _():
            b_s[...] = jnp.full((TILE_Q, LANES), _BIG, jnp.float32)
            s_s[...] = jnp.full((TILE_Q, LANES), _BIG, jnp.float32)
            i_s[...] = jnp.zeros((TILE_Q, LANES), jnp.int32)

        dot = jax.lax.dot_general(
            q_ref[0], t_ref[0], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s = tn_ref[0, 0, :][None, :] + dot
        lane = jax.lax.broadcasted_iota(jnp.int32, (TILE_Q, LANES), 1)
        best, second, bidx = b_s[...], s_s[...], i_s[...]
        for sub in range(sub_n):
            cand = s[:, sub * LANES : (sub + 1) * LANES]
            cidx = lane + (j * TILE_T + sub * LANES)
            best, second, bidx = merge_step(best, second, bidx, cand, cidx)
        b_s[...] = best
        s_s[...] = second
        i_s[...] = bidx

        @pl.when(j == pl.num_programs(2) - 1)
        def _():
            b_out[...] = b_s[...][None]
            s_out[...] = s_s[...][None]
            i_out[...] = i_s[...][None]

    grid = (n_pairs, F // TILE_Q, F // TILE_T)

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=grid,
            in_specs=[
                pl.BlockSpec(
                    (1, TILE_Q, D), lambda b, i, j: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_T, D), lambda b, i, j: (b, j, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, TILE_T), lambda b, i, j: (b, 0, j),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=[
                pl.BlockSpec(
                    (1, TILE_Q, LANES), lambda b, i, j: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_Q, LANES), lambda b, i, j: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, TILE_Q, LANES), lambda b, i, j: (b, i, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_pairs, F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_pairs, F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((n_pairs, F, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TILE_Q, LANES), jnp.float32),
                pltpu.VMEM((TILE_Q, LANES), jnp.float32),
                pltpu.VMEM((TILE_Q, LANES), jnp.int32),
            ],
        )(qx.astype(jnp.bfloat16), t, tn)
        return outs[0]

    t_s = _chain(call, q, n=10)
    return t_s / n_pairs


def main():
    out = {"backend": jax.default_backend()}
    jobs = [
        ("tiny_jnp", tiny_jnp),
        ("tiny_pallas", tiny_pallas),
        ("batch1", lambda: batched(1)),
        ("batch4", lambda: batched(4)),
        ("batch8", lambda: batched(8)),
        ("batch16", lambda: batched(16)),
    ]
    for name, fn in jobs:
        try:
            t_s = fn()
            out[name] = {
                "ms_per_unit": round(t_s * 1e3, 4),
                "units_per_s": round(1.0 / t_s, 1),
            }
        except Exception as e:
            out[name] = {"error": str(e)[:300]}
        print(name, out[name], flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
