"""r5 probe 2: locate the wrapped-call residual with in-session references.

Same-session measurements (difference timing):
  0. MXU floor (4096^3 bf16 matmul) -> normalizes session clock state
  1. bare fused kernel (operands pre-padded, tn precomputed)
  2. wrapped fused call (two_nn_pallas fast path)
  3. r4-style path: XLA-side prep + old _call_kernel + XLA epilogue
  4. batched fused production path
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from bench import _diff
from sfm_mvs_pipeline_tpu.ops.matching import ratio_test_mask, match_pairs_batch
from sfm_mvs_pipeline_tpu.ops.pallas import match_kernel as MK

F, D = 8192, 128


def main():
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01
    dq_d = jnp.asarray(dq)
    dt_d = jnp.asarray(dt)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)

    # 0. MXU floor
    M = 4096
    a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(jnp.bfloat16)

    t = _diff(mm, a, n1=8, n2=72)
    tf_s = 2 * M**3 / t / 1e12
    floor_ms = 2 * F * F * D / (tf_s * 1e12) * 1e3
    print(f"0. mxu: {tf_s:.1f} TF/s -> match MXU floor {floor_ms:.4f} ms", flush=True)

    # 1. bare fused kernel
    q3 = dq_d[None]
    t3 = dt_d[None]
    tn1 = jnp.sum(dt_d * dt_d, axis=1)[None, None]
    pair0 = jnp.zeros((1, 2), jnp.int32)

    @jax.jit
    def bare(q):
        best, second, idx = MK._fused_call(q, t3, tn1, pair0, False, False)
        return best

    t1 = _diff(bare, q3)
    print(f"1. bare fused kernel: {t1*1e3:.4f} ms", flush=True)

    # 2. wrapped fused
    def wrapped(q):
        idx, best, second = MK.two_nn_pallas(q, dt_d, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    t2 = _diff(wrapped, dq_d)
    print(f"2. wrapped fused: {t2*1e3:.4f} ms", flush=True)

    # 3. r4-style: XLA prep + old kernel + epilogue
    def r4_style(q):
        qf = q.astype(jnp.float32)
        tf32 = dt_d.astype(jnp.float32)
        qn = jnp.sum(qf * qf, axis=1)
        tn = jnp.sum(tf32 * tf32, axis=1)
        tn = jnp.where(vt, tn, MK._BIG)[None, :]
        qb = (qf * -2.0).astype(jnp.bfloat16)
        tb = tf32.astype(jnp.bfloat16)
        best, second, idx = MK._call_kernel(
            qb, tb, tn, F, F, D, jax.lax.Precision.DEFAULT, False
        )
        l1, l2, gidx = MK._collapse(best, second, idx)
        best_sq = jnp.where(vq, jnp.maximum(l1 + qn, 0.0), MK._BIG)
        second_sq = jnp.maximum(l2 + qn, 0.0)
        return best_sq * ratio_test_mask(best_sq, second_sq, vq)

    t3_ = _diff(r4_style, dq_d)
    print(f"3. r4-style wrapped: {t3_*1e3:.4f} ms", flush=True)

    # 4. batched fused
    S = 8
    descs = jnp.stack([dq_d] + [dt_d + 0.01 * i for i in range(S - 1)])
    valid = jnp.ones((S, F), bool)
    pairs = jnp.asarray(
        [(a_, b_) for a_ in range(S) for b_ in range(a_ + 1, S)], jnp.int32
    )[:16]

    def batch(d):
        bi, mask = match_pairs_batch(d, valid, pairs)
        return mask.astype(jnp.float32)

    t4 = _diff(batch, descs, n1=4, n2=24) / len(pairs)
    print(f"4. batched fused: {t4*1e3:.4f} ms/pair = {1/t4:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
