"""r5 probe: fused match kernel (in-kernel prep) vs the r4 wrapped call.

Measures, with difference timing (bench.py methodology):
  1. wrapped single-pair call (two_nn_pallas fast path, now fused)
  2. production batched path (two_nn_batch_fused, 16 pairs / dispatch)
  3. Hamming D=256 path
Targets: wrapped call <= 0.120 ms (>= 80% of the 0.096 ms MXU floor).
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

from bench import _chain_total, _diff
from sfm_mvs_pipeline_tpu.ops.matching import ratio_test_mask, match_pairs_batch
from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

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

    def one(q):
        idx, best, second = two_nn_pallas(q, dt_d, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    t0 = time.perf_counter()
    ests = [_diff(one, dq_d) for _ in range(3)]
    print(f"wrapped fused: {[round(e*1e3,4) for e in ests]} ms "
          f"(median {np.median(ests)*1e3:.4f}) "
          f"[warm+meas {time.perf_counter()-t0:.0f}s]", flush=True)

    # correctness spot-check vs jnp oracle on integer-valued (SIFT-like) data
    di = rng.integers(0, 128, size=(F, D)).astype(np.float32)
    ti = rng.integers(0, 128, size=(F, D)).astype(np.float32)
    ti[: F // 3] = di[: F // 3]
    from sfm_mvs_pipeline_tpu.ops.matching import two_nn_jnp

    bi_p, b_p, s_p = two_nn_pallas(jnp.asarray(di), jnp.asarray(ti), vq, vt)
    bi_j, b_j, s_j = two_nn_jnp(jnp.asarray(di), jnp.asarray(ti), vq, vt)
    m_p = np.asarray(ratio_test_mask(b_p, s_p, vq))
    m_j = np.asarray(ratio_test_mask(b_j, s_j, vq))
    agree = (m_p == m_j).mean()
    idx_agree = (np.asarray(bi_p)[m_j] == np.asarray(bi_j)[m_j]).mean()
    derr = np.abs(np.asarray(b_p)[m_j] - np.asarray(b_j)[m_j]).max()
    print(f"accuracy: mask agree {agree:.4f} idx agree {idx_agree:.4f} "
          f"max dist err {derr:.3g}", flush=True)

    # batched production path
    S = 8
    descs = jnp.stack([dq_d] + [dt_d + 0.01 * i for i in range(S - 1)])
    valid = jnp.ones((S, F), bool)
    pairs = jnp.asarray(
        [(a, b) for a in range(S) for b in range(a + 1, S)], jnp.int32
    )[:16]

    def batch(d):
        bi, mask = match_pairs_batch(d, valid, pairs)
        return mask.astype(jnp.float32)

    t_b = _diff(batch, descs, n1=4, n2=24) / len(pairs)
    print(f"batched fused: {t_b*1e3:.4f} ms/pair = {1/t_b:.0f} pairs/s",
          flush=True)

    # hamming
    dqb = jnp.sign(dq_d).astype(jnp.bfloat16)
    dqb = jnp.concatenate([dqb, dqb], axis=1)
    dtb = jnp.sign(dt_d).astype(jnp.bfloat16)
    dtb = jnp.concatenate([dtb, dtb], axis=1)

    def one_h(q):
        idx, best, second = two_nn_pallas(q.astype(jnp.bfloat16), dtb, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    t_h = _diff(one_h, dqb)
    print(f"hamming fused: {t_h*1e3:.4f} ms = {1/t_h:.0f} pairs/s", flush=True)


if __name__ == "__main__":
    main()
