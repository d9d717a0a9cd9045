"""r5 probe 3: interleaved A/B of match variants + honest MXU floor.

Each variant is measured 3x, interleaved (A B C A B C A B C), so slow
drift / clock-state changes show up as within-variant spread rather than
biasing one variant. Also measures the FIXED MXU floor (y <- y @ Q bf16
chain; the old multiplicative-carry floor promoted to f32 = 3-pass).
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


def mxu_floor(rng):
    M = 2048
    q_, _ = np.linalg.qr(rng.normal(size=(M, M)))
    b = jnp.asarray(q_.astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def total(n, reps=3):
        @jax.jit
        def run(x):
            def body(y, _):
                return jax.lax.dot_general(
                    y, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                ), None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y[0, 0].astype(jnp.float32)

        float(run(x0))
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    t = (total(152) - total(8)) / 144
    return 2 * M**3 / t


def main():
    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt[: F // 4] = dq[: F // 4] + rng.normal(size=(F // 4, D)).astype(np.float32) * 0.01
    dq_d = jnp.asarray(dq)
    dt_d = jnp.asarray(dt)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)

    tf1 = mxu_floor(rng)
    print(f"mxu floor (fixed probe): {tf1/1e12:.1f} TF/s -> kernel floor "
          f"{2*F*F*D/tf1*1e3:.4f} ms", flush=True)

    # variants
    q3, t3, qn1, tn1 = MK.prepare_operands(
        jnp.stack([dq_d, dt_d]), jnp.ones((2, F), bool), False, F, D
    )
    pair0 = jnp.asarray([[0, 1]], jnp.int32)

    @jax.jit
    def bare(q):
        # q perturbed by the chain: re-prep only the q side in-graph
        qo, _, qn, _ = MK.prepare_operands(
            q, jnp.ones((1, F), bool), False, F, D
        )
        best, second, idx = MK._fused_call(
            qo, t3[1:], tn1[1:], qn, jnp.zeros((1, 2), jnp.int32),
            False, False,
        )
        return best

    def wrapped(q):
        idx, best, second = MK.two_nn_pallas(q, dt_d, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    S = 8
    descs = jnp.stack([dq_d] + [dt_d + 0.01 * i for i in range(S - 1)])
    valid = jnp.ones((S, F), bool)
    pairs = jnp.asarray(
        [(a_, b_) for a_ in range(S) for b_ in range(a_ + 1, S)], jnp.int32
    )[:16]

    def batch(d):
        bi, mask = match_pairs_batch(d, valid, pairs)
        return mask.astype(jnp.float32)

    res = {"bare": [], "wrapped": [], "batch": []}
    for round_i in range(3):
        res["bare"].append(_diff(bare, dq_d[None]))
        res["wrapped"].append(_diff(wrapped, dq_d))
        res["batch"].append(_diff(batch, descs, n1=4, n2=24) / len(pairs))
        print(f"round {round_i}: " + " ".join(
            f"{k}={res[k][-1]*1e3:.4f}ms" for k in res), flush=True)

    tf2 = mxu_floor(np.random.default_rng(5))
    print(f"mxu floor again: {tf2/1e12:.1f} TF/s", flush=True)
    for k, v in res.items():
        print(f"{k}: median {np.median(v)*1e3:.4f} ms, spread "
              f"{min(v)*1e3:.4f}-{max(v)*1e3:.4f}", flush=True)


if __name__ == "__main__":
    main()
