"""Recall of the approximate (FLANN-equivalent) matcher at scale.

two_nn_approx replaces the reference's FLANN option with a random-
projection shortlist + exact rerank (ops/matching.py). The r2 agreement
test only ran at small F; this measures post-ratio-test recall vs the
exact matcher at the bench shape (F=8192, D=128) for several
(proj_dim, shortlist) settings, on realistic SIFT-like descriptors
(non-negative, heavy-tailed, a planted inlier fraction).

Recall = |approx matches that agree with an exact match| / |exact matches|
(agreement = same target index). Run directly:
  python bench_suite/flann_recall.py [F]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def recall_at(F=8192, D=128, settings=((16, 32), (16, 64), (32, 64), (32, 128))):
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.ops.matching import (
        ratio_test_mask,
        two_nn_approx,
        two_nn_jnp,
    )

    rng = np.random.default_rng(3)
    dq = np.abs(rng.normal(size=(F, D)) ** 2).astype(np.float32) * 50
    dt = np.abs(rng.normal(size=(F, D)) ** 2).astype(np.float32) * 50
    # plant noisy correspondences for half the queries
    dt[: F // 2] = dq[: F // 2] + rng.normal(size=(F // 2, D)).astype(
        np.float32
    ) * 2.0
    dq_d, dt_d = jnp.asarray(dq), jnp.asarray(dt)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)

    bi_e, bd_e, sd_e = two_nn_jnp(dq_d, dt_d, vq, vt)
    m_e = np.asarray(ratio_test_mask(bd_e, sd_e, vq))
    bi_e = np.asarray(bi_e)
    n_exact = int(m_e.sum())

    out = []
    for proj_dim, shortlist in settings:
        t0 = time.perf_counter()
        bi_a, bd_a, sd_a = two_nn_approx(
            dq_d, dt_d, vq, vt, proj_dim=proj_dim, shortlist=shortlist
        )
        m_a = np.asarray(ratio_test_mask(bd_a, sd_a, vq))
        el = time.perf_counter() - t0
        bi_a = np.asarray(bi_a)
        hit = int((m_e & m_a & (bi_a == bi_e)).sum())
        out.append(
            dict(
                proj_dim=proj_dim, shortlist=shortlist,
                recall=round(hit / max(n_exact, 1), 4),
                n_exact=n_exact, n_approx=int(m_a.sum()),
                wall_s=round(el, 2),
            )
        )
    return out


def main():
    F = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    for row in recall_at(F=F):
        print(row)


if __name__ == "__main__":
    main()
