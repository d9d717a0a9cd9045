"""r5 (VERDICT item 7): FLANN-path recall at the big-feature regime.

r4 measured recall 1.00 only at F=8192 where the default
proj 16 / shortlist 32 covers 0.4% of candidates; at F=30000 the shortlist
covers 0.1% — measure whether the ratio-test survivors still land in it.
Method: 30000x30000x128 synthetic SIFT-like descriptors with planted
matches, exact 2-NN via the Pallas kernel as reference, two_nn_approx as
the system under test; recall = fraction of exact post-ratio matches the
approx path reproduces (same index).
"""

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

from sfm_mvs_pipeline_tpu.ops.matching import (
    ratio_test_mask,
    two_nn_approx,
)
from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas


def run(F, proj_dim=16, shortlist=32):
    rng = np.random.default_rng(1)
    D = 128
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32) * 30
    dt = np.abs(rng.normal(size=(F, D))).astype(np.float32) * 30
    n_pl = F // 3
    dt[:n_pl] = dq[:n_pl] + rng.normal(size=(n_pl, D)).astype(np.float32) * 1.5
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)
    dq_d = jnp.asarray(dq)
    dt_d = jnp.asarray(dt)

    bi_e, b_e, s_e = two_nn_pallas(dq_d, dt_d, vq, vt)
    m_e = np.asarray(ratio_test_mask(b_e, s_e, vq))
    bi_e = np.asarray(bi_e)

    bi_a, b_a, s_a = two_nn_approx(
        dq_d, dt_d, vq, vt, proj_dim=proj_dim, shortlist=shortlist
    )
    m_a = np.asarray(ratio_test_mask(b_a, s_a, vq))
    bi_a = np.asarray(bi_a)

    exact_set = {(q, bi_e[q]) for q in np.nonzero(m_e)[0]}
    approx_set = {(q, bi_a[q]) for q in np.nonzero(m_a)[0]}
    recall = len(exact_set & approx_set) / max(len(exact_set), 1)
    extra = len(approx_set - exact_set)
    print(
        f"F={F} proj={proj_dim} shortlist={shortlist}: exact matches "
        f"{len(exact_set)}, recall {recall:.4f}, spurious {extra}",
        flush=True,
    )
    return recall


if __name__ == "__main__":
    run(8192)
    run(30000)
    run(30000, proj_dim=24, shortlist=64)
