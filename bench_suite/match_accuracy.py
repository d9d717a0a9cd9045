"""On-TPU accuracy check of the 2-NN kernel vs a float64 host oracle
(the ADVICE r3 requirement: the TPU branch of two_nn_pallas was untested).

Data: real cv2.SIFT descriptors from the insel images (the distribution the
kernel actually serves), matched pairwise. Oracle: full f64 distance matrix
on the host. Reports, for fast (bf16) and exact (3-term split) modes:
  * post-ratio match-set equality vs the oracle (the kernel's contract)
  * best_idx agreement among oracle-matched queries
  * relative error of best/second distances
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import sys

import numpy as np


def main() -> int:
    import cv2

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    insel = "/root/reference/images/insel"
    if not os.path.isdir(insel):
        insel = os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "sample_data", "insel",
        )
    sift = cv2.SIFT_create(nfeatures=0, nOctaveLayers=3, contrastThreshold=0.04)
    descs = []
    for p in sorted(os.listdir(insel)):
        if not p.lower().endswith((".jpg", ".png")):
            continue
        img = cv2.imread(os.path.join(insel, p), cv2.IMREAD_GRAYSCALE)
        _, ds = sift.detectAndCompute(img, None)
        descs.append(ds.astype(np.float32))

    out = {"backend": jax.default_backend(), "n_desc": [len(d) for d in descs]}
    ratio2 = 0.7 * 0.7
    for mode in ("fast", "exact"):
        agree_sets, idx_agree, errs = [], [], []
        for a in range(len(descs)):
            for b in range(len(descs)):
                if a == b:
                    continue
                dq, dt = descs[a], descs[b]
                # f64 oracle
                d64 = (
                    (dq.astype(np.float64) ** 2).sum(1)[:, None]
                    + (dt.astype(np.float64) ** 2).sum(1)[None, :]
                    - 2.0 * dq.astype(np.float64) @ dt.astype(np.float64).T
                )
                o_idx = d64.argmin(1)
                part = np.partition(d64, 1, axis=1)
                o_b, o_s = part[:, 0], part[:, 1]
                o_mask = o_b < ratio2 * o_s

                vq = jnp.ones(len(dq), bool)
                vt = jnp.ones(len(dt), bool)
                bi, bs, ss = two_nn_pallas(
                    jnp.asarray(dq), jnp.asarray(dt), vq, vt,
                    exact=(mode == "exact"),
                )
                bi = np.asarray(bi)
                bs = np.asarray(bs)
                ss = np.asarray(ss)
                mask = bs < ratio2 * ss

                same_set = (mask == o_mask).mean()
                agree_sets.append(same_set)
                if o_mask.any():
                    idx_agree.append((bi[o_mask] == o_idx[o_mask]).mean())
                    errs.append(
                        np.abs(bs[o_mask] - o_b[o_mask])
                        / np.maximum(o_b[o_mask], 1e-9)
                    )
        out[mode] = {
            "post_ratio_set_agreement": round(float(np.mean(agree_sets)), 6),
            "best_idx_agreement_on_matches": round(float(np.mean(idx_agree)), 6),
            "median_rel_dist_err": float(np.median(np.concatenate(errs))),
            "max_rel_dist_err": float(np.max(np.concatenate(errs))),
        }
        print(mode, out[mode], flush=True)
    print(json.dumps(out))
    with open("/tmp/match_accuracy.json", "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
