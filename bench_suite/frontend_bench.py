"""Feature-frontend quality vs the cv2.SIFT oracle on the insel frames.

Quantifies what PARITY.md row 22 left open (VERDICT r2 weak #3): keypoint
counts, repeatability (mutual 2 px localization agreement), and post-ratio
match recall of ops/sift.py against cv2.SIFT with the reference's
parameters (nfeatures limit, 3 layers, contrastThreshold 0.09 —
PhotogrammetrieCli.cpp:354). Match recall counts a cv2 match (a->b) as
recalled when the TPU pipeline produced a match whose endpoints are within
3 px of it.

Run directly: python bench_suite/frontend_bench.py  (any backend)
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def load_images():
    import cv2

    full = "/root/reference/images/insel"
    base = (
        full if os.path.isdir(full)
        else os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "sample_data", "insel")
    )
    names = sorted(n for n in os.listdir(base) if n.endswith(".jpg"))
    return base, np.stack([
        cv2.imread(os.path.join(base, n), cv2.IMREAD_GRAYSCALE) for n in names
    ])


def frontend_quality(imgs, limit=10000):
    import cv2
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.ops.matching import (
        ratio_test_mask,
        two_nn_jnp,
    )
    from sfm_mvs_pipeline_tpu.ops.sift import sift_features

    sift = cv2.SIFT_create(
        nfeatures=limit, nOctaveLayers=3, contrastThreshold=0.09
    )
    cv_kp, cv_desc = [], []
    for img in imgs:
        kp, ds = sift.detectAndCompute(img, None)
        cv_kp.append(np.array([k.pt for k in kp]))
        cv_desc.append(ds)

    cap = 256
    while cap < min(limit, 8192):
        cap *= 2
    feats = sift_features(
        jnp.asarray(imgs.astype(np.float32) / 255.0),
        max_features=cap, contrast_threshold=0.09,
    )
    tpu_kp = np.asarray(feats["keypoints"])
    tpu_valid = np.asarray(feats["valid"])
    tpu_desc = np.asarray(feats["descriptors"])

    out = {"per_image": []}
    for i in range(len(imgs)):
        ours = tpu_kp[i][tpu_valid[i]]
        theirs = cv_kp[i]
        # repeatability: mutual 2 px agreement
        d = np.linalg.norm(ours[:, None] - theirs[None], axis=2)
        rep_ours = (d.min(axis=1) < 2.0).mean() if len(ours) else 0.0
        rep_theirs = (d.min(axis=0) < 2.0).mean() if len(theirs) else 0.0
        out["per_image"].append({
            "n_tpu": int(len(ours)), "n_cv2": int(len(theirs)),
            "tpu_kp_near_cv2": round(float(rep_ours), 3),
            "cv2_kp_near_tpu": round(float(rep_theirs), 3),
        })

    # post-ratio match recall on the first pair
    bf = cv2.BFMatcher(cv2.NORM_L2)
    knn = bf.knnMatch(cv_desc[0], cv_desc[1], k=2)
    cv_matches = [
        (cv_kp[0][m.queryIdx], cv_kp[1][m.trainIdx])
        for m, n in (p for p in knn if len(p) == 2)
        if m.distance < 0.7 * n.distance
    ]
    bi, bd, sd = two_nn_jnp(
        jnp.asarray(tpu_desc[0]), jnp.asarray(tpu_desc[1]),
        jnp.asarray(tpu_valid[0]), jnp.asarray(tpu_valid[1]),
    )
    mask = np.asarray(ratio_test_mask(bd, sd, jnp.asarray(tpu_valid[0])))
    bi = np.asarray(bi)
    ours_matches = [
        (tpu_kp[0][q], tpu_kp[1][bi[q]]) for q in np.nonzero(mask)[0]
    ]
    recalled = 0
    for ua, ub in cv_matches:
        for va, vb in ours_matches:
            if np.linalg.norm(ua - va) < 3 and np.linalg.norm(ub - vb) < 3:
                recalled += 1
                break
    out["pair01_cv2_matches"] = len(cv_matches)
    out["pair01_tpu_matches"] = len(ours_matches)
    out["pair01_match_recall_vs_cv2"] = round(
        recalled / max(len(cv_matches), 1), 3
    )
    return out


def main():
    if os.environ.get("SFM_BENCH_CPU"):
        # sitecustomize pins the axon TPU platform via env; only
        # jax.config can override before backend init
        import jax

        jax.config.update("jax_platforms", "cpu")
    base, imgs = load_images()
    print(f"dataset: {base}  {imgs.shape}")
    q = frontend_quality(imgs)
    for i, row in enumerate(q["per_image"]):
        print(f"image {i}: {row}")
    print(
        f"pair (0,1): cv2 {q['pair01_cv2_matches']} matches, "
        f"tpu {q['pair01_tpu_matches']} matches, "
        f"recall vs cv2 {q['pair01_match_recall_vs_cv2']}"
    )


if __name__ == "__main__":
    main()
