"""End-to-end trajectory accuracy vs ABSOLUTE ground truth.

Renders a parallax-rich two-plane scene from 8 known camera poses (pure
numpy ray-casting — no pipeline code involved), drives the full CLI
(SIFT -> matching -> incremental SfM -> BA), and compares the recovered
trajectory against the generating poses with sim(3)-aligned ATE and
gauge-free relative rotations. Unlike the insel ATE test (which compares
against a cv2 oracle) this one needs no oracle at all: the ground truth is
exact by construction.
"""

import os

import numpy as np


def _render_views(tmp, n_views=8, h=240, w=320, f=280.0):
    from sfm_mvs_pipeline_tpu.utils.synth import render_views

    data = tmp / "views"
    _paths, gt_R, gt_C = render_views(data, n_views, h, w, f)
    return data, gt_R, gt_C


def test_synthetic_trajectory_vs_ground_truth(tmp_path):
    from sfm_mvs_pipeline_tpu.cli.app import main
    from sfm_mvs_pipeline_tpu.ops.pose import aa_to_rotmat
    from sfm_mvs_pipeline_tpu.utils.checkpoint import load_scene
    from sfm_mvs_pipeline_tpu.utils.metrics import trajectory_compare

    data, gt_R, gt_C = _render_views(tmp_path)
    out = tmp_path / "out"
    rc = main(
        [
            "-Prun=photogrammetrie",
            f"-Pimage={data}",
            f"-Pout={out}",
            "-Pfeature-limit=800",
            "-Pfeature-sequence=3",
            "-Ploglevel=4",
        ]
    )
    assert rc == 0
    scene = load_scene(str(out / "scene.npz"))
    rec = np.nonzero(scene.recovered)[0]
    assert len(rec) >= 7, f"only {len(rec)}/8 views recovered"

    est_C, est_R = [], []
    for s in rec:
        R = np.asarray(aa_to_rotmat(scene.poses[s][:3]))
        est_C.append(-R.T @ scene.poses[s][3:])
        est_R.append(R)
    cmpres = trajectory_compare(
        np.asarray(est_C), np.asarray(est_R), gt_C[rec], gt_R[rec]
    )
    extent = np.linalg.norm(gt_C[rec][-1] - gt_C[rec][0])
    rel_ate = cmpres["ate_rmse"] / extent
    print(
        f"GT ATE {cmpres['ate_rmse']:.4f} ({rel_ate:.3%} of extent), "
        f"rel rot mean {cmpres['mean_rel_rot_deg']:.3f} deg "
        f"max {cmpres['max_rel_rot_deg']:.3f} deg"
    )
    assert rel_ate < 0.02, f"relative ATE {rel_ate:.3%}"
    assert cmpres["max_rel_rot_deg"] < 1.0
