"""End-to-end reconstruction of a PLANAR scene — the 8-point degeneracy.

A single textured plane is the classic failure case for linear essential
estimation: every E of the form [v]x H fits coplanar correspondences
exactly, so the 8-point RANSAC converges to a wrong-but-photoconsistent
motion (observed as recovered trajectories with ~zero relative rotation),
and the resulting coplanar 3D map then breaks the 6-point DLT PnP
hypotheses for view registration. The reference stack is immune because
cv::findEssentialMat is Nister's 5-point (SfM.cpp:525) and cv::solvePnP's
EPnP has a planar special case.

This test pins the TPU-side countermeasures end to end:
  * E-vs-H model selection (ops/epipolar.py::two_view_model_scores) with
    the Faugeras homography decomposition disambiguated by full-set
    epipolar support,
  * the planar 4-point homography PnP hypothesis family
    (ops/pnp.py::_planar_pnp),
  * PnP-inlier observation registration (sfm/incremental.py).
"""

import numpy as np


def test_planar_scene_end_to_end(tmp_path):
    from sfm_mvs_pipeline_tpu.cli.app import main
    from sfm_mvs_pipeline_tpu.ops.pose import aa_to_rotmat
    from sfm_mvs_pipeline_tpu.utils.checkpoint import load_scene
    from sfm_mvs_pipeline_tpu.utils.metrics import trajectory_compare
    from sfm_mvs_pipeline_tpu.utils.synth import render_views

    data = tmp_path / "views"
    _paths, gt_R, gt_C = render_views(
        data, n_views=8, h=240, w=320, f=280.0, planar=True
    )
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
        f"planar ATE {rel_ate:.3%} of extent, "
        f"max rel rot {cmpres['max_rel_rot_deg']:.3f} deg"
    )
    # the wrong-branch failure mode measures as ~full yaw-step rotation
    # errors (~2.9 deg per view) and >4% ATE; the fixed pipeline sits
    # well under both
    assert rel_ate < 0.02, f"relative ATE {rel_ate:.3%}"
    assert cmpres["max_rel_rot_deg"] < 1.5
