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
    import cv2

    rng = np.random.default_rng(11)
    tex = cv2.GaussianBlur(rng.random((1024, 1024)).astype(np.float32), (0, 0), 3.0)
    tex = (tex - tex.min()) / (tex.max() - tex.min())
    tex2 = cv2.GaussianBlur(rng.random((1024, 1024)).astype(np.float32), (0, 0), 2.0)
    tex2 = (tex2 - tex2.min()) / (tex2.max() - tex2.min())
    gt_R, gt_C = [], []
    data = tmp / "views"
    data.mkdir()
    for v in range(n_views):
        ang = (v - n_views / 2) * 0.05
        R = np.array(
            [[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
             [-np.sin(ang), 0, np.cos(ang)]]
        )
        C = np.array([0.5 * v, 0.03 * v, 0.0])
        ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
        d = np.stack(
            [(xs - w / 2) / f, (ys - h / 2) / f, np.ones_like(xs, np.float64)],
            -1,
        ) @ R  # world-frame rays of camera v (R is world->cam, rows = axes)
        img = np.zeros((h, w), np.float32)
        for z, t, scale in ((10.0, tex, 55.0), (7.0, tex2, 75.0)):
            s = (z - C[2]) / d[..., 2]
            Xw = C[None, None] + s[..., None] * d
            u = ((Xw[..., 0] * scale) % 1024).astype(int) % 1024
            vv = ((Xw[..., 1] * scale) % 1024).astype(int) % 1024
            layer = t[vv, u]
            if z == 7.0:
                mask = ((Xw[..., 0] - 2.0) ** 2 + Xw[..., 1] ** 2) < 4.0
                img = np.where(mask, layer, img)
            else:
                img = layer
        cv2.imwrite(
            str(data / f"{v:02d}.jpg"), (img * 255).astype(np.uint8),
            [cv2.IMWRITE_JPEG_QUALITY, 95],
        )
        gt_R.append(R)
        gt_C.append(C)
    return data, np.asarray(gt_R), np.asarray(gt_C)


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
