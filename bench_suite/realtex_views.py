"""r5 (VERDICT item 9): >=8-view accuracy evidence on REAL photographic
imagery — as close as a zero-egress environment allows.

No real multi-view capture exists on this machine (the only real
photographs anywhere on disk are the reference's three insel JPEGs, and
nothing can be downloaded), so a literal ">=8 real photos" dataset is
unobtainable here. The closest attainable evidence, run by this script:

  8 views rendered from a scene SURFACED WITH THE REAL insel photograph
  (utils/synth.py texture_path): real radiometry, JPEG statistics and
  natural texture spectra; synthetic two-plane geometry with EXACT
  ground-truth poses. The TPU pipeline and the cv2+scipy oracle
  (the reference re-enactment) both run on the same JPEGs; ATE vs the
  absolute truth is reported for each.
"""

import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def run_n_views(n_views: int) -> None:
    from sfm_mvs_pipeline_tpu.cli.app import main as cli_main
    from sfm_mvs_pipeline_tpu.ops.pose import aa_to_rotmat_np
    from sfm_mvs_pipeline_tpu.utils.checkpoint import load_scene
    from sfm_mvs_pipeline_tpu.utils.metrics import trajectory_compare
    from sfm_mvs_pipeline_tpu.utils.oracle import (
        OracleConfig,
        oracle_reconstruct,
    )
    from sfm_mvs_pipeline_tpu.utils.synth import render_views

    base = tempfile.mkdtemp(prefix=f"realtex{n_views}_")
    data = os.path.join(base, "views")
    paths, gt_R, gt_C = render_views(
        data, n_views=n_views, h=300, w=400, f=350.0,
        texture_path="/root/reference/images/insel/1.jpg",
    )
    print(f"rendered {n_views} real-texture views into {data}", flush=True)

    out = os.path.join(base, "out")
    t0 = time.perf_counter()
    rc = cli_main([
        "-Prun=photogrammetrie", f"-Pimage={data}", f"-Pout={out}",
        "-Pfeature-limit=800", "-Pfeature-sequence=3", "-Ploglevel=4",
    ])
    t_tpu = time.perf_counter() - t0
    scene = load_scene(os.path.join(out, "scene.npz"))
    rec = np.nonzero(scene.recovered)[0]
    est_C = np.stack(
        [-aa_to_rotmat_np(scene.poses[s][:3]).T @ scene.poses[s][3:]
         for s in rec]
    )
    est_R = np.stack([aa_to_rotmat_np(scene.poses[s][:3]) for s in rec])
    cmp_t = trajectory_compare(est_C, est_R, gt_C[rec], gt_R[rec])
    ext = np.linalg.norm(gt_C[rec][-1] - gt_C[rec][0])
    print(
        f"TPU pipeline: rc={rc} {len(rec)}/{n_views} views, {t_tpu:.1f}s, "
        f"ATE {cmp_t['ate_rmse']/ext*100:.3f}% of extent, "
        f"max rel rot {cmp_t['max_rel_rot_deg']:.3f} deg",
        flush=True,
    )

    import cv2

    t0 = time.perf_counter()
    orc = oracle_reconstruct(
        paths, OracleConfig(feature_limit=800),
        pairs=[
            (a, b)
            for a in range(n_views)
            for b in (a + 1, a + 2)
            if b < n_views
        ],
    )
    t_orc = time.perf_counter() - t0
    orc_rec = sorted(int(s) for s in orc["recovered"])
    oi = [[int(s) for s in orc["recovered"]].index(s) for s in orc_rec]
    oC = np.asarray(orc["centers"])[oi]
    oR = np.stack([cv2.Rodrigues(orc["rvecs"][s])[0] for s in orc_rec])
    rec_o = np.asarray(orc_rec)
    cmp_o = trajectory_compare(oC, oR, gt_C[rec_o], gt_R[rec_o])
    ext_o = np.linalg.norm(gt_C[rec_o][-1] - gt_C[rec_o][0])
    print(
        f"oracle (reference stack): {len(rec_o)}/{n_views} views, "
        f"{t_orc:.1f}s, ATE {cmp_o['ate_rmse']/ext_o*100:.3f}% of extent, "
        f"max rel rot {cmp_o['max_rel_rot_deg']:.3f} deg",
        flush=True,
    )


def main():
    # 8 views: the baseline real-radiometry probe. 16 views: the track
    # sweeps into the photo's texture-POOR sky region (~40-90 features/
    # view, quasi-planar visible scene) — the joint planar-degeneracy +
    # feature-starvation regime that motivated the E-vs-H model
    # selection, planar PnP family, and PnP-inlier registration.
    for n in (8, 16):
        run_n_views(n)


if __name__ == "__main__":
    main()
