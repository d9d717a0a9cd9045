"""End-to-end smoke test on the bundled insel dataset (downscaled).

The CPU twin of the reference's `build.sh fast-test` (ref:
/root/reference/build.sh:233-239): full CLI drive — images -> SIFT ->
matching -> incremental SfM -> BA -> PLY/stat outputs. Uses a reduced
resolution + feature cap so the test stays in CI budget.
"""

import os

import numpy as np
import pytest

INSEL = "/root/reference/images/insel"


@pytest.mark.skipif(not os.path.isdir(INSEL), reason="insel images not available")
def test_insel_cli_end_to_end(tmp_path):
    import cv2

    from sfm_mvs_pipeline_tpu.cli.app import main

    # downscale the three frames into a temp dataset
    data = tmp_path / "insel_small"
    data.mkdir()
    for name in sorted(os.listdir(INSEL)):
        img = cv2.imread(os.path.join(INSEL, name))
        img = cv2.resize(img, (240, 135), interpolation=cv2.INTER_AREA)
        cv2.imwrite(str(data / name), img)

    out = tmp_path / "out"
    rc = main(
        [
            "-Prun=photogrammetrie",
            f"-Pimage={data}",
            f"-Pout={out}",
            "-Pfeature-limit=512",
            "--colored",
            "--stats",
        ]
    )
    assert rc == 0

    # sparse cloud + cameras + stats all written
    assert (out / "pointcloud_sparse.ply").exists()
    assert (out / "cameras_recovered.ply").exists()
    assert (out / "reprojectionerror.stat.csv").exists()
    assert (out / "scene.npz").exists()

    # reconstruction quality: all 3 views recovered with sub-pixel error
    from sfm_mvs_pipeline_tpu.utils.checkpoint import load_scene
    from sfm_mvs_pipeline_tpu.utils.stats import reprojection_errors

    scene = load_scene(str(out / "scene.npz"))
    assert scene.recovered.sum() == 3
    assert scene.point_valid.sum() > 50
    errs = reprojection_errors(scene)
    assert np.median(errs) < 1.0, f"median reprojection {np.median(errs)}"

    # colorized points are not all black
    live = scene.point_valid
    # colors live in the checkpoint; at least some color variation expected
    assert scene.colors[live][:, :3].max() > 30
