"""End-to-end incremental SfM on a synthetic scene with synthetic descriptors."""

import numpy as np
import jax.numpy as jnp
import pytest

from sfm_mvs_pipeline_tpu.models.scene import Scene
from sfm_mvs_pipeline_tpu.ops.pairs import unordered_pairs
from sfm_mvs_pipeline_tpu.ops.pose import camera_center
from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig
from sfm_mvs_pipeline_tpu.sfm.incremental import SfMConfig, reconstruct
from sfm_mvs_pipeline_tpu.utils.metrics import ate_rmse, umeyama_alignment


def _make_feature_scene(rng, n_cams=5, n_pts=300, F=512, D=32, occl=0.25):
    """Synthetic world: each 3D point has a unique descriptor; each camera
    observes a random ~(1-occl) subset with small descriptor noise."""
    w, h, f = 640, 480, 520.0
    world = rng.uniform(-2, 2, size=(n_pts, 3))
    world[:, 2] += 8.0
    desc_true = rng.normal(size=(n_pts, D)).astype(np.float32) * 10

    Rs, ts = [], []
    for i in range(n_cams):
        ang = (i - n_cams / 2) * 0.15
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        C = np.array([3.0 * np.sin(ang), 0.05 * i, 8.0 - 8.0 * np.cos(ang)])
        Rs.append(R)
        ts.append(-R @ C)

    kps = np.zeros((n_cams, F, 2), np.float32)
    descs = np.zeros((n_cams, F, D), np.float32)
    valid = np.zeros((n_cams, F), bool)
    for s in range(n_cams):
        pc = world @ Rs[s].T + ts[s]
        uv = pc[:, :2] / pc[:, 2:3] * f + [w / 2, h / 2]
        vis = (
            (pc[:, 2] > 0)
            & (uv[:, 0] > 0) & (uv[:, 0] < w)
            & (uv[:, 1] > 0) & (uv[:, 1] < h)
            & (rng.random(n_pts) > occl)
        )
        ids = np.nonzero(vis)[0][:F]
        n = len(ids)
        kps[s, :n] = uv[ids] + rng.normal(size=(n, 2)) * 0.3
        descs[s, :n] = desc_true[ids] + rng.normal(size=(n, D)) * 0.1
        valid[s, :n] = True

    intr = np.array([f, w / 2, h / 2, 0, 0, 0, 0])
    centers = np.stack([-R.T @ t for R, t in zip(Rs, ts)])
    return kps, descs, valid, intr, (w, h), centers, world


@pytest.fixture(scope="module")
def feature_scene():
    rng = np.random.default_rng(11)
    return _make_feature_scene(rng)


def test_incremental_reconstruction(feature_scene):
    kps, descs, valid, intr, size, gt_centers, world = feature_scene
    scene = Scene.create(
        [f"im{i}" for i in range(len(kps))], size, kps, descs, valid,
        intr, camera_model="fixed",
    )
    pairs = unordered_pairs(scene.n_shots)
    cfg = SfMConfig(
        baseline_min_matches=50,
        matcher_backend="jnp",
        ba=BAConfig(max_iterations=20),
    )
    logs = []
    stats = reconstruct(scene, pairs, cfg, log=lambda *a: logs.append(" ".join(map(str, a))))

    assert stats["baseline"] is not None, "\n".join(logs)
    assert stats["recovered"] == scene.n_shots, "\n".join(logs)
    assert scene.n_points > 150

    centers = np.stack(
        [np.asarray(camera_center(jnp.asarray(p))) for p in scene.poses]
    )
    ate = ate_rmse(centers, gt_centers)
    # scene scale ~8 units; sub-0.5% ATE expected with 0.3px noise
    assert ate < 0.02, f"ATE {ate}\n" + "\n".join(logs)

    # Structure check (aligned on the camera trajectory): the narrow-arc rig
    # has a weak depth mode that reprojection cost barely constrains, so the
    # tolerance here is looser than the statistical triangulation floor —
    # it guards against broken association/merging, not the gauge-adjacent
    # deformation (verified: tracks are 100% consistent; error is a global
    # depth-direction shift with ~0 cost gradient).
    R, t, s = umeyama_alignment(centers, gt_centers)
    pts_aligned = (s * (R @ scene.points.T)).T + t
    d = np.linalg.norm(pts_aligned[:, None] - world[None], axis=2).min(axis=1)
    assert np.median(d) < 0.2, f"median point error {np.median(d)}"
    # and after aligning the structure itself, residual scatter is small
    nearest = np.linalg.norm(pts_aligned[:, None] - world[None], axis=2).argmin(axis=1)
    R2, t2, s2 = umeyama_alignment(pts_aligned, world[nearest])
    pts2 = (s2 * (R2 @ pts_aligned.T)).T + t2
    d2 = np.linalg.norm(pts2 - world[nearest], axis=1)
    assert np.median(d2) < 0.08, f"median structural error {np.median(d2)}"


def test_umeyama_roundtrip(rng):
    src = rng.normal(size=(20, 3))
    R0, _ = np.linalg.qr(rng.normal(size=(3, 3)))
    if np.linalg.det(R0) < 0:
        R0[:, 0] *= -1
    dst = 2.5 * src @ R0.T + np.array([1, -2, 3])
    R, t, s = umeyama_alignment(src, dst)
    assert abs(s - 2.5) < 1e-9
    np.testing.assert_allclose(R, R0, atol=1e-9)
    assert ate_rmse(src, dst) < 1e-9


def test_track_fusion_merges_linked_tracks(feature_scene):
    """A match linking two existing tracks merges them when the 3D-distance
    and descriptor-distance gates hold (ref mergePointcloudElement3d2d,
    Scene.cpp:470-561). With generous gates, duplicate tracks of the same
    world point should collapse: every surviving point maps to a distinct
    world point."""
    kps, descs, valid, intr, size, gt_centers, world = feature_scene
    scene = Scene.create(
        [f"im{i}" for i in range(len(kps))], size, kps, descs, valid,
        intr, camera_model="fixed",
    )
    pairs = unordered_pairs(scene.n_shots)
    cfg = SfMConfig(
        baseline_min_matches=50,
        matcher_backend="jnp",
        point_merge_distance=0.2,       # generous 3D gate (world units)
        feature_merge_distance=1e9,     # descriptor gate effectively off
        ba=BAConfig(max_iterations=20),
    )
    stats = reconstruct(scene, pairs, cfg, log=lambda *a: None)
    assert stats["baseline"] is not None
    live = scene.point_valid
    # every live point's observations must agree (single obs per (p, s) is
    # NOT guaranteed after fusion — that's what the BA fallback handles),
    # and aliases must point at live parents
    for dead, parent in scene.point_alias.items():
        assert not scene.point_valid[dead]
        while parent in scene.point_alias:
            parent = scene.point_alias[parent]
        assert scene.point_valid[parent]
    # fused scene should still reconstruct all views with decent geometry
    assert stats["recovered"] == scene.n_shots
    assert live.sum() > 100


def test_spatial_merge_collapses_unlinked_tracks():
    """Two tracks that never shared a match but sit within the merge
    distance collapse into one (ref mergePointcloudElement, pure 3D
    distance — Scene.cpp:435-468). A third, distant point survives."""
    from sfm_mvs_pipeline_tpu.models.scene import Scene

    S, F = 2, 8
    scene = Scene.create(
        ["a", "b"], (64, 64),
        np.zeros((S, F, 2), np.float32), np.zeros((S, F, 4), np.float32),
        np.ones((S, F), bool), np.array([80.0, 32, 32, 0, 0, 0, 0]),
    )
    # track 0: obs in shot 0 feat 0 / shot 1 feat 0; track 1 duplicates its
    # position with DIFFERENT features (unlinked); track 2 is far away
    scene.add_points(
        np.array([[0, 0, 5.0], [0.005, 0, 5.0], [3, 3, 9.0]]),
        [
            [(0, 0, (10, 10)), (1, 0, (12, 10))],
            [(0, 1, (11, 10)), (1, 1, (13, 10))],
            [(0, 2, (40, 40))],
        ],
    )
    n = scene.merge_close_points(0.05)
    assert n == 1
    assert scene.point_valid.tolist() == [True, False, True]
    # observations + feature links moved to the surviving parent
    assert (scene.obs_point[:4] == 0).all()
    assert scene.point_of_feat[0, 1] == 0 and scene.point_of_feat[1, 1] == 0
    assert scene.point_alias[1] == 0
    # idempotent: nothing left to merge
    assert scene.merge_close_points(0.05) == 0
