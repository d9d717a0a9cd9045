"""Batched essential-matrix estimation + relative pose recovery.

Replaces cv::findEssentialMat(RANSAC) + cv::recoverPose
(ref: src/photogrammetrie/sfm/SfM.cpp:491-540) for baseline/new-pair pose
recovery.

Algorithm: batched 8-point hypotheses on undistorted normalized coords with
essential-constraint projection (singular values -> (1,1,0)), Sampson-error
scoring, then the classic 4-way (R, t) decomposition disambiguated by a
cheirality vote over all inlier correspondences. Thresholds given in pixels
are divided by the focal length to act on normalized coords (matching cv's
internal focal scaling).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfm_mvs_pipeline_tpu.ops.ransac import sample_valid_indices, select_best
from sfm_mvs_pipeline_tpu.ops.triangulate import triangulate_dlt
from sfm_mvs_pipeline_tpu.ops.pose import rotmat_to_aa


def _eight_point(x1: jax.Array, x2: jax.Array) -> jax.Array:
    """8-point algorithm on normalized coords. x: (M, 2). Returns E (3,3)."""
    u1, v1 = x1[:, 0], x1[:, 1]
    u2, v2 = x2[:, 0], x2[:, 1]
    one = jnp.ones_like(u1)
    # epipolar constraint x2^T E x1 = 0
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=1
    )  # (M, 9)
    AtA = A.T @ A
    _, vecs = jnp.linalg.eigh(AtA)
    E = vecs[:, 0].reshape(3, 3)
    # project onto essential manifold: singular values (1, 1, 0)
    U, s, Vt = jnp.linalg.svd(E)
    E = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=E.dtype)) @ Vt
    return E


def sampson_error(E: jax.Array, x1: jax.Array, x2: jax.Array) -> jax.Array:
    """First-order geometric (Sampson) distance in normalized coords. (N,)"""
    x1h = jnp.concatenate([x1, jnp.ones_like(x1[..., :1])], axis=-1)
    x2h = jnp.concatenate([x2, jnp.ones_like(x2[..., :1])], axis=-1)
    Ex1 = x1h @ E.T  # (N, 3)
    Etx2 = x2h @ E  # (N, 3)
    num = jnp.sum(x2h * Ex1, axis=-1)
    den = Ex1[..., 0] ** 2 + Ex1[..., 1] ** 2 + Etx2[..., 0] ** 2 + Etx2[..., 1] ** 2
    return jnp.abs(num) / jnp.sqrt(den + 1e-18)


def decompose_essential(E: jax.Array) -> tuple[jax.Array, jax.Array, jax.Array]:
    """E -> (R1, R2, t). The four pose candidates are (R1,t),(R1,-t),(R2,t),(R2,-t)."""
    U, _, Vt = jnp.linalg.svd(E)
    # enforce proper rotations
    U = U * jnp.sign(jnp.linalg.det(U))
    Vt = Vt * jnp.sign(jnp.linalg.det(Vt))
    W = jnp.array([[0.0, -1.0, 0.0], [1.0, 0.0, 0.0], [0.0, 0.0, 1.0]], dtype=E.dtype)
    R1 = U @ W @ Vt
    R2 = U @ W.T @ Vt
    t = U[:, 2]
    return R1, R2, t


@functools.partial(jax.jit, static_argnames=("k_hyp",))
def find_essential_ransac(
    key: jax.Array,
    xy1: jax.Array,
    xy2: jax.Array,
    valid: jax.Array,
    thresh_norm: float | jax.Array,
    k_hyp: int = 512,
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """RANSAC essential matrix on normalized coords.

    Returns (E, inlier_mask, inlier_count). thresh_norm is the Sampson
    threshold in NORMALIZED units (pixel threshold / focal length).
    """
    idx = sample_valid_indices(key, valid, k_hyp, 8)
    Es = jax.vmap(lambda s: _eight_point(xy1[s], xy2[s]))(idx)
    res = jax.vmap(lambda E: sampson_error(E, xy1, xy2))(Es)
    E, mask, count = select_best(Es, res, valid, thresh_norm)

    # polish: re-estimate from all inliers (weighted 8-point), keep if better
    w = mask.astype(xy1.dtype)[:, None]
    u1, v1 = xy1[:, 0], xy1[:, 1]
    u2, v2 = xy2[:, 0], xy2[:, 1]
    one = jnp.ones_like(u1)
    A = jnp.stack(
        [u2 * u1, u2 * v1, u2, v2 * u1, v2 * v1, v2, u1, v1, one], axis=1
    ) * w
    _, vecs = jnp.linalg.eigh(A.T @ A)
    E2 = vecs[:, 0].reshape(3, 3)
    U, s, Vt = jnp.linalg.svd(E2)
    E2 = U @ jnp.diag(jnp.array([1.0, 1.0, 0.0], dtype=E2.dtype)) @ Vt
    res2 = sampson_error(E2, xy1, xy2)
    mask2 = (res2 <= thresh_norm) & valid & jnp.isfinite(res2)
    count2 = jnp.sum(mask2)
    better = count2 >= count
    return (
        jnp.where(better, E2, E),
        jnp.where(better, mask2, mask),
        jnp.maximum(count2, count),
    )


@jax.jit
def recover_pose(
    E: jax.Array, xy1: jax.Array, xy2: jax.Array, mask: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """Disambiguate the 4 (R, t) candidates by cheirality voting.

    Mirrors cv::recoverPose (ref call: SfM.cpp:528): triangulate the masked
    correspondences under each candidate, count points with positive depth in
    both views, pick the winner. Returns (pose6 [rvec|t] with |t| = 1,
    updated mask = input mask AND positive-depth under the winner).
    """
    R1, R2, t = decompose_essential(E)
    eye34 = jnp.concatenate([jnp.eye(3, dtype=E.dtype), jnp.zeros((3, 1), E.dtype)], axis=1)

    def cheirality(R, tv):
        P2 = jnp.concatenate([R, tv[:, None]], axis=1)
        X = triangulate_dlt(eye34, P2, xy1, xy2)
        z1 = X[:, 2]
        z2 = (X @ R.T + tv)[:, 2]
        # clamp depth test to a generous far plane like cv (50 / |t|=1 scale)
        good = (z1 > 0) & (z2 > 0) & (z1 < 50.0) & (z2 < 50.0)
        return jnp.sum(good & mask), good

    cands = [(R1, t), (R1, -t), (R2, t), (R2, -t)]
    counts = []
    goods = []
    Rs = []
    ts = []
    for R, tv in cands:
        c, g = cheirality(R, tv)
        counts.append(c)
        goods.append(g)
        Rs.append(R)
        ts.append(tv)
    counts = jnp.stack(counts)
    goods = jnp.stack(goods)
    Rs = jnp.stack(Rs)
    ts = jnp.stack(ts)
    best = jnp.argmax(counts)
    pose = jnp.concatenate([rotmat_to_aa(Rs[best]), ts[best]])
    return pose, mask & goods[best]
