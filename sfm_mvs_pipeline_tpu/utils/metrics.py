"""Evaluation metrics: similarity alignment + absolute trajectory error.

SfM reconstructions are defined up to a global similarity (gauge); comparing
two camera trajectories therefore first solves the Umeyama sim(3) alignment
and then reports RMS camera-center error — the ATE metric named in
BASELINE.md. The reference exposes trajectories via cameras_recovered.ply
(src/cli/PhotogrammetrieCli.cpp:119); we compare center sets directly.
"""

from __future__ import annotations

import numpy as np


def umeyama_alignment(
    src: np.ndarray, dst: np.ndarray, with_scale: bool = True
) -> tuple[np.ndarray, np.ndarray, float]:
    """Least-squares similarity transform s*R @ src + t ~= dst.

    src, dst: (N, 3). Returns (R, t, s).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    xs = src - mu_s
    xd = dst - mu_d
    cov = xd.T @ xs / len(src)
    U, D, Vt = np.linalg.svd(cov)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1.0
    R = U @ S @ Vt
    var_s = (xs**2).sum() / len(src)
    s = float(np.trace(np.diag(D) @ S) / var_s) if with_scale else 1.0
    t = mu_d - s * R @ mu_s
    return R, t, s


def ate_rmse(
    est_centers: np.ndarray, ref_centers: np.ndarray, with_scale: bool = True
) -> float:
    """RMS absolute trajectory error after sim(3) alignment. (N, 3) inputs."""
    if len(est_centers) < 3:
        raise ValueError("need >= 3 camera centers for alignment")
    R, t, s = umeyama_alignment(est_centers, ref_centers, with_scale)
    aligned = (s * (R @ est_centers.T)).T + t
    return float(np.sqrt(((aligned - ref_centers) ** 2).sum(axis=1).mean()))
