"""Bundle adjustment: Levenberg-Marquardt with Schur complement on TPU.

Replaces the reference's Ceres setup (one AutoDiff residual block per
(3D point, observation) with parameter blocks point[3] / pose[6] /
camera-intrinsics[1|3|7], solved by LM + DENSE_SCHUR, 5000 iters, eta 0.01;
ref: src/photogrammetrie/common/BundleAdjustment.cpp:50-93,
src/photogrammetrie/util/CeresUtils.cpp:43-50).

TPU design
----------
Residuals: r_i = project(pose[shot_i], intr[cam_i], X[point_i]) - uv_i,
batched over all O observations; per-observation Jacobians via one vmapped
jax.jacfwd over the packed 16-vector (point 3 | pose 6 | intr 7) — the exact
analogue of Ceres autodiff, but computed for every observation in parallel.

Normal equations with points eliminated (Schur):
  Hpp  (P, 3, 3)  block diagonal     — segment_sum of Jp^T Jp
  Hcc  dense (D, D), D = 6*S + 7*C   — pose blocks + shared-intrinsics blocks
  Schur correction  sum_p U_p^T Bp U_p, with U_p (3, D) the point-p row of
  Hpc assembled DENSELY per point from a padded track table, chunk-scanned
  over points so the work is pure einsum/matmul on the MXU (no scatters) and
  memory stays bounded. Bp = (Hpp_p + lambda diag)^-1 via closed-form 3x3.

The reduced camera system (D x D, D small: S<=hundreds) is solved on the
HOST in float64 — device f32 everywhere else; this mirrors how the
reference funnels everything into a small dense camera solve.

Intrinsics sharing: shots reference a camera via cam_of_shot (the reference
shares ONE camera across all shots; PhotogrammetrieCli.cpp:288-299), and the
per-model optimization mask (models/cameras.py) zeroes the columns BA may
not touch, including a full freeze for never-observed parameters.

Gauge freedom (global similarity) is left to LM damping, exactly like the
reference's Ceres configuration (no fixed blocks there either).
"""

from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from sfm_mvs_pipeline_tpu.models.cameras import reprojection_residuals

CHUNK = 4096  # points per Schur-assembly chunk


@dataclasses.dataclass
class BAConfig:
    max_iterations: int = 50
    # relative cost-decrease stop, the moral analogue of Ceres eta/func-tol
    function_tolerance: float = 1e-6
    init_lambda: float = 1e-4
    lambda_up: float = 4.0
    lambda_down: float = 0.5
    min_lambda: float = 1e-10
    max_lambda: float = 1e8


def build_track_table(
    obs_point: np.ndarray, obs_weight: np.ndarray, n_points: int, cap: int = 64
) -> np.ndarray:
    """Host-side: (P, L) table of observation indices per point (pad = -1).

    L = max live track length (rounded up to a multiple of 4, capped).
    Replaces the reference's per-point Origin lists (Scene.h:242-270) with a
    fixed-capacity index table the device can gather from.
    """
    counts = np.zeros(n_points, dtype=np.int64)
    live = obs_weight > 0
    np.add.at(counts, obs_point[live], 1)
    # bucket L to powers of two so recompiles are amortized across BA calls
    need = int(counts.max()) if len(counts) else 0
    L = 4
    while L < min(need, cap):
        L *= 2
    L = int(min(L, cap))
    table = np.full((n_points, L), -1, dtype=np.int32)
    live_idx = np.nonzero(live)[0]
    pts = obs_point[live_idx]
    order = np.argsort(pts, kind="stable")
    pts_sorted = pts[order]
    idx_sorted = live_idx[order]
    # within-group rank via group-start offsets (vectorized cumcount)
    group_start = np.searchsorted(pts_sorted, pts_sorted, side="left")
    rank = np.arange(len(pts_sorted)) - group_start
    keep = rank < L
    table[pts_sorted[keep], rank[keep]] = idx_sorted[keep]
    return table


def _pack_params(points, poses, intr):
    return points, poses, intr


@partial(jax.jit, static_argnames=())
def compute_residuals(
    points, poses, intr, cam_of_shot, obs_point, obs_shot, obs_uv, obs_w
):
    """Weighted residual vector (O, 2) and total cost (0.5 * sum r^2)."""
    X = points[obs_point]
    pose = poses[obs_shot]
    K = intr[cam_of_shot[obs_shot]]
    r = jax.vmap(lambda p, k, x, uv: reprojection_residuals(p, k, x[None], uv[None])[0])(
        pose, K, X, obs_uv
    )
    r = r * obs_w[:, None]
    cost = 0.5 * jnp.sum(r * r)
    return r, cost


def _obs_jacobians(points, poses, intr, cam_of_shot, obs_point, obs_shot, obs_uv, obs_w):
    """Per-obs Jacobians: Jp (O,2,3), Jc (O,2,6), Ji (O,2,7), r (O,2)."""

    def res_one(x, pose, k, uv, w):
        return reprojection_residuals(pose, k, x[None], uv[None])[0] * w

    def packed(z, uv, w):
        return res_one(z[:3], z[3:9], z[9:16], uv, w)

    X = points[obs_point]
    pose = poses[obs_shot]
    K = intr[cam_of_shot[obs_shot]]
    z = jnp.concatenate([X, pose, K], axis=1)  # (O, 16)
    r = jax.vmap(packed)(z, obs_uv, obs_w)
    J = jax.vmap(jax.jacfwd(packed))(z, obs_uv, obs_w)  # (O, 2, 16)
    return J[:, :, :3], J[:, :, 3:9], J[:, :, 9:16], r


def _inv3x3(M):
    """Closed-form batched 3x3 inverse (adjugate/det)."""
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    A = e * i - f * h
    B = c * h - b * i
    C = b * f - c * e
    D = f * g - d * i
    E = a * i - c * g
    F = c * d - a * f
    G = d * h - e * g
    H = b * g - a * h
    I = a * e - b * d
    det = a * A + b * D + c * G
    det = jnp.where(jnp.abs(det) < 1e-20, 1e-20, det)
    adj = jnp.stack(
        [
            jnp.stack([A, B, C], axis=-1),
            jnp.stack([D, E, F], axis=-1),
            jnp.stack([G, H, I], axis=-1),
        ],
        axis=-2,
    )
    return adj / det[..., None, None]


def ba_build_core(
    points,
    poses,
    intr,
    cam_of_shot,
    obs_point,
    obs_shot,
    obs_uv,
    obs_w,
    track_tab,  # (P, L) int32, -1 pad, LOCAL obs indices
    lam,
    intr_mask,  # (C, 7) f32 — per-camera optimizable-intrinsics mask
    pose_free,  # (S,) f32 — 1 where the shot pose is optimized
    n_shots: int,
    n_cams: int,
    axis_name: str | None = None,
):
    """Assemble the Schur-reduced camera system (single-shard body).

    Returns (S_red (D, D), rhs_red (D,), Bp (P,3,3), gp (P,3), cost) where
    D = 6*n_shots + 7*n_cams and the reduced system is
       S_red @ dcam = rhs_red      (note: rhs already includes the -g sign)

    When `axis_name` is given the function runs inside shard_map with
    observations AND points sharded (observations grouped by point so the
    track table is shard-local); the camera system, rhs and cost are
    psum-reduced over the axis while Bp/gp stay shard-local. This is the
    distributed DENSE_SCHUR of SURVEY.md §2.7: points model-parallel, the
    reduced camera Hessian all-reduced over ICI.
    """
    P = points.shape[0]
    D = 6 * n_shots + 7 * n_cams

    Jp, Jc, Ji, r = _obs_jacobians(
        points, poses, intr, cam_of_shot, obs_point, obs_shot, obs_uv, obs_w
    )
    # apply masks: frozen intrinsics columns & frozen poses
    obs_cam = cam_of_shot[obs_shot]
    Ji = Ji * intr_mask[obs_cam][:, None, :]
    Jc = Jc * pose_free[obs_shot][:, None, None]

    cost = 0.5 * jnp.sum(r * r)

    # ---- camera diagonal blocks (exact, all observations)
    # TPU-native reduction: segment-sum-by-shot/cam as ONE-HOT MATMULS so the
    # reduction over O observations rides the MXU instead of scatter-adds
    # (TPU scatters serialize; this was the BA bottleneck on hardware).
    dt = points.dtype
    O = obs_shot.shape[0]
    oh_s = (obs_shot[:, None] == jnp.arange(n_shots)[None, :]).astype(dt)  # (O, S)
    oh_c = (obs_cam[:, None] == jnp.arange(n_cams)[None, :]).astype(dt)  # (O, C)
    flat_s = jnp.concatenate(
        [
            jnp.einsum("oai,oaj->oij", Jc, Jc).reshape(O, 36),
            jnp.einsum("oai,oaj->oij", Jc, Ji).reshape(O, 42),
            jnp.einsum("oai,oa->oi", Jc, r),
        ],
        axis=1,
    )  # (O, 84)
    red_s = jnp.einsum("os,ok->sk", oh_s, flat_s)  # (S, 84) — MXU
    Hcc_pose = red_s[:, :36].reshape(n_shots, 6, 6)
    Hcc_cross = red_s[:, 36:78].reshape(n_shots, 6, 7)
    gc = red_s[:, 78:84]
    flat_c = jnp.concatenate(
        [
            jnp.einsum("oai,oaj->oij", Ji, Ji).reshape(O, 49),
            jnp.einsum("oai,oa->oi", Ji, r),
        ],
        axis=1,
    )  # (O, 56)
    red_c = jnp.einsum("oc,ok->ck", oh_c, flat_c)
    Hcc_intr = red_c[:, :49].reshape(n_cams, 7, 7)
    gi = red_c[:, 49:56]

    # dense Hcc assembled from block tables with single scatters + reshapes
    s_idx = jnp.arange(n_shots)
    pp = (
        jnp.zeros((n_shots, 6, n_shots, 6), dtype=points.dtype)
        .at[s_idx, :, s_idx, :]
        .set(Hcc_pose)
        .reshape(6 * n_shots, 6 * n_shots)
    )
    c_idx = jnp.arange(n_cams)
    ii = (
        jnp.zeros((n_cams, 7, n_cams, 7), dtype=points.dtype)
        .at[c_idx, :, c_idx, :]
        .set(Hcc_intr)
        .reshape(7 * n_cams, 7 * n_cams)
    )
    pi = (
        jnp.zeros((n_shots, 6, n_cams, 7), dtype=points.dtype)
        .at[s_idx, :, cam_of_shot, :]
        .set(Hcc_cross)
        .reshape(6 * n_shots, 7 * n_cams)
    )
    Hcc = jnp.block([[pp, pi], [pi.T, ii]])

    g_full = jnp.concatenate([gc.reshape(-1), gi.reshape(-1)])

    # ---- point blocks + Schur correction, chunk-scanned over points
    # All point-side reductions (Hpp, gp) use TRACK-TABLE GATHERS rather than
    # segment_sum scatters — gathers vectorize on TPU. Exactness requires the
    # table capacity L to cover every live observation of a point
    # (build_track_table caps at 64; longer tracks are truncated there).
    Wc = jnp.einsum("oai,oaj->oij", Jp, Jc)  # (O, 3, 6)
    Wi = jnp.einsum("oai,oaj->oij", Jp, Ji)  # (O, 3, 7)

    Pp = track_tab.shape[0]
    n_chunks = (Pp + CHUNK - 1) // CHUNK
    pad = n_chunks * CHUNK - Pp
    tab = jnp.concatenate(
        [track_tab, jnp.full((pad, track_tab.shape[1]), -1, jnp.int32)], axis=0
    ).reshape(n_chunks, CHUNK, -1)

    def chunk_body(carry, tab_c):
        S_acc, rhs_acc = carry
        validL = tab_c >= 0
        safe = jnp.where(validL, tab_c, 0)
        wL = validL.astype(dt)
        Jp_t = Jp[safe] * wL[..., None, None]  # (CH, L, 2, 3)
        r_t = r[safe] * wL[..., None]  # (CH, L, 2)
        Hpp_c = jnp.einsum("plai,plaj->pij", Jp_t, Jp_t)  # (CH, 3, 3)
        gp_c = jnp.einsum("plai,pla->pi", Jp_t, r_t)  # (CH, 3)
        damped = Hpp_c + lam * _diag_embed(
            jnp.maximum(
                jnp.stack([Hpp_c[:, 0, 0], Hpp_c[:, 1, 1], Hpp_c[:, 2, 2]], axis=-1),
                1e-8,
            )
        )
        Bp_c = _inv3x3(damped)

        Wc_t = Wc[safe] * wL[..., None, None]  # (CH, L, 3, 6)
        Wi_t = Wi[safe] * wL[..., None, None]  # (CH, L, 3, 7)
        s_t = obs_shot[safe]
        c_t = obs_cam[safe]

        # dense per-point camera row U (CH, 3, D) via one-hot placement (MXU)
        oh_s2 = jax.nn.one_hot(s_t, n_shots, dtype=dt)  # (CH, L, S)
        oh_c2 = jax.nn.one_hot(c_t, n_cams, dtype=dt)
        U_pose = jnp.einsum("plij,pls->pisj", Wc_t, oh_s2).reshape(
            -1, 3, n_shots * 6
        )
        U_intr = jnp.einsum("plij,plc->picj", Wi_t, oh_c2).reshape(
            -1, 3, n_cams * 7
        )
        U = jnp.concatenate([U_pose, U_intr], axis=-1)  # (CH, 3, D)

        BU = jnp.einsum("pab,pbd->pad", Bp_c, U)  # (CH, 3, D)
        S_corr = jnp.einsum("pad,pae->de", U, BU)  # (D, D)
        rhs_corr = jnp.einsum(
            "pad,pa->d", U, jnp.einsum("pab,pb->pa", Bp_c, gp_c)
        )
        return (S_acc + S_corr, rhs_acc + rhs_corr), (Bp_c, gp_c)

    init = (jnp.zeros((D, D), dt), jnp.zeros((D,), dt))
    if axis_name is not None:
        # under shard_map the carry becomes device-varying; mark the init so
        init = jax.lax.pcast(init, axis_name, to="varying")
    (S_corr, rhs_corr), (Bp_all, gp_all) = jax.lax.scan(chunk_body, init, tab)
    Bp = Bp_all.reshape(-1, 3, 3)[:P]
    gp = gp_all.reshape(-1, 3)[:P]

    if axis_name is not None:
        # distributed reduction of the camera system over the mesh axis
        Hcc = jax.lax.psum(Hcc, axis_name)
        g_full = jax.lax.psum(g_full, axis_name)
        S_corr = jax.lax.psum(S_corr, axis_name)
        rhs_corr = jax.lax.psum(rhs_corr, axis_name)
        cost = jax.lax.psum(cost, axis_name)

    # LM damping on the (globally reduced) camera diagonal
    diagH = jnp.diagonal(Hcc)
    Hcc = Hcc + jnp.diag(lam * jnp.maximum(diagH, 1e-8))

    S_red = Hcc - S_corr
    rhs_red = -g_full + rhs_corr
    return S_red, rhs_red, Bp, gp, cost, Wc, Wi


ba_build_reduced = partial(
    jax.jit, static_argnames=("n_shots", "n_cams", "axis_name")
)(ba_build_core)


def _diag_embed(d):
    """(..., 3) -> (..., 3, 3) diagonal."""
    return jnp.einsum("...i,ij->...ij", d, jnp.eye(d.shape[-1], dtype=d.dtype))


@partial(jax.jit, static_argnames=("n_shots", "n_cams"))
def ba_backsub_points(
    dcam, Bp, gp, Wc, Wi, track_tab, obs_shot, obs_cam, n_shots: int, n_cams: int
):
    """Back-substitute the point update: dX_p = -Bp (gp + Hpc_p dcam)."""
    dpose = dcam[: 6 * n_shots].reshape(n_shots, 6)
    dintr = dcam[6 * n_shots:].reshape(n_cams, 7)
    validL = track_tab >= 0
    safe = jnp.where(validL, track_tab, 0)
    w = validL.astype(Bp.dtype)
    # sum_i Wc_i dpose_{s_i} + Wi_i dintr_{c_i}  per point
    contrib = (
        jnp.einsum("plij,plj->pli", Wc[safe], dpose[obs_shot[safe]])
        + jnp.einsum("plij,plj->pli", Wi[safe], dintr[obs_cam[safe]])
    ) * w[..., None]
    hpc_dc = jnp.sum(contrib, axis=1)  # (P, 3)
    dX = -jnp.einsum("pab,pb->pa", Bp, gp + hpc_dc)
    return dX, dpose, dintr


def run_bundle_adjustment(
    points: np.ndarray,
    poses: np.ndarray,
    intr: np.ndarray,
    cam_of_shot: np.ndarray,
    obs_point: np.ndarray,
    obs_shot: np.ndarray,
    obs_uv: np.ndarray,
    obs_w: np.ndarray,
    intr_mask: np.ndarray,
    pose_free: np.ndarray | None = None,
    config: BAConfig | None = None,
    dtype=None,
    verbose: bool = False,
) -> dict:
    """Host LM driver. Arrays are numpy (any float dtype); device work runs in
    `dtype` (default: input dtype). Returns dict with updated arrays + stats.

    Semantics parity: optimizes every point, every recovered pose and the
    shared camera intrinsics exactly like BundleAdjustment::doBundleAdjustment;
    success mirrors Ceres CONVERGENCE (we report 'converged' when the
    relative cost decrease drops below function_tolerance before hitting
    max_iterations).
    """
    cfg = config or BAConfig()
    n_shots = poses.shape[0]
    n_cams = intr.shape[0]
    P = points.shape[0]
    dt = jax.dtypes.canonicalize_dtype(dtype or points.dtype)

    # Bucket the observation and point axes to powers of two: the incremental
    # SfM loop grows both every round, and without bucketing every BA call
    # would recompile (jit keys on shapes). Padding uses zero weights /
    # out-of-range-safe indices so results are unaffected.
    O = len(obs_point)
    O_pad = 1024
    while O_pad < O:
        O_pad *= 2
    P_pad = 1024
    while P_pad < P:
        P_pad *= 2
    if O_pad > O:
        obs_point = np.concatenate([obs_point, np.zeros(O_pad - O, obs_point.dtype)])
        obs_shot = np.concatenate([obs_shot, np.zeros(O_pad - O, obs_shot.dtype)])
        obs_uv = np.concatenate([obs_uv, np.zeros((O_pad - O, 2), obs_uv.dtype)])
        obs_w = np.concatenate([obs_w, np.zeros(O_pad - O, obs_w.dtype)])
    if P_pad > P:
        points = np.concatenate([points, np.zeros((P_pad - P, 3), points.dtype)])

    import time as _time

    _tt0 = _time.perf_counter()
    track_tab = build_track_table(obs_point, obs_w, P_pad)
    _tt1 = _time.perf_counter()

    dev = lambda x, d=dt: jnp.asarray(x, dtype=d)
    pts = dev(points)
    pos = dev(poses)
    K = dev(intr)
    cams = jnp.asarray(cam_of_shot, dtype=jnp.int32)
    op = jnp.asarray(obs_point, dtype=jnp.int32)
    os_ = jnp.asarray(obs_shot, dtype=jnp.int32)
    ouv = dev(obs_uv)
    ow = dev(obs_w)
    imask = dev(intr_mask)
    pfree = dev(
        pose_free if pose_free is not None else np.ones(n_shots, dtype=np.float64)
    )
    tab = jnp.asarray(track_tab)

    jax.block_until_ready((pts, pos, K, cams, op, os_, ouv, ow, imask, pfree, tab))
    _tt2 = _time.perf_counter()
    _, cost = compute_residuals(pts, pos, K, cams, op, os_, ouv, ow)
    cost = float(cost)
    if verbose:
        print(
            f"  BA setup: track table {_tt1-_tt0:.2f}s transfers {_tt2-_tt1:.2f}s "
            f"first residuals {_time.perf_counter()-_tt2:.2f}s",
            flush=True,
        )
    lam = cfg.init_lambda
    iters = 0
    converged = False

    for it in range(cfg.max_iterations):
        _t0 = _time.perf_counter()
        iters = it + 1
        S_red, rhs_red, Bp, gp, _, Wc, Wi = ba_build_reduced(
            pts, pos, K, cams, op, os_, ouv, ow, tab,
            jnp.asarray(lam, dtype=dt), imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        # host f64 solve of the small reduced system
        jax.block_until_ready(S_red)
        _t1 = _time.perf_counter()
        S_np = np.array(S_red, dtype=np.float64)
        rhs_np = np.array(rhs_red, dtype=np.float64)
        # guard fully-frozen rows (masked intrinsics): identity them
        diag0 = np.abs(np.diag(S_np)) < 1e-12
        S_np[diag0, :] = 0.0
        S_np[:, diag0] = 0.0
        S_np[diag0, diag0] = 1.0
        rhs_np[diag0] = 0.0
        try:
            dcam = np.linalg.solve(S_np, rhs_np)
        except np.linalg.LinAlgError:
            dcam = np.linalg.lstsq(S_np, rhs_np, rcond=None)[0]

        dcam_dev = dev(dcam)
        dX, dpose, dintr = ba_backsub_points(
            dcam_dev, Bp, gp, Wc, Wi, tab, os_,
            cams[os_], n_shots=n_shots, n_cams=n_cams,
        )
        new_pts = pts + dX
        new_pos = pos + dpose * pfree[:, None]
        new_K = K + dintr * imask
        _, new_cost = compute_residuals(new_pts, new_pos, new_K, cams, op, os_, ouv, ow)
        new_cost = float(new_cost)
        if verbose:
            _t2 = _time.perf_counter()
            print(
                f"  BA iter {it}: build {_t1-_t0:.2f}s solve+apply {_t2-_t1:.2f}s "
                f"cost {cost:.4g} -> {new_cost:.4g} lam {lam:.2e}",
                flush=True,
            )

        if np.isfinite(new_cost) and new_cost < cost:
            rel = (cost - new_cost) / max(cost, 1e-30)
            pts, pos, K = new_pts, new_pos, new_K
            cost = new_cost
            lam = max(lam * cfg.lambda_down, cfg.min_lambda)
            if rel < cfg.function_tolerance:
                converged = True
                break
        else:
            lam = lam * cfg.lambda_up
            if lam > cfg.max_lambda:
                break

    _tt3 = _time.perf_counter()
    result_pts = np.array(pts, dtype=points.dtype)[:P]
    if verbose:
        print(f"  BA teardown: result transfer {_time.perf_counter()-_tt3:.2f}s", flush=True)
    return {
        "points": result_pts,
        "poses": np.array(pos, dtype=poses.dtype),
        "intrinsics": np.array(K, dtype=intr.dtype),
        "cost": cost,
        "iterations": iters,
        "converged": converged,
        "lambda": lam,
    }
