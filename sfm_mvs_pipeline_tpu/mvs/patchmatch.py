"""PatchMatch multi-view stereo: checkerboard propagation on TPU.

The reference's default dense path is openMVS PatchMatch
(ref: src/photogrammetrie/mvs/MVS.cpp:112-120 ``DenseReconstruction(0)``;
SURVEY.md §2.4). plane_sweep.py covers it with a dense sweep; this module is
the direct PatchMatch analogue, reformulated for XLA's static dataflow:

  * the per-pixel state is a CONTINUOUS inverse-depth map (no plane
    quantization) plus its current photometric cost
  * sequential spatial propagation becomes CHECKERBOARD propagation: all
    pixels of one parity consider their 4 neighbors' depths simultaneously
    (red/black Gauss-Seidel — the standard GPU PatchMatch schedule, which is
    also the right TPU schedule: each half-iteration is a dense, fully
    batched candidate evaluation, no data-dependent control flow)
  * random search becomes a fixed number of batched perturbation candidates
    with geometrically shrinking scale (classic PatchMatch halving)
  * every candidate map is scored in one shot: per-pixel warp into each
    neighbor (elementwise projective math + bilinear gather), ZNCC over a
    box window (separable box sums), aggregated as the mean of the best
    half of neighbors — identical scoring to plane_sweep.sweep_cost_volume,
    so the two methods are directly comparable and share filtering

Candidate count per half-iteration is 4 (propagation) + 2 (random) + the
carried current state, matching PatchMatch's classic budget; with the
default 8 iterations the total number of cost evaluations (~96 per
neighbor) equals a 96-plane sweep while resolving CONTINUOUS depths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from sfm_mvs_pipeline_tpu.models.cameras import intrinsics_to_K
from sfm_mvs_pipeline_tpu.mvs.plane_sweep import _bilinear_hw, _box_filter
from sfm_mvs_pipeline_tpu.ops.pose import aa_to_rotmat, relative_pose


def _ref_rays(h: int, w: int, K: jax.Array, dtype) -> jax.Array:
    """(3, H, W) unnormalized camera rays K^-1 [u, v, 1]."""
    ys, xs = jnp.meshgrid(
        jnp.arange(h, dtype=dtype), jnp.arange(w, dtype=dtype), indexing="ij"
    )
    pix = jnp.stack([xs, ys, jnp.ones_like(xs)], axis=0)  # (3, H, W)
    return jnp.einsum("ij,jhw->ihw", jnp.linalg.inv(K), pix)


def _shift_edge(img: jax.Array, dy: int, dx: int) -> jax.Array:
    """img shifted by (dy, dx) with edge replication (static offsets)."""
    h, w = img.shape
    yy = jnp.clip(jnp.arange(h) + dy, 0, h - 1)
    xx = jnp.clip(jnp.arange(w) + dx, 0, w - 1)
    return img[yy][:, xx]


@functools.partial(jax.jit, static_argnames=("window_radius",))
def _cost_of_inv_depth(
    inv: jax.Array,  # (H, W) candidate inverse depth
    ref_img: jax.Array,  # (H, W)
    nbr_imgs: jax.Array,  # (N, H, W)
    rels: jax.Array,  # (N, 6) relative poses ref->neighbor
    K: jax.Array,  # (3, 3)
    rays: jax.Array,  # (3, H, W)
    nbr_valid: jax.Array,  # (N,) bool
    window_radius: int = 3,
) -> jax.Array:
    """Photometric cost (H, W) of one inverse-depth hypothesis map.

    Mean over the best half of valid neighbors of (1 - ZNCC)/2; out-of-view
    samples cost 1.

    Unlike plane_sweep (one shared warp per plane + box filters), the patch
    at pixel p must be scored under p's OWN depth hypothesis — a shared
    warp of a spatially-varying depth map would pollute every window with
    the neighbors' (possibly random) hypotheses and destroy the selection
    signal PatchMatch needs. So each pixel compares its ref window against
    the neighbor window around its own warped position (Gipuma-style
    fronto-parallel patch, translation approximation of the local warp):
    for every window offset o, sample nbr at (warp_p + o) — the fractional
    part of warp_p is shared across offsets, so each offset costs 4
    integer-shifted gathers re-using one set of bilinear weights.
    """
    h, w = ref_img.shape
    r = window_radius
    area = (2 * r + 1) ** 2
    depth = 1.0 / jnp.maximum(inv, 1e-9)
    X = rays * depth[None]  # (3, H, W) points in the ref camera frame

    # precompute edge-replicated ref shifts (shared across neighbors)
    ref_sh = {
        (dy, dx): _shift_edge(ref_img, dy, dx)
        for dy in range(-r, r + 1)
        for dx in range(-r, r + 1)
    }

    def per_neighbor(nbr_img, rel):
        R = aa_to_rotmat(rel[:3])
        t = rel[3:]
        Xn = jnp.einsum("ij,jhw->ihw", R, X) + t[:, None, None]
        p = jnp.einsum("ij,jhw->ihw", K, Xn)
        z = jnp.where(jnp.abs(p[2]) < 1e-9, 1e-9, p[2])
        xq = p[0] / z
        yq = p[1] / z
        inside = (
            (xq >= 0) & (xq <= w - 1.001) & (yq >= 0) & (yq <= h - 1.001)
            & (p[2] > 1e-6)
        )
        x0 = jnp.floor(xq)
        y0 = jnp.floor(yq)
        fx = xq - x0
        fy = yq - y0
        x0i = x0.astype(jnp.int32)
        y0i = y0.astype(jnp.int32)
        w00 = (1 - fx) * (1 - fy)
        w01 = fx * (1 - fy)
        w10 = (1 - fx) * fy
        w11 = fx * fy
        flat = nbr_img.reshape(-1)

        def grab(dy, dx):
            yy = jnp.clip(y0i + dy, 0, h - 1)
            xx = jnp.clip(x0i + dx, 0, w - 1)
            return flat[(yy * w + xx).reshape(-1)].reshape(h, w)

        sr = jnp.zeros_like(ref_img)
        srr = jnp.zeros_like(ref_img)
        sn = jnp.zeros_like(ref_img)
        snn = jnp.zeros_like(ref_img)
        srn = jnp.zeros_like(ref_img)
        for dy in range(-r, r + 1):
            for dx in range(-r, r + 1):
                s_o = (
                    w00 * grab(dy, dx) + w01 * grab(dy, dx + 1)
                    + w10 * grab(dy + 1, dx) + w11 * grab(dy + 1, dx + 1)
                )
                r_o = ref_sh[(dy, dx)]
                sr = sr + r_o
                srr = srr + r_o * r_o
                sn = sn + s_o
                snn = snn + s_o * s_o
                srn = srn + r_o * s_o
        r_mean = sr / area
        n_mean = sn / area
        r_var = jnp.maximum(srr / area - r_mean * r_mean, 1e-8)
        n_var = jnp.maximum(snn / area - n_mean * n_mean, 1e-8)
        cov = srn / area - r_mean * n_mean
        zncc = cov / jnp.sqrt(r_var * n_var)
        cost = (1.0 - jnp.clip(zncc, -1.0, 1.0)) * 0.5
        return jnp.where(inside, cost, 1.0)

    costs = jax.vmap(per_neighbor)(nbr_imgs, rels)  # (N, H, W)
    n = costs.shape[0]
    costs = jnp.where(nbr_valid[:, None, None], costs, 1.0)
    srt = jnp.sort(jnp.moveaxis(costs, 0, -1), axis=-1)  # (H, W, N) asc
    n_valid = jnp.sum(nbr_valid.astype(costs.dtype))
    k_dyn = jnp.maximum(jnp.ceil(n_valid / 2.0), 1.0)
    take = (jnp.arange(n, dtype=costs.dtype) < k_dyn).astype(costs.dtype)
    return jnp.einsum("hwn,n->hw", srt, take) / k_dyn


@functools.partial(
    jax.jit, static_argnames=("iterations", "window_radius")
)
def patchmatch_depth(
    ref_img: jax.Array,  # (H, W) grayscale f32
    nbr_imgs: jax.Array,  # (N, H, W)
    pose_r: jax.Array,  # (6,)
    poses_n: jax.Array,  # (N, 6)
    intr: jax.Array,  # (7,) intrinsics scaled to this resolution
    z_min: float | jax.Array,
    z_max: float | jax.Array,
    key: jax.Array,
    init_depth: jax.Array | None = None,  # (H, W) seed (e.g. coarser level)
    init_valid: jax.Array | None = None,  # (H, W) bool for the seed
    iterations: int = 8,
    window_radius: int = 3,
    max_cost: float = 0.4,
    nbr_valid: jax.Array | None = None,  # (N,) bool — False = padded slot
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """PatchMatch depth for one reference view.

    Returns (depth (H, W), cost (H, W), valid (H, W)) — the same contract
    as plane_sweep.wta_depth so mvs/pipeline.py can swap methods freely.
    """
    h, w = ref_img.shape
    dt = ref_img.dtype
    K = intrinsics_to_K(intr).astype(dt)
    rays = _ref_rays(h, w, K, dt)
    rels = jax.vmap(lambda pn: relative_pose(pose_r, pn))(poses_n)
    if nbr_valid is None:
        nbr_valid = jnp.ones(nbr_imgs.shape[0], bool)

    inv_lo = 1.0 / jnp.asarray(z_max, dt)
    inv_hi = 1.0 / jnp.asarray(z_min, dt)
    span = inv_hi - inv_lo

    cost_of = functools.partial(
        _cost_of_inv_depth,
        ref_img=ref_img, nbr_imgs=nbr_imgs, rels=rels, K=K, rays=rays,
        nbr_valid=nbr_valid, window_radius=window_radius,
    )

    key, k0 = jax.random.split(key)
    inv = inv_lo + span * jax.random.uniform(k0, (h, w), dt)
    if init_depth is not None:
        seed_inv = 1.0 / jnp.maximum(init_depth.astype(dt), 1e-9)
        seed_ok = (
            jnp.isfinite(seed_inv)
            & (seed_inv >= inv_lo) & (seed_inv <= inv_hi)
            & (jnp.ones((h, w), bool) if init_valid is None else init_valid)
        )
        inv = jnp.where(seed_ok, seed_inv, inv)
    cost = cost_of(inv)

    ys, xs = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    checker = ((ys + xs) % 2).astype(jnp.int32)  # 0 = red, 1 = black

    def half_iter(carry, inputs):
        inv, cost = carry
        parity, it, k = inputs
        active = checker == parity
        # propagation candidates: 4-neighborhood depths (edge-clamped rolls)
        shifts = [
            jnp.roll(inv, 1, axis=0), jnp.roll(inv, -1, axis=0),
            jnp.roll(inv, 1, axis=1), jnp.roll(inv, -1, axis=1),
        ]
        # random search: geometric shrink of the search window + full-range
        scale = span * (0.5 ** (it.astype(dt) + 1.0))
        k1, k2 = jax.random.split(k)
        rand_local = inv + scale * (
            2.0 * jax.random.uniform(k1, (h, w), dt) - 1.0
        )
        rand_full = inv_lo + span * jax.random.uniform(k2, (h, w), dt)
        cands = jnp.stack(shifts + [rand_local, rand_full])  # (C, H, W)
        cands = jnp.clip(cands, inv_lo, inv_hi)

        def score(c):
            return cost_of(c)

        ccosts = jax.lax.map(score, cands)  # (C, H, W)
        ci = jnp.argmin(ccosts, axis=0)
        cbest = jnp.take_along_axis(ccosts, ci[None], axis=0)[0]
        cinv = jnp.take_along_axis(cands, ci[None], axis=0)[0]
        better = active & (cbest < cost)
        inv = jnp.where(better, cinv, inv)
        cost = jnp.where(better, cbest, cost)
        return (inv, cost), None

    parities = jnp.tile(jnp.array([0, 1], jnp.int32), iterations)
    its = jnp.repeat(jnp.arange(iterations, dtype=jnp.int32), 2)
    keys = jax.random.split(key, 2 * iterations)
    (inv, cost), _ = jax.lax.scan(
        half_iter, (inv, cost), (parities, its, keys)
    )

    depth = 1.0 / jnp.maximum(inv, 1e-9)
    valid = cost <= max_cost
    return depth, cost, valid
