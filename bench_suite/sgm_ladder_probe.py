"""r5 probe: --sgm at the reference's 3200-px ladder via the staged SGM.

Runs rectified_pair_depth(use_sgm=True) at 1920x1080x96 and 3200x1800x96 on
the real chip (the r4 fused form OOM'd at 3200 at any level count) and
reports wall/quality on the synthetic slanted-plane scene used by
bench_suite/dense_highres.py.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from sfm_mvs_pipeline_tpu.mvs.rectified import rectified_pair_depth
from sfm_mvs_pipeline_tpu.ops.pose import aa_to_rotmat_np


def make_scene(h, w, f):
    """Slanted textured plane n.p = 8 (n = (-0.15, -0.08, 1)) seen by two
    laterally-displaced cameras; both images EXACTLY ray-cast against the
    plane so ground-truth depth is analytic."""
    rng = np.random.default_rng(3)
    b = 0.3
    pose_r = np.zeros(6, np.float32)
    pose_n = np.zeros(6, np.float32)
    pose_n[3] = -b  # world->cam t: neighbor camera center at +b x

    tex = rng.random((2 * h, 2 * w)).astype(np.float32)
    tex = (
        tex
        + np.roll(tex, 1, 0) + np.roll(tex, -1, 0)
        + np.roll(tex, 1, 1) + np.roll(tex, -1, 1)
    ) / 5.0

    def sample(u, v):
        """Texture is parameterized by REF-image pixel coords."""
        ui = np.clip(u * 2, 0, 2 * w - 2)
        vi = np.clip(v * 2, 0, 2 * h - 2)
        u0 = ui.astype(int); v0 = vi.astype(int)
        fu = ui - u0; fv = vi - v0
        return (
            tex[v0, u0] * (1 - fu) * (1 - fv)
            + tex[v0, u0 + 1] * fu * (1 - fv)
            + tex[v0 + 1, u0] * (1 - fu) * fv
            + tex[v0 + 1, u0 + 1] * fu * fv
        )

    ys, xs = np.meshgrid(
        np.arange(h, dtype=np.float64), np.arange(w, dtype=np.float64),
        indexing="ij",
    )
    X = (xs - w / 2) / f
    Y = (ys - h / 2) / f
    # ref camera at origin: ray t*(X, Y, 1) hits n.p = 8 at depth
    z = 8.0 / (1.0 - 0.15 * X - 0.08 * Y)
    ref = sample(xs, ys).astype(np.float32)

    # neighbor ray-cast: ray C_n + t*(X, Y, 1), C_n = (b, 0, 0)
    t_n = (8.0 + 0.15 * b) / (1.0 - 0.15 * X - 0.08 * Y)
    xw = b + t_n * X
    yw = t_n * Y
    zw = t_n
    u_ref = f * xw / zw + w / 2
    v_ref = f * yw / zw + h / 2
    nbr = sample(u_ref, v_ref).astype(np.float32)
    return ref, nbr, pose_r, pose_n, z


def run(h, w, n_levels=96):
    f = 0.9 * w
    ref, nbr, pose_r, pose_n, z_true = make_scene(h, w, f)
    intr = np.array([f, w / 2, h / 2, 0, 0, 0, 0], np.float32)
    z_lo, z_hi = 5.0, 14.0
    from sfm_mvs_pipeline_tpu.mvs.rectified import derive_max_disp

    md = derive_max_disp(pose_r, pose_n[None], f, z_lo, w)
    print(f"--- {w}x{h}x{n_levels} max_disp {md}", flush=True)
    t0 = time.perf_counter()
    d, c, v = rectified_pair_depth(
        jnp.asarray(ref), jnp.asarray(nbr), jnp.asarray(pose_r),
        jnp.asarray(pose_n), jnp.asarray(intr), z_lo, z_hi,
        n_levels=n_levels, max_disp=md, use_sgm=True,
    )
    d = np.asarray(d); v = np.asarray(v)
    t1 = time.perf_counter() - t0
    # second call = warm
    t0 = time.perf_counter()
    d2, c2, v2 = rectified_pair_depth(
        jnp.asarray(ref), jnp.asarray(nbr), jnp.asarray(pose_r),
        jnp.asarray(pose_n), jnp.asarray(intr), z_lo, z_hi,
        n_levels=n_levels, max_disp=md, use_sgm=True,
    )
    d2 = np.asarray(d2)
    t2 = time.perf_counter() - t0
    err = np.abs(d[v] - z_true[v]) / z_true[v]
    print(
        f"cold {t1:.1f}s warm {t2:.1f}s valid {v.mean()*100:.0f}% "
        f"med rel err {np.median(err)*100:.3f}%",
        flush=True,
    )


if __name__ == "__main__":
    run(1080, 1920)
    run(1800, 3200)
