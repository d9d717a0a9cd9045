"""Validate sgm_staged_hwd numerically ON THE REAL CHIP vs the lax.scan
reference, and isolate probe-scene quality (rect-only vs rect+SGM)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp

from sfm_mvs_pipeline_tpu.mvs.sgm import _scan_dir
from sfm_mvs_pipeline_tpu.ops.pallas.sgm_kernel import sgm_staged_hwd


def main():
    rng = np.random.default_rng(0)
    h, w, d = 64, 96, 37
    v = jnp.asarray(
        (rng.integers(0, 128, size=(h, w, d)) / 64.0).astype(np.float32)
    )
    p1, p2 = 0.0625, 0.5
    lr = jnp.swapaxes(_scan_dir(jnp.swapaxes(v, 0, 1), p1, p2), 0, 1)
    rl = jnp.swapaxes(
        _scan_dir(jnp.swapaxes(v, 0, 1)[::-1], p1, p2)[::-1], 0, 1
    )
    tb = _scan_dir(v, p1, p2)
    bt = _scan_dir(v[::-1], p1, p2)[::-1]
    want = np.asarray(lr + rl + tb + bt)

    out = np.asarray(sgm_staged_hwd(v, p1, p2))[:, :, :d]
    diff = np.abs(out - want)
    print(f"staged-vs-scan ON CHIP: max diff {diff.max():.6g} "
          f"frac>1e-4 {(diff > 1e-4).mean():.4f}", flush=True)

    # rect-only quality on the ladder probe scene at small size
    from bench_suite.sgm_ladder_probe import make_scene
    from sfm_mvs_pipeline_tpu.mvs.rectified import (
        derive_max_disp,
        rectified_pair_depth,
    )

    for use_sgm in (False, True):
        hh, ww = 360, 640
        f = 0.9 * ww
        ref, nbr, pose_r, pose_n, z_true = make_scene(hh, ww, f)
        intr = np.array([f, ww / 2, hh / 2, 0, 0, 0, 0], np.float32)
        md = derive_max_disp(pose_r, pose_n[None], f, 5.0, ww)
        dep, c, val = rectified_pair_depth(
            jnp.asarray(ref), jnp.asarray(nbr), jnp.asarray(pose_r),
            jnp.asarray(pose_n), jnp.asarray(intr), 5.0, 14.0,
            n_levels=96, max_disp=md, use_sgm=use_sgm,
        )
        dep = np.asarray(dep); val = np.asarray(val)
        err = np.abs(dep[val] - z_true[val]) / z_true[val]
        print(f"probe scene 640x360 use_sgm={use_sgm}: valid {val.mean()*100:.0f}% "
              f"med err {np.median(err)*100:.3f}%", flush=True)


if __name__ == "__main__":
    main()
