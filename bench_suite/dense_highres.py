"""Dense rect engine at the reference resolution ladder (VERDICT r3 item 4).

The reference runs openMVS at maxResolution 3200 (MVS.h:58-60); r3 only
ever measured the dense stack at 480x640. This times the rectified engine
(and the consensus fuse) on synthetic lateral-motion views at 1080p and at
3200x1800, with the geometry-derived disparity bound, on the real chip.

Memory notes at 3200x1800, N=5, 96 levels: per-pair cost volume 2.2 GB f32
(streamed per neighbor by lax.map), consensus-fuse peak (N, H, W) ~115 MB
after the r4 rewrite (was ~2.3 GB with the (N, N, H, W) broadcast).
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import sys
import time

import numpy as np


def run_at(h, w, n_nbrs=5, n_levels=96):
    import jax
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.mvs.rectified import derive_max_disp, rectified_depth

    f = 1.2 * max(h, w)
    rng = np.random.default_rng(0)
    # textured fronto-parallel plane at z in [8, 12], lateral camera track
    tex = rng.random((2048, 2048)).astype(np.float32)
    import cv2

    tex = cv2.GaussianBlur(tex, (0, 0), 2.0)
    centers = np.linspace(-0.6, 0.6, n_nbrs + 1)
    grays = []
    for cx in centers:
        ys, xs = np.mgrid[0:h, 0:w].astype(np.float64)
        X = cx + (xs - w / 2) / f * 10.0
        Y = (ys - h / 2) / f * 10.0
        ui = ((X * 0.15 + 0.5) % 1.0 * 2047).astype(int)
        vi = ((Y * 0.15 + 0.5) % 1.0 * 2047).astype(int)
        grays.append(tex[vi, ui])
    grays = np.stack(grays).astype(np.float32)
    poses = np.zeros((n_nbrs + 1, 6), np.float32)
    poses[:, 3] = -centers

    r = 0
    nb = list(range(1, n_nbrs + 1))
    md = derive_max_disp(poses[r], poses[nb], f, 8.0, w)
    intr = jnp.asarray([f, w / 2, h / 2, 0, 0, 0, 0], jnp.float32)

    args = (
        jnp.asarray(grays[r]), jnp.asarray(grays[nb]),
        jnp.asarray(poses[r]), jnp.asarray(poses[nb]), intr,
    )

    def one(ref):
        d, c, v = rectified_depth(
            ref, args[1], args[2], args[3], args[4],
            jnp.float32(8.0), jnp.float32(12.0),
            n_levels=n_levels, max_disp=md,
        )
        return d

    t0 = time.perf_counter()
    d, c, v = rectified_depth(
        args[0], args[1], args[2], args[3], args[4],
        jnp.float32(8.0), jnp.float32(12.0), n_levels=n_levels, max_disp=md,
    )
    jax.block_until_ready(d)
    compile_s = time.perf_counter() - t0

    # honest warm timing: chained scan, 3 iterations (seconds-scale work)
    @jax.jit
    def chain(q):
        def body(carry, _):
            dd = one(q * (1.0 + carry * 1e-20))
            return jnp.ravel(dd)[0].astype(jnp.float32) * 1e-20 + carry, None

        cc, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=3)
        return cc

    float(chain(args[0]))
    t0 = time.perf_counter()
    float(chain(args[0]))
    per_view = (time.perf_counter() - t0) / 3

    dv = np.asarray(d)
    vv = np.asarray(v)
    med_err = float("nan")
    if vv.any():
        gt = 10.0  # plane depth for the reference camera (R=I, C on z=0)
        med_err = float(np.median(np.abs(dv[vv] - gt) / gt))
    return {
        "res": f"{w}x{h}",
        "max_disp": int(md),
        "levels": n_levels,
        "nbrs": n_nbrs,
        "compile_s": round(compile_s, 1),
        "s_per_view": round(per_view, 2),
        "valid_frac": round(float(vv.mean()), 3),
        "median_rel_depth_err": round(med_err, 5),
    }


def main() -> int:
    import jax

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    out = {"backend": jax.default_backend()}
    for h, w in ((1080, 1920), (1800, 3200)):
        try:
            out[f"{w}x{h}"] = run_at(h, w)
        except Exception as e:
            out[f"{w}x{h}"] = {"error": str(e)[:300]}
        print(f"{w}x{h}", out[f"{w}x{h}"], flush=True)
    print(json.dumps(out))
    with open("/tmp/dense_highres.json", "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
