"""BA throughput probe: LM iterations/s at the README reference scale
(~144k observations / 20k points / 12 cameras) on the current backend.

Prints a per-phase breakdown (verbose LM driver) plus the steady-state
seconds/iteration. Run directly: python bench_suite/ba_bench.py [solver]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_problem(n_shots=12, n_pts=20_000, seed=0, noise=0.5):
    rng = np.random.default_rng(seed)
    f, w, h = 1200.0, 1280, 960
    pts = rng.uniform(-4, 4, size=(n_pts, 3))
    pts[:, 2] += 12.0
    poses = np.zeros((n_shots, 6))
    obs_p, obs_s, obs_uv = [], [], []
    for s in range(n_shots):
        ang = (s - n_shots / 2) * 0.08
        poses[s] = [0, ang, 0, -2 * np.sin(ang), 0.02 * s, 12 - 12 * np.cos(ang)]
        R = np.array(
            [
                [np.cos(ang), 0, np.sin(ang)],
                [0, 1, 0],
                [-np.sin(ang), 0, np.cos(ang)],
            ]
        )
        pc = pts @ R.T + poses[s][3:]
        uv = pc[:, :2] / pc[:, 2:3] * f + [w / 2, h / 2]
        vis = (
            (pc[:, 2] > 0)
            & (uv[:, 0] > 0) & (uv[:, 0] < w)
            & (uv[:, 1] > 0) & (uv[:, 1] < h)
            & (rng.random(n_pts) < 0.75)
        )
        ids = np.nonzero(vis)[0]
        obs_p.append(ids)
        obs_s.append(np.full(len(ids), s))
        obs_uv.append(uv[ids] + rng.normal(size=(len(ids), 2)) * noise)
    obs_p = np.concatenate(obs_p).astype(np.int32)
    obs_s = np.concatenate(obs_s).astype(np.int32)
    obs_uv = np.concatenate(obs_uv)
    intr = np.array([[f * 1.02, w / 2, h / 2, 0, 0, 0, 0]])
    imask = np.zeros((1, 7))
    imask[0, 0] = 1.0
    pts_noisy = pts + rng.normal(size=pts.shape) * 0.01
    return dict(
        points=pts_noisy, poses=poses, intr=intr,
        cam_of_shot=np.zeros(n_shots, np.int32),
        obs_point=obs_p, obs_shot=obs_s, obs_uv=obs_uv,
        obs_w=np.ones(len(obs_p)), intr_mask=imask,
    )


def main():
    solver = sys.argv[1] if len(sys.argv) > 1 else None
    import jax

    from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig, run_bundle_adjustment

    prob = make_problem()
    print(
        f"backend={jax.default_backend()}  obs={len(prob['obs_point'])} "
        f"pts={len(prob['points'])} shots={len(prob['poses'])}"
    )
    kw = {}
    if solver:
        kw["config"] = BAConfig(max_iterations=20, solver=solver)
    else:
        kw["config"] = BAConfig(max_iterations=20)

    # warm-up (compile)
    out = run_bundle_adjustment(
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"], verbose=True, **kw,
    )
    print(f"warm-up: cost {out['cost']:.4g}  iters {out['iterations']}")

    t0 = time.perf_counter()
    out = run_bundle_adjustment(
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"], verbose=False, **kw,
    )
    el = time.perf_counter() - t0
    print(
        f"steady-state: {el:.3f}s total, {out['iterations']} iters "
        f"-> {el/out['iterations']*1e3:.1f} ms/iter "
        f"({out['iterations']/el:.2f} iters/s)  cost {out['cost']:.4g} "
        f"converged={out['converged']}"
    )


if __name__ == "__main__":
    main()
