"""Dense-stereo throughput on TPU: plane sweep, SGM aggregate, PatchMatch.

Measures the three depth engines on a synthetic 480x640 5-neighbor problem
(the MVS ladder's working resolution scale). Timing: explicit
block_until_ready over fresh perturbed inputs — each op takes hundreds of
ms, so dispatch overhead is negligible and no scan-chaining is needed (the
nested-scan chain harness used previously could crash the remote TPU
worker on the larger dense graphs).

Run directly: python bench_suite/mvs_bench.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

H, W, N, D = 480, 640, 5, 96
ITERS = 8


def timeit(f, n=3):
    """Dependency-chained timing with ONE host value fetch at the end.

    Through the remote-TPU tunnel neither block_until_ready nor per-rep
    scalar fetches give reliable per-op walls (block returns early; per-rep
    fetches serialize tunnel round trips into the measurement). Chaining —
    each rep's input perturbed by the previous rep's output — forces the
    device to execute all n reps back to back; the single final fetch
    bounds the batch. f takes a scalar jax carry and must fold it into its
    input."""

    def leaf(x):
        return jax.tree_util.tree_leaves(x)[0]

    float(jnp.ravel(leaf(f(jnp.float32(0.0))))[0])  # compile + warm
    t0 = time.perf_counter()
    c = jnp.float32(0.0)
    for _ in range(n):
        c = jnp.ravel(leaf(f(c)))[0] * 1e-20
    float(c)
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((H, W)).astype(np.float32))
    nbrs = jnp.asarray(rng.random((N, H, W)).astype(np.float32))
    poses_n = jnp.asarray((rng.random((N, 6)) * 0.1).astype(np.float32))
    pose_r = jnp.zeros(6, jnp.float32)
    intr = jnp.asarray([500.0, W / 2, H / 2, 0, 0, 0, 0], jnp.float32)
    planes = jnp.asarray(
        1.0 / np.linspace(1 / 20.0, 1 / 5.0, D).astype(np.float32)
    )

    from sfm_mvs_pipeline_tpu.mvs.plane_sweep import sweep_cost_volume
    from sfm_mvs_pipeline_tpu.mvs.sgm import sgm_aggregate
    from sfm_mvs_pipeline_tpu.mvs.patchmatch import patchmatch_depth

    dt = timeit(lambda c: sweep_cost_volume(
        ref * (1 + c), nbrs, pose_r, poses_n, intr, planes))
    rate = H * W * N * D / dt / 1e9
    print(f"plane sweep  {H}x{W} x{N}nbr x{D}planes: {dt*1e3:8.1f} ms "
          f"({rate:6.2f} Gpx-plane-nbr/s)", flush=True)

    cv = sweep_cost_volume(ref, nbrs, pose_r, poses_n, intr, planes)
    dt = timeit(lambda c: sgm_aggregate(cv * (1 + c)))
    print(f"SGM 4-path   {D}x{H}x{W} volume:       {dt*1e3:8.1f} ms "
          f"({H*W*D/dt/1e9:6.2f} Gpx-plane/s)", flush=True)

    dt = timeit(lambda c: patchmatch_depth(
        ref * (1 + c), nbrs, pose_r, poses_n, intr, 5.0, 20.0,
        jax.random.PRNGKey(0), iterations=ITERS)[0])
    evals = H * W * N * 6 * 2 * ITERS  # px * nbrs * cands * parities * iters
    print(f"PatchMatch   {H}x{W} x{N}nbr x{ITERS}it:   {dt*1e3:8.1f} ms "
          f"({evals/dt/1e9:6.2f} Gpatch-evals/s)", flush=True)


if __name__ == "__main__":
    main()
