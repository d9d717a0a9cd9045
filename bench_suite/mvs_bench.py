"""Dense-stereo throughput on TPU: plane sweep, SGM aggregate, PatchMatch.

Measures the three depth engines on a synthetic 480x640 5-neighbor problem
(the MVS ladder's working resolution scale). Timing uses the same
dependency-chained scan + host fetch methodology as bench.py so remote
-execution pipelining cannot inflate the numbers.

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


def chain_time(f, x, n=10):
    @jax.jit
    def chain(q):
        def body(c, _):
            out = f(q * (1 + c * 1e-20))
            return jnp.asarray(out, jnp.float32).ravel()[0] * 1e-9 + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c
    float(chain(x))
    t0 = time.perf_counter()
    float(chain(x))
    return (time.perf_counter() - t0) / n


def main():
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((H, W)).astype(np.float32))
    nbrs = jnp.asarray(rng.random((N, H, W)).astype(np.float32))
    poses_n = jnp.asarray(
        (rng.random((N, 6)) * 0.1).astype(np.float32)
    )
    pose_r = jnp.zeros(6, jnp.float32)
    intr = jnp.asarray([500.0, W / 2, H / 2, 0, 0, 0, 0], jnp.float32)
    planes = jnp.asarray(
        1.0 / np.linspace(1 / 20.0, 1 / 5.0, D).astype(np.float32)
    )

    from sfm_mvs_pipeline_tpu.mvs.plane_sweep import sweep_cost_volume
    from sfm_mvs_pipeline_tpu.mvs.sgm import sgm_aggregate
    from sfm_mvs_pipeline_tpu.mvs.patchmatch import patchmatch_depth

    dt = chain_time(lambda r: sweep_cost_volume(
        r, nbrs, pose_r, poses_n, intr, planes), ref, n=5)
    rate = H * W * N * D / dt / 1e9
    print(f"plane sweep  {H}x{W} x{N}nbr x{D}planes: {dt*1e3:8.1f} ms "
          f"({rate:6.2f} Gpx-plane-nbr/s)", flush=True)

    cv = sweep_cost_volume(ref, nbrs, pose_r, poses_n, intr, planes)
    jax.block_until_ready(cv)
    dt = chain_time(lambda v: sgm_aggregate(v), cv, n=5)
    print(f"SGM 4-path   {D}x{H}x{W} volume:       {dt*1e3:8.1f} ms "
          f"({H*W*D/dt/1e9:6.2f} Gpx-plane/s)", flush=True)

    dt = chain_time(lambda r: patchmatch_depth(
        r, nbrs, pose_r, poses_n, intr, 5.0, 20.0, jax.random.PRNGKey(0),
        iterations=ITERS)[0], ref, n=3)
    evals = H * W * N * 6 * 2 * ITERS  # px * nbrs * cands * parities * iters
    print(f"PatchMatch   {H}x{W} x{N}nbr x{ITERS}it:   {dt*1e3:8.1f} ms "
          f"({evals/dt/1e9:6.2f} Gpatch-evals/s)", flush=True)


if __name__ == "__main__":
    main()
