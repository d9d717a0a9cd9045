"""Sharded-stage scaling PROBE on a simulated N-device CPU mesh.

Multi-chip TPU hardware is not reachable from this environment. This probe
runs the sharded stages (pair-sharded matching, point-sharded fused BA) at
1/2/4/8 virtual devices and reports:

  * the per-device shard size (the quantity that divides linearly — on a
    real slice this is what sets per-chip time), and
  * the per-iteration communication payload (CONSTANT in the shard size:
    one psum of D^2+D+1 floats for BA, none for matching), and
  * wall-clock as a sanity check ONLY — a single virtual CPU "device"
    already uses the whole host's Eigen threadpool, so CPU-mesh wall-clock
    CANNOT demonstrate multi-chip speedup; do not read the speedup column
    as TPU scaling.

Run: python bench_suite/scaling_bench.py [max_devices]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MAXDEV = int(sys.argv[1]) if len(sys.argv) > 1 else 8

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "")
    + f" --xla_force_host_platform_device_count={MAXDEV}"
)

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

from ba_bench import make_problem  # noqa: E402
from sfm_mvs_pipeline_tpu.ops.pairs import unordered_pairs  # noqa: E402
from sfm_mvs_pipeline_tpu.parallel.ba import (  # noqa: E402
    run_bundle_adjustment_sharded,
)
from sfm_mvs_pipeline_tpu.parallel.matching import (  # noqa: E402
    match_pairs_sharded,
)
from sfm_mvs_pipeline_tpu.parallel.mesh import make_mesh  # noqa: E402
from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig  # noqa: E402


def bench_matching(n_dev: int, rng) -> float:
    """Seconds per full pair sweep (16 pairs, 1024x1024x64)."""
    S, F, D = 16, 1024, 64
    descs = np.abs(rng.normal(size=(S, F, D))).astype(np.float32)
    valid = np.ones((S, F), bool)
    pairs = unordered_pairs(S)[:16]
    mesh = make_mesh(n_dev)
    match_pairs_sharded(mesh, descs, valid, pairs, backend="jnp")  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        match_pairs_sharded(mesh, descs, valid, pairs, backend="jnp")
    return (time.perf_counter() - t0) / 3


def bench_ba(n_dev: int) -> float:
    """Seconds per fused distributed LM solve (fixed 6 iterations)."""
    prob = make_problem(n_shots=8, n_pts=8000, seed=3)
    mesh = make_mesh(n_dev)
    cfg = BAConfig(max_iterations=6, function_tolerance=0.0)
    args = (
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"],
    )
    run_bundle_adjustment_sharded(mesh, *args, config=cfg)  # compile
    t0 = time.perf_counter()
    for _ in range(3):
        out = run_bundle_adjustment_sharded(mesh, *args, config=cfg)
    el = (time.perf_counter() - t0) / 3
    assert np.isfinite(out["cost"])
    return el


def main():
    rng = np.random.default_rng(0)
    devs = [d for d in (1, 2, 4, 8) if d <= MAXDEV]
    n_pairs, n_pts, n_shots = 16, 8000, 8
    D = 6 * 8 + 7  # padded camera-system size at the BA problem's bucket
    print(
        f"{'devices':>8} {'pairs/dev':>10} {'pts/dev':>9} "
        f"{'psum floats/iter':>17} {'match s':>9} {'BA s':>9}"
    )
    for d in devs:
        tm = bench_matching(d, rng)
        tb = bench_ba(d)
        print(
            f"{d:>8} {n_pairs // d:>10} {n_pts // d:>9} "
            f"{D * D + D + 1:>17} {tm:>9.3f} {tb:>9.3f}"
        )
    print(
        "\nNote: per-device work divides linearly while communication stays"
        "\nconstant — the scaling signature. CPU-mesh wall-clock is a sanity"
        "\ncheck only (one virtual device already uses the whole host)."
    )


if __name__ == "__main__":
    main()
