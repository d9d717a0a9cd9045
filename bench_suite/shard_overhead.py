"""shard_map dispatch overhead on the REAL chip (VERDICT r3 item 8).

Multi-chip hardware is unavailable here, so the one scaling datum real
hardware can give is the constant cost of the sharded code paths
themselves: run the pair-sharded matching (parallel/matching.py) and the
points-sharded fused BA (parallel/ba.py) on a 1-DEVICE TPU mesh and
compare against the plain single-chip calls on the same inputs. The
difference is the shard_map + psum machinery's fixed overhead — the cost
every chip pays before ICI speedups kick in.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _wall(fn, fetch, reps=3):
    """Best-of-reps wall seconds of fn() bounded by a host value fetch."""
    fn_out = fn()
    fetch(fn_out)  # warm/compile
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        fetch(fn())
        best = min(best, time.perf_counter() - t0)
    return best


def main() -> int:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from ba_bench import make_problem
    from sfm_mvs_pipeline_tpu.ops.matching import match_pairs_batch
    from sfm_mvs_pipeline_tpu.parallel.ba import run_bundle_adjustment_sharded
    from sfm_mvs_pipeline_tpu.parallel.matching import match_pairs_sharded
    from sfm_mvs_pipeline_tpu.parallel.mesh import make_mesh
    from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig, run_bundle_adjustment

    out = {"backend": jax.default_backend(), "devices": len(jax.devices())}
    mesh = make_mesh(1)

    # ---------------- pair-sharded matching vs plain (16 pairs, F=4096)
    F, D, S = 4096, 128, 8
    rng = np.random.default_rng(0)
    descs = jnp.asarray(np.abs(rng.normal(size=(S, F, D))).astype(np.float32))
    valid = jnp.ones((S, F), bool)
    pairs = jnp.asarray(
        [(a, b) for a in range(S) for b in range(a + 1, S)], jnp.int32
    )[:16]

    # identical fetch pattern on both sides (full host transfer of both
    # outputs) so the difference isolates the shard_map machinery
    t_plain = _wall(
        lambda: match_pairs_batch(descs, valid, pairs),
        lambda o: float(np.asarray(o[0]).sum() + np.asarray(o[1]).sum()),
    )
    t_shard = _wall(
        lambda: match_pairs_sharded(mesh, descs, valid, pairs),
        lambda o: float(np.asarray(o[0]).sum() + np.asarray(o[1]).sum()),
    )
    out["match_16pairs"] = {
        "plain_s": round(t_plain, 4),
        "sharded_1dev_s": round(t_shard, 4),
        "overhead_ms": round((t_shard - t_plain) * 1e3, 1),
        "overhead_pct": round((t_shard / t_plain - 1.0) * 100.0, 1),
    }
    print("match", out["match_16pairs"], flush=True)

    # ---------------- fused sharded BA vs plain device BA (full solves)
    prob = make_problem()
    cfg = BAConfig(max_iterations=20)
    args = (
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"],
    )

    t_plain_ba = _wall(
        lambda: run_bundle_adjustment(*args, config=cfg),
        lambda o: float(np.asarray(o["cost"])),
    )
    t_shard_ba = _wall(
        lambda: run_bundle_adjustment_sharded(mesh, *args, config=cfg),
        lambda o: float(np.asarray(o["cost"])),
    )
    out["ba_solve"] = {
        "plain_s": round(t_plain_ba, 4),
        "sharded_1dev_s": round(t_shard_ba, 4),
        "overhead_ms": round((t_shard_ba - t_plain_ba) * 1e3, 1),
        "overhead_pct": round((t_shard_ba / t_plain_ba - 1.0) * 100.0, 1),
    }
    print("ba", out["ba_solve"], flush=True)

    print(json.dumps(out))
    with open("/tmp/shard_overhead.json", "w") as f:
        json.dump(out, f)
    return 0


if __name__ == "__main__":
    sys.exit(main())
