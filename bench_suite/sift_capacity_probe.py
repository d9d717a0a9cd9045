"""Isolate the TPU-worker fault at 32768-keypoint SIFT capacity (VERDICT r3
item 2).

Runs each stage in a SUBPROCESS so a worker crash is contained and
attributable:
  detect   -- _sift_detect (pyramid + extrema + per-octave/global top-k)
  topk     -- select_top_k alone at k=cap over an octave-sized score array
  describe -- _sift_describe_octave at k_sel=cap
  full     -- sift_features end to end

Usage: python bench_suite/sift_capacity_probe.py [stage] [cap]
With no args: orchestrates all stages x caps {8192, 16384, 32768} serially.
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import os
import subprocess
import sys
import time


def _stage(stage: str, cap: int) -> int:
    import numpy as np

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    # high-texture synthetic image at insel-like resolution
    rng = np.random.default_rng(0)
    H, W = 405, 720
    img = rng.random((1, H, W)).astype(np.float32)
    import cv2

    img[0] = cv2.GaussianBlur(img[0], (0, 0), 1.0)
    imgs = jnp.asarray(img)

    t0 = time.perf_counter()
    if stage == "topk":
        from sfm_mvs_pipeline_tpu.ops.topk import select_top_k

        scores = jnp.asarray(
            rng.random((1, 5 * (2 * H) * (2 * W))).astype(np.float32)
        )
        v, i = select_top_k(scores, cap)
        jax.block_until_ready(v)
        print(f"OK topk cap={cap} n={scores.shape[-1]} sum={float(v.sum()):.1f}")
    elif stage == "detect":
        from sfm_mvs_pipeline_tpu.ops.sift import _sift_detect

        g, cand = _sift_detect(imgs, cap, 3, 0.02, 10.0, True, 5)
        jax.block_until_ready(cand["x"])
        print(f"OK detect cap={cap} n_valid={int(cand['n_valid'][0])}")
    elif stage == "describe":
        from sfm_mvs_pipeline_tpu.ops.sift import (
            _sift_describe_octave,
            _sift_detect,
        )

        g, cand = _sift_detect(imgs, cap, 3, 0.02, 10.0, True, 5)
        cand_k = {k: v for k, v in cand.items() if k != "n_valid"}
        ang, desc, mine = _sift_describe_octave(g[0], cand_k, 0)
        jax.block_until_ready(desc)
        print(f"OK describe cap={cap} described={int(mine.sum())}")
    elif stage == "full":
        from sfm_mvs_pipeline_tpu.ops.sift import sift_features

        out = sift_features(imgs, max_features=cap, contrast_threshold=0.02)
        jax.block_until_ready(out["descriptors"])
        print(f"OK full cap={cap} n={int(out['valid'].sum())}")
    else:
        print(f"unknown stage {stage}")
        return 2
    print(f"  {time.perf_counter() - t0:.1f}s backend={jax.default_backend()}")
    return 0


def main() -> int:
    if len(sys.argv) == 3:
        return _stage(sys.argv[1], int(sys.argv[2]))

    results = {}
    for cap in (8192, 16384, 32768):
        for stage in ("topk", "detect", "describe", "full"):
            key = f"{stage}@{cap}"
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), stage, str(cap)],
                capture_output=True, text=True, timeout=1200,
            )
            ok = p.returncode == 0
            tail = (p.stdout + p.stderr).strip().splitlines()
            msg = tail[-1][:160] if tail else ""
            results[key] = (ok, p.returncode, msg)
            print(f"{key}: rc={p.returncode} {'OK' if ok else 'FAIL'} | {msg}",
                  flush=True)
            if not ok and stage in ("topk", "detect"):
                # the later stages depend on this one; still try them
                pass
    return 0


if __name__ == "__main__":
    sys.exit(main())
