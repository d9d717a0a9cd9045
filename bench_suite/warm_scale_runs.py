"""r5 (VERDICT item 6): warm steady-state wall-clock at scale.

Runs the 24-view workload (r4's scale-validation setup: sequence-3,
feature-limit 800) TWICE in one process and reports both walls — the
second run is the steady-state frames/s figure that the r4 numbers
(315 s incl. first-time compiles) did not separate out.
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


def main():
    import shutil
    import tempfile

    from sfm_mvs_pipeline_tpu.cli.app import main as cli_main

    views = "/tmp/views24"
    if not os.path.isdir(views):
        print("views24 not found; render first (see tests/test_synthetic_gt)")
        return
    out_dir = tempfile.mkdtemp(prefix="warm24_")
    argv = [
        "-Prun=photogrammetrie", f"-Pimage={views}", f"-Pout={out_dir}",
        "-Pfeature-detector=sift", "-Pfeature-limit=800",
        "-Pfeature-matcher=bf", "-Pfeature-sequence=3", "-Ploglevel=3",
    ]
    n_views = len([f for f in os.listdir(views) if f.endswith(".jpg")])
    for run in range(2):
        t0 = time.perf_counter()
        rc = cli_main(argv)
        wall = time.perf_counter() - t0
        print(
            f"24-view sparse run {run}: {wall:.1f}s rc={rc} "
            f"({n_views / wall:.2f} frames/s)",
            flush=True,
        )
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
