"""r5 (VERDICT item 4): per-phase wall-clock accounting of the insel
sparse run — warm, in-process, second run — from AppLogger timestamps.

Prints the inter-line gaps > 50 ms of the SECOND run so the remaining
warm wall-clock is attributed line by line.
"""

import io
import os
import re
import sys
import time
import contextlib

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

    insel = "/root/reference/images/insel"
    out_dir = tempfile.mkdtemp(prefix="insel_phase_")
    argv = [
        "-Prun=photogrammetrie", f"-Pimage={insel}", f"-Pout={out_dir}",
        "-Pfeature-limit=0", "-Ploglevel=0",
    ]
    walls = []
    logs = []
    for run in range(2):
        buf = io.StringIO()
        t0 = time.perf_counter()
        with contextlib.redirect_stdout(buf):
            rc = cli_main(argv)
        walls.append(time.perf_counter() - t0)
        logs.append(buf.getvalue())
        print(f"run {run}: {walls[-1]:.2f}s rc={rc}", flush=True)

    # parse "[  12.345s]"-style elapsed stamps (AppLogger format)
    lines = logs[1].splitlines()
    ts = []
    pat = re.compile(r"(\d+\.\d+)s")
    for ln in lines:
        m = pat.search(ln[:40])
        if m:
            ts.append((float(m.group(1)), ln.strip()[:140]))
    print(f"\nsecond-run log lines with stamps: {len(ts)}")
    prev = None
    for t, ln in ts:
        if prev is not None and t - prev > 0.05:
            print(f"  +{t - prev:6.2f}s  {ln}", flush=True)
        prev = t
    shutil.rmtree(out_dir, ignore_errors=True)


if __name__ == "__main__":
    main()
