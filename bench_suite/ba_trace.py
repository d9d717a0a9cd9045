"""r5: capture a REAL jax.profiler trace of the BA device iteration
(VERDICT item 3 — the einsum-bisection probes were shown confoundable in
r4, commit ec8089e; this is the trace-backed replacement).

Runs the bench BA problem (159k obs / 20k pts / 12 shots) with ftol=0 so
all 20 LM iterations execute, captures an xplane trace, and prints the
top device ops by self time via xprof's raw-to-tool converter.
"""

import glob
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
    from bench_suite.ba_bench import make_problem
    from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig, run_bundle_adjustment

    prob = make_problem()
    args = (
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"],
    )
    cfg = BAConfig(max_iterations=20, function_tolerance=0.0)
    out = run_bundle_adjustment(*args, config=cfg)  # compile + warm
    print("warm cost", float(np.asarray(out["cost"])), "iters",
          int(out["iterations"]), flush=True)

    trace_dir = "/tmp/ba_trace"
    os.system(f"rm -rf {trace_dir}")
    with jax.profiler.trace(trace_dir):
        out = run_bundle_adjustment(*args, config=cfg)
        float(np.asarray(out["cost"]))
    print("trace captured", flush=True)

    xs = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xs, flush=True)
    if not xs:
        return

    # op-level table via xprof
    try:
        from xprof.convert import raw_to_tool_data as rtd

        for tool in ("hlo_stats", "op_profile"):
            try:
                data, _ = rtd.xspace_to_tool_data(xs, tool, {})
                fn = f"/tmp/ba_trace_{tool}.out"
                mode = "wb" if isinstance(data, bytes) else "w"
                with open(fn, mode) as f:
                    f.write(data)
                print(f"wrote {fn} ({len(data)} bytes)", flush=True)
            except Exception as e:
                print(f"{tool} failed: {type(e).__name__}: {e}", flush=True)
    except Exception as e:
        print("xprof convert import failed:", e, flush=True)


if __name__ == "__main__":
    main()
