import os
import sys

# -Pthreads must reach the environment BEFORE numpy/jax/cv2 initialize their
# OpenMP/BLAS pools (they read OMP_NUM_THREADS once at runtime init; setting
# it later only affects cv2 — ADVICE r3). The sitecustomize in this
# environment pre-imports jax, so pools may already exist; the early set
# here covers every interpreter where it can still take effect, and
# cli/app.py keeps the runtime caps (cv2.setNumThreads) as the fallback.
for _i, _a in enumerate(sys.argv):
    if _a.startswith("-Pthreads="):
        _v = _a.split("=", 1)[1]
        if _v.isdigit() and int(_v) > 0:
            # unconditional: the explicit CLI flag wins over ambient env
            # (ADVICE r4 — setdefault silently lost to CI-exported values)
            os.environ["OMP_NUM_THREADS"] = _v
            os.environ["OPENBLAS_NUM_THREADS"] = _v

from sfm_mvs_pipeline_tpu.cli.app import main  # noqa: E402

if __name__ == "__main__":
    sys.exit(main())
