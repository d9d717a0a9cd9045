"""r5 (VERDICT item 4): dissect the insel frontend's 2.4 s warm cost.

The insel phase log attributes 2.4 of the 5.3 s warm wall to
"load images + sift_features". Times each piece separately, warm,
including repeated calls to expose per-call dispatch/fetch structure.
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

import jax.numpy as jnp


def main():
    from sfm_mvs_pipeline_tpu.utils.images import load_gray_batch

    paths = [f"/root/reference/images/insel/{i}.jpg" for i in (1, 2, 3)]
    t0 = time.perf_counter()
    imgs, (w, h) = load_gray_batch(paths)
    print(f"load_gray_batch: {time.perf_counter()-t0:.3f}s "
          f"({w}x{h})", flush=True)

    from sfm_mvs_pipeline_tpu.ops.sift import sift_features

    imgs_d = jnp.asarray(imgs)
    for rep in range(3):
        t0 = time.perf_counter()
        feats = sift_features(
            imgs_d, max_features=16384, contrast_threshold=0.09
        )
        np.asarray(feats["descriptors"])
        np.asarray(feats["valid"])
        print(f"sift_features rep{rep}: {time.perf_counter()-t0:.3f}s",
              flush=True)

    # inner stages
    from sfm_mvs_pipeline_tpu.ops import sift as S

    names = [n for n in dir(S) if n.startswith("_sift")]
    print("stages:", names, flush=True)


if __name__ == "__main__":
    main()
