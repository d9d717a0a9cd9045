"""Headline benchmarks + speed-of-light rooflines on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

value       = image pairs matched per second on one TPU chip
              (8192x8192 descriptors, 128-d f32, full 2-NN + ratio test)
vs_baseline = speedup over cv2.BFMatcher.knnMatch(k=2) on the same data on
              this host's CPU (measured live each run).
extra       = the rest of the tracked metric set (VERDICT r2 items 3/7):
              match %-of-speed-of-light (vs live-measured MXU/VPU/HBM
              floors), BA iters/s + latency-bound note, dense ms/view for
              the rectified engine, SGM ms, PatchMatch s/view, and the
              insel sparse end-to-end seconds when the dataset and time
              budget allow.

Timing methodology: every device measurement is a jit'ed scan whose every
iteration DEPENDS on the previous one (input perturbed by the running
carry) and ends in a host value fetch — through the remote-TPU tunnel
neither dispatch pipelining nor lazy execution can inflate the numbers
(block_until_ready returns EARLY there; only a value fetch bounds work).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

F, D = 8192, 128
TPU_ITERS = 30
RETRIES = 3
T_START = time.perf_counter()


def _chain(f, x, n):
    """Mean seconds/iteration of f under the dependency-chained scan."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1.0 + c * 1e-20))
            return jnp.ravel(r)[0].astype(jnp.float32) * 1e-20 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chain(x))  # compile + warm
    t0 = time.perf_counter()
    float(chain(x))  # value fetch forces completion
    return (time.perf_counter() - t0) / n


def _bench_match(dq, dt_arr):
    import jax
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.ops.matching import ratio_test_mask
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    dq_d = jnp.asarray(dq)
    dt_d = jnp.asarray(dt_arr)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)

    use_pallas = jax.default_backend() == "tpu"

    def one(q):
        if use_pallas:
            idx, best, second = two_nn_pallas(q, dt_d, vq, vt)
        else:
            from sfm_mvs_pipeline_tpu.ops.matching import two_nn_jnp

            idx, best, second = two_nn_jnp(q, dt_d, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    dt_s = _chain(one, dq_d, TPU_ITERS)

    # ORB path: +-1 Hamming expansion matched as bf16 (exact, single MXU
    # pass, D=256) — the binary-descriptor headline
    ham_rate = None
    if use_pallas:

        dqb = jnp.sign(dq_d).astype(jnp.bfloat16)
        dqb = jnp.concatenate([dqb, dqb], axis=1)  # D=256 like rBRIEF
        dtb = jnp.sign(dt_d).astype(jnp.bfloat16)
        dtb = jnp.concatenate([dtb, dtb], axis=1)

        def one_h(q):
            # the chain's carry perturbation promotes to f32; cast back so
            # the kernel sees bf16 (+-1 values survive the cast exactly)
            idx, best, second = two_nn_pallas(
                q.astype(jnp.bfloat16), dtb, vq, vt
            )
            return best * ratio_test_mask(best, second, vq)

        t_h = _chain(one_h, dqb, TPU_ITERS)
        ham_rate = 1.0 / t_h
    return 1.0 / dt_s, dt_s, ham_rate


def _floors():
    """Live MXU / VPU / HBM floors on this chip (seconds-normalized rates)."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # MXU: square bf16 matmul (4096^3) — compute-bound (HBM traffic 100 MB
    # vs 137 GFLOP), unlike the thin kernel-shaped dot whose 268 MB output
    # write makes it an HBM benchmark
    M = 4096
    a = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)
    b = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(jnp.bfloat16)

    def mm(x):
        return jax.lax.dot_general(
            x, b, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT,
        ).astype(jnp.bfloat16)

    t = _chain(mm, a, 20)
    mxu = 2 * M * M * M / t  # flop/s

    # VPU: 96 chained elementwise ops per element on an 8 MB array so the
    # measurement is op-bound, not HBM-bound
    x = jnp.asarray(rng.normal(size=(1024, 2048)).astype(np.float32))

    def vop(v):
        for _ in range(32):
            v = jnp.minimum(jnp.maximum(v * 1.000001, 0.25 * v), 3e38)
        return v

    t = _chain(vop, x, 20)
    vpu = 96 * x.size / t  # op/s

    # HBM: read+write of a 256 MB buffer
    y = jnp.asarray(rng.normal(size=(64, 1024, 1024)).astype(np.float32))

    def cp(v):
        return v + 1.0

    t = _chain(cp, y, 20)
    hbm = 2 * y.size * 4 / t  # byte/s
    return mxu, vpu, hbm


def _match_roofline(measured_s, mxu, vpu, hbm):
    """Speed-of-light accounting for the 2-NN kernel.

    pct = (time the kernel's irreducible MXU work takes at this chip's
    DEMONSTRATED matmul rate, same measurement harness) / measured total.
    The irreducible work is the bf16 split dot (2 * F * F * 2D flops); the
    rest (per-entry top-2 merge on the VPU, ~6 ops/entry, and target-tile
    streaming) is implementation overhead the percentage charges against
    the kernel. vpu/hbm model terms are reported for transparency but the
    chained-dependency harness UNDERSTATES pure-VPU throughput (latency,
    not throughput, dominates dependent scalar chains), so they are not
    used as the denominator."""
    mxu_t = 2 * F * F * (2 * D) / mxu
    vpu_t = 6 * F * F / vpu
    hbm_t = (F / 1024) * (F * 2 * D * 2) / hbm  # t tiles re-read per q tile
    return mxu_t / measured_s * 100.0, {
        "mxu_ms": mxu_t * 1e3, "vpu_ms": vpu_t * 1e3, "hbm_ms": hbm_t * 1e3,
    }


def _bench_ba():
    import jax

    from bench_suite.ba_bench import make_problem
    from sfm_mvs_pipeline_tpu.sfm.ba import BAConfig, run_bundle_adjustment

    prob = make_problem()
    args = (
        prob["points"], prob["poses"], prob["intr"], prob["cam_of_shot"],
        prob["obs_point"], prob["obs_shot"], prob["obs_uv"], prob["obs_w"],
        prob["intr_mask"],
    )
    cfg = BAConfig(max_iterations=20)
    out = run_bundle_adjustment(*args, config=cfg)  # compile + warm
    float(np.asarray(out["cost"]))
    t0 = time.perf_counter()
    out = run_bundle_adjustment(*args, config=cfg)
    cost = float(np.asarray(out["cost"]))  # fetch bounds the solve
    el = time.perf_counter() - t0
    iters = int(out["iterations"])
    return {
        "ba_obs": int(len(prob["obs_point"])),
        "ba_solve_s": round(el, 3),
        "ba_iters": iters,
        "ba_iters_per_s": round(iters / el, 2),
        "ba_cost": round(cost, 4),
    }


def _bench_dense():
    import jax
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.mvs.patchmatch import patchmatch_depth
    from sfm_mvs_pipeline_tpu.mvs.rectified import rectified_depth
    from sfm_mvs_pipeline_tpu.mvs.sgm import sgm_aggregate

    H, W, N, Dp = 480, 640, 5, 96
    rng = np.random.default_rng(0)
    ref = jnp.asarray(rng.random((H, W)).astype(np.float32))
    nbrs = jnp.asarray(rng.random((N, H, W)).astype(np.float32))
    pn = np.zeros((N, 6), np.float32)
    pn[:, 3] = np.linspace(-0.6, 0.6, N)
    pn[:, 4] = 0.05
    poses_n = jnp.asarray(pn)
    pose_r = jnp.zeros(6, jnp.float32)
    intr = jnp.asarray([500.0, W / 2, H / 2, 0, 0, 0, 0], jnp.float32)

    out = {}
    t = _chain(
        lambda r: rectified_depth(
            r, nbrs, pose_r, poses_n, intr, 5.0, 20.0, n_levels=Dp
        )[0],
        ref, 5,
    )
    out["dense_rect_ms_per_view"] = round(t * 1e3, 1)

    cv = jnp.asarray(rng.random((Dp, H, W)).astype(np.float32))
    t = _chain(lambda v: sgm_aggregate(v), cv, 5)
    out["sgm_ms"] = round(t * 1e3, 1)

    # PatchMatch at the r2 VERDICT's comparison size (360x202, 3 nbrs):
    # classic random-init 8-iteration schedule, and the pipeline's default
    # rect-seeded 2-iteration schedule
    h2, w2 = 202, 360
    ref2 = jnp.asarray(rng.random((h2, w2)).astype(np.float32))
    nbrs2 = jnp.asarray(rng.random((3, h2, w2)).astype(np.float32))
    t = _chain(
        lambda r: patchmatch_depth(
            r, nbrs2, pose_r, poses_n[:3], intr, 5.0, 20.0,
            jax.random.PRNGKey(0), iterations=8,
        )[0],
        ref2, 2,
    )
    out["patchmatch_s_per_view"] = round(t, 2)

    def seeded(r):
        sd, _sc, sv = rectified_depth(
            r, nbrs2, pose_r, poses_n[:3], intr, 5.0, 20.0, n_levels=Dp
        )
        return patchmatch_depth(
            r, nbrs2, pose_r, poses_n[:3], intr, 5.0, 20.0,
            jax.random.PRNGKey(0), init_depth=sd, init_valid=sv,
            iterations=2,
        )[0]

    t = _chain(seeded, ref2, 2)
    out["patchmatch_seeded_s_per_view"] = round(t, 2)
    return out


def _bench_insel():
    """Sparse end-to-end CLI wall-clock on the insel dataset (full res,
    unlimited feature limit — the reference fast-test workload)."""
    insel = "/root/reference/images/insel"
    if not os.path.isdir(insel):
        return {}
    import shutil
    import tempfile

    from sfm_mvs_pipeline_tpu.cli.app import main as cli_main

    out_dir = tempfile.mkdtemp(prefix="bench_insel_")
    t0 = time.perf_counter()
    rc = cli_main(
        [
            "-Prun=photogrammetrie", f"-Pimage={insel}", f"-Pout={out_dir}",
            "-Pfeature-limit=0", "-Ploglevel=4",
        ]
    )
    el = time.perf_counter() - t0
    res = {"insel_sparse_e2e_s": round(el, 1), "insel_rc": rc}
    shutil.rmtree(out_dir, ignore_errors=True)
    return res


def _bench_cv(dq, dt_arr):
    import cv2

    bf = cv2.BFMatcher(cv2.NORM_L2)
    t0 = time.perf_counter()
    knn = bf.knnMatch(dq, dt_arr, k=2)
    dt_s = time.perf_counter() - t0
    n = sum(
        1 for m2 in knn if len(m2) == 2 and m2[0].distance < 0.7 * m2[1].distance
    )
    return 1.0 / dt_s, n


def main() -> int:
    # persistent compile cache: keeps round-over-round bench walls honest
    try:
        import jax

        jax.config.update(
            "jax_compilation_cache_dir",
            os.environ.get(
                "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass

    rng = np.random.default_rng(0)
    dq = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt_arr = np.abs(rng.normal(size=(F, D))).astype(np.float32)
    dt_arr[: F // 4] = dq[: F // 4] + rng.normal(
        size=(F // 4, D)
    ).astype(np.float32) * 0.01

    cv_rate, _cv_matches = _bench_cv(dq, dt_arr)

    last_err = None
    for _attempt in range(RETRIES):
        try:
            tpu_rate, match_s, ham_rate = _bench_match(dq, dt_arr)
            break
        except Exception as e:  # tunnel flake: retry
            last_err = e
            time.sleep(20)
    else:
        print(
            json.dumps(
                {
                    "metric": "matched_pairs_per_s_per_chip",
                    "value": 0.0,
                    "unit": f"pairs/s ({F}x{F}x{D} 2-NN+ratio)",
                    "vs_baseline": 0.0,
                    "error": str(last_err),
                }
            )
        )
        return 1

    extra = {}
    if ham_rate:
        extra["match_hamming_pairs_per_s"] = round(ham_rate, 1)
    try:
        mxu, vpu, hbm = _floors()
        pct, parts = _match_roofline(match_s, mxu, vpu, hbm)
        extra["match_pct_speed_of_light"] = round(pct, 1)
        extra["match_roofline"] = {
            "measured_ms": round(match_s * 1e3, 3),
            "model_mxu_ms": round(parts["mxu_ms"], 3),
            "model_vpu_ms": round(parts["vpu_ms"], 3),
            "model_hbm_ms": round(parts["hbm_ms"], 3),
            "mxu_tflops": round(mxu / 1e12, 1),
            "vpu_tops": round(vpu / 1e12, 2),
            "hbm_gbs": round(hbm / 1e9, 1),
        }
    except Exception as e:
        extra["floors_error"] = str(e)

    try:
        ba = _bench_ba()
        # latency-bound note: per-iter HBM traffic is a few MB and FLOPs a
        # few hundred M — at this problem size the LM loop is bound by the
        # sequential small-kernel dependency chain, not by any hw roofline
        ba["ba_bound"] = "latency (sequential LM chain; obs arrays ~5MB/iter)"
        extra.update(ba)
    except Exception as e:
        extra["ba_error"] = str(e)

    try:
        extra.update(_bench_dense())
    except Exception as e:
        extra["dense_error"] = str(e)

    try:
        if time.perf_counter() - T_START < 420:
            extra.update(_bench_insel())
        else:
            extra["insel_skipped"] = "time budget"
    except Exception as e:
        extra["insel_error"] = str(e)

    print(
        json.dumps(
            {
                "metric": "matched_pairs_per_s_per_chip",
                "value": round(tpu_rate, 2),
                "unit": f"pairs/s ({F}x{F}x{D} 2-NN+ratio; cv2 BF={cv_rate:.2f}/s)",
                "vs_baseline": round(tpu_rate / cv_rate, 1),
                "extra": extra,
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
