"""Headline benchmarks + speed-of-light rooflines on one TPU chip.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, "extra": {...}}

value       = image pairs matched per second on one TPU chip
              (8192x8192 descriptors, 128-d f32, full 2-NN + ratio test)
vs_baseline = speedup over cv2.BFMatcher.knnMatch(k=2) on the same data on
              this host's CPU (measured live each run).
extra       = the tracked metric set: match roofline vs live-measured
              floors + measured merge floor, the batched production-path
              rate, BA iters/s, dense/SGM/PatchMatch timings, the insel
              sparse end-to-end wall, and measurement spread.

Timing methodology (r4): every device measurement is a jit'ed scan whose
every iteration DEPENDS on the previous one (input perturbed by the running
carry) and ends in a host value fetch — through the remote-TPU tunnel
neither dispatch pipelining nor lazy execution can inflate the numbers
(block_until_ready returns EARLY there; only a value fetch bounds work).
Sub-millisecond kernels are timed by the DIFFERENCE between two chain
lengths, (T(n2) - T(n1)) / (n2 - n1): the tunnel's ~25 ms fixed
dispatch+fetch cost cancels exactly. (The r3 numbers divided that constant
by the chain length instead, which buried the 0.1 ms match kernel under
~0.8 ms of per-iteration tunnel latency: the kernel "sped up" 10x in r4 by
measuring it honestly.) Each difference is taken between best-of-3 totals,
and the headline reports median/min/spread over 3 independent estimates.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

F, D = 8192, 128
RETRIES = 3
T_START = time.perf_counter()


def _chain_total(f, x, n, reps=3):
    """Best-of-reps total seconds for n chained iterations of f."""
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
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x))  # value fetch forces completion
        best = min(best, time.perf_counter() - t0)
    return best


def _diff(f, x, n1=16, n2=240, reps=3):
    """Seconds/iteration by chain-length difference (cancels the fixed
    per-dispatch tunnel cost)."""
    t1 = _chain_total(f, x, n1, reps)
    t2 = _chain_total(f, x, n2, reps)
    return (t2 - t1) / (n2 - n1)


def _chain(f, x, n):
    """Mean seconds/iteration for LARGE workloads (>= tens of ms/iter,
    where the fixed tunnel cost is negligible)."""
    return _chain_total(f, x, n, reps=1) / n


def _bench_match(dq, dt_arr):
    """Headline = the PRODUCTION batched path (match_pairs_batch: one fused
    Pallas dispatch for the whole pair batch, per-shot operand prep
    amortized) — r5, per VERDICT item 1. The single-pair wrapped call
    (which pays un-amortized per-call prep) is reported alongside."""
    import jax
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.ops.matching import (
        match_pairs_batch,
        ratio_test_mask,
    )
    from sfm_mvs_pipeline_tpu.ops.pallas.match_kernel import two_nn_pallas

    dq_d = jnp.asarray(dq)
    dt_d = jnp.asarray(dt_arr)
    vq = jnp.ones(F, bool)
    vt = jnp.ones(F, bool)

    use_pallas = jax.default_backend() == "tpu"

    if not use_pallas:
        from sfm_mvs_pipeline_tpu.ops.matching import two_nn_jnp

        def one_cpu(q):
            idx, best, second = two_nn_jnp(q, dt_d, vq, vt)
            return best * ratio_test_mask(best, second, vq)

        med = float(np.median([_diff(one_cpu, dq_d) for _ in range(3)]))
        return med, {"match_ms": round(med * 1e3, 4)}

    S = 8
    descs = jnp.stack([dq_d] + [dt_d + 0.01 * i for i in range(S - 1)])
    valid = jnp.ones((S, F), bool)
    pairs = jnp.asarray(
        [(a, b) for a in range(S) for b in range(a + 1, S)], jnp.int32
    )[:16]

    def batch(d):
        bi, mask = match_pairs_batch(d, valid, pairs)
        return mask.astype(jnp.float32)

    # 3 independent difference estimates -> median + spread (VERDICT r3
    # item 10: make run-to-run variance visible in one artifact)
    ests = [
        _diff(batch, descs, n1=4, n2=24) / len(pairs) for _ in range(3)
    ]
    med = float(np.median(ests))
    extra = {
        "match_ms_estimates": [round(e * 1e3, 4) for e in ests],
        "match_ms": round(med * 1e3, 4),
        "match_ms_min": round(min(ests) * 1e3, 4),
        "pipeline_match_ms_per_pair": round(med * 1e3, 4),
        "pipeline_match_pairs_per_s": round(1.0 / med, 1),
    }

    # single-pair wrapped call (per-call prep not amortized)
    def one(q):
        idx, best, second = two_nn_pallas(q, dt_d, vq, vt)
        return best * ratio_test_mask(best, second, vq)

    t_1 = _diff(one, dq_d)
    extra["match_single_pair_ms"] = round(t_1 * 1e3, 4)

    # exact mode (3-term split, ~3e-6 relative): one estimate
    def one_exact(q):
        idx, best, second = two_nn_pallas(q, dt_d, vq, vt, exact=True)
        return best * ratio_test_mask(best, second, vq)

    extra["match_exact_ms"] = round(_diff(one_exact, dq_d) * 1e3, 4)

    # ORB path: +-1 Hamming expansion matched as bf16 (exact, single MXU
    # pass, D=256) — the binary-descriptor headline, batched like the L2
    # production path
    dqb = jnp.sign(dq_d).astype(jnp.bfloat16)
    dqb = jnp.concatenate([dqb, dqb], axis=1)  # D=256 like rBRIEF
    descs_h = jnp.stack(
        [dqb] + [
            jnp.sign(dt_d + 0.01 * i).astype(jnp.bfloat16).repeat(2, axis=1)
            for i in range(S - 1)
        ]
    )

    def batch_h(d):
        # the chain's carry perturbation promotes to f32; cast back so
        # the kernel sees bf16 (+-1 values survive the cast exactly)
        bi, mask = match_pairs_batch(d.astype(jnp.bfloat16), valid, pairs)
        return mask.astype(jnp.float32)

    t_h = _diff(batch_h, descs_h, n1=4, n2=24) / len(pairs)
    extra["match_hamming_ms"] = round(t_h * 1e3, 4)
    extra["match_hamming_pairs_per_s"] = round(1.0 / t_h, 1)
    extra["_hamming_t"] = t_h  # for the D=256 roofline entry in main()
    return med, extra


def _merge_floor():
    """Measured VPU-merge floor: the kernel's exact merge loop with the dot
    replaced by ONE broadcast add — no MXU work at all. The kernel cannot
    run faster than max(MXU floor, this) without changing the algorithm."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TQ, TT, LANES = 2048, 1024, 128
    big = 3.0e38

    def kernel(q_ref, tn_ref, b_out, s_out, i_out, b_s, s_s, i_s):
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            b_s[...] = jnp.full((TQ, LANES), big, jnp.float32)
            s_s[...] = jnp.full((TQ, LANES), big, jnp.float32)
            i_s[...] = jnp.zeros((TQ, LANES), jnp.int32)

        s = q_ref[:, :1] + tn_ref[0, :][None, :]
        lane = jax.lax.broadcasted_iota(jnp.int32, (TQ, LANES), 1)
        best, second, bidx = b_s[...], s_s[...], i_s[...]
        for sub in range(TT // LANES):
            cand = s[:, sub * LANES : (sub + 1) * LANES]
            cidx = lane + (j * TT + sub * LANES)
            hi = jnp.maximum(best, cand)
            second = jnp.minimum(second, hi)
            bidx = jnp.where(cand < best, cidx, bidx)
            best = jnp.minimum(best, cand)
        b_s[...] = best
        s_s[...] = second
        i_s[...] = bidx

        @pl.when(j == pl.num_programs(1) - 1)
        def _():
            b_out[...] = b_s[...]
            s_out[...] = s_s[...]
            i_out[...] = i_s[...]

    q = jnp.zeros((F, 128), jnp.float32)
    tn = jnp.zeros((1, F), jnp.float32)

    @jax.jit
    def call(qx):
        outs = pl.pallas_call(
            kernel,
            grid=(F // TQ, F // TT),
            in_specs=[
                pl.BlockSpec((TQ, 128), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, TT), lambda i, j: (0, j), memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((TQ, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((TQ, LANES), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.float32),
                jax.ShapeDtypeStruct((F, LANES), jnp.int32),
            ],
            scratch_shapes=[
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, LANES), jnp.float32),
                pltpu.VMEM((TQ, LANES), jnp.int32),
            ],
        )(qx, tn)
        return outs[0]

    return _diff(call, q)


def _floors():
    """Live MXU / VPU / HBM floors on this chip, difference-timed."""
    import jax
    import jax.numpy as jnp

    rng = np.random.default_rng(1)
    # MXU: square bf16 matmul chain whose carry IS the bf16 product.
    # r5 fix: the generic multiplicative-carry harness (_chain_total)
    # promotes the operand to f32 (bf16 array x strong-f32 scalar), and XLA
    # then computes an f32 matmul as a 3-pass bf16 split — measured 60.4
    # TF/s vs the chip's real ~183 (bench_suite/match_fused_probe2.py).
    # That flapping floor is what produced the unexplained 62-72% r4
    # speed-of-light spread. A dedicated y <- y @ Q chain (Q orthogonal so
    # magnitudes stay bounded over hundreds of steps, bf16 output so no
    # promotion ever happens) keeps every pass a single bf16 matmul.
    M = 2048
    q_, _ = np.linalg.qr(rng.normal(size=(M, M)))
    b = jnp.asarray(q_.astype(np.float32)).astype(jnp.bfloat16)
    x0 = jnp.asarray(rng.normal(size=(M, M)).astype(np.float32)).astype(
        jnp.bfloat16
    )

    def _mm_chain_total(n, reps=3):
        @jax.jit
        def run(x):
            def body(y, _):
                y2 = jax.lax.dot_general(
                    y, b, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.bfloat16,
                )
                return y2, None
            y, _ = jax.lax.scan(body, x, None, length=n)
            return y[0, 0].astype(jnp.float32)

        float(run(x0))  # compile + warm
        best = np.inf
        for _ in range(reps):
            t0 = time.perf_counter()
            float(run(x0))
            best = min(best, time.perf_counter() - t0)
        return best

    # median of 3 estimates: the chip's delivered matmul rate varies
    # 155-192 TF/s across minutes (clock state), which was the remaining
    # source of %SoL spread once the probe itself was fixed. Long chains
    # (600-iteration difference = ~53 ms) keep the ~5 ms tunnel noise
    # under 10%; the physical clamp (v5e bf16 peak 197 TF/s) stops one
    # bad difference from reporting an impossible rate.
    mxu_ests = [
        min(
            2 * M * M * M
            / ((_mm_chain_total(608) - _mm_chain_total(8)) / 600),
            197e12,
        )
        for _ in range(3)
    ]
    mxu = float(np.median(mxu_ests))

    # VPU: 96 chained elementwise ops per element on an 8 MB array
    x = jnp.asarray(rng.normal(size=(1024, 2048)).astype(np.float32))

    def vop(v):
        for _ in range(32):
            v = jnp.minimum(jnp.maximum(v * 1.000001, 0.25 * v), 3e38)
        return v

    t = _diff(vop, x, n1=8, n2=72)
    vpu = 96 * x.size / max(t, 1e-9)  # op/s
    vpu = min(vpu, 20e12)  # clamp: one noisy difference must not report
    # a rate beyond any plausible VPU peak

    # HBM: read+write of a 256 MB buffer (0.64 ms/iter at peak — use a
    # long chain difference; clamp to the physical 819 GB/s so one noisy
    # difference can't report an absurd rate)
    y = jnp.asarray(rng.normal(size=(64, 1024, 1024)).astype(np.float32))
    t = _diff(lambda v: v + 1.0, y, n1=16, n2=144)
    hbm = 2 * y.size * 4 / max(t, 1e-9)
    hbm = min(hbm, 0.82e12)
    return mxu, vpu, hbm, mxu_ests


def _match_roofline(measured_s, mxu, vpu, hbm):
    """Speed-of-light accounting for the 2-NN kernel.

    pct = (time the kernel's USEFUL work — the width-D distance
    contraction, 2*F*F*D flops (ADVICE r3: operand-split width is
    implementation cost, not useful work) — takes at this chip's
    DEMONSTRATED matmul rate, same measurement harness) / measured total.
    The VPU model term (~6 ops/entry top-2 merge) is reported for
    transparency; the MEASURED merge floor (no-MXU kernel) is the honest
    merge bound and is reported alongside."""
    mxu_t = 2 * F * F * D / mxu
    vpu_t = 6 * F * F / vpu
    hbm_t = (F / 1024) * (F * D * 2) / hbm  # bf16 t tiles re-read per q tile
    return mxu_t / measured_s * 100.0, {
        "mxu_ms": mxu_t * 1e3, "vpu_ms": vpu_t * 1e3, "hbm_ms": hbm_t * 1e3,
    }


def _bench_ba():
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
    best = np.inf
    for _ in range(2):
        t0 = time.perf_counter()
        out = run_bundle_adjustment(*args, config=cfg)
        cost = float(np.asarray(out["cost"]))  # fetch bounds the solve
        best = min(best, time.perf_counter() - t0)
    iters = int(out["iterations"])
    res = {
        "ba_obs": int(len(prob["obs_point"])),
        "ba_solve_s": round(best, 3),
        "ba_iters": iters,
        "ba_iters_per_s": round(iters / best, 2),
        "ba_cost": round(cost, 4),
    }
    # steady-state LM iteration rate by difference between a 5- and a
    # 205-iteration budget (ftol=0 so the budget is exhausted). r5: the
    # trace-backed device iteration is 1.61 ms (BASELINE.md BA table), so
    # a 15-iteration difference (r4) would be far below the ~0.1 s
    # run-to-run noise of the fixed host/transfer overhead — 200
    # iterations make the difference measurable.
    def timed_budget(n):
        # lambda_up=1.0 keeps the LM loop running the FULL budget (with
        # the default schedule, post-convergence rejects explode lambda
        # past max_lambda after ~25 iterations and the 24-iteration wall
        # difference drowns in the ~0.1 s tunnel noise); every iteration
        # still executes the full build+solve+residual body
        cfg_n = BAConfig(
            max_iterations=n, function_tolerance=0.0, lambda_up=1.0
        )
        out_n = run_bundle_adjustment(*args, config=cfg_n)
        float(np.asarray(out_n["cost"]))
        best_n = np.inf
        for _ in range(2):
            t0 = time.perf_counter()
            out_n = run_bundle_adjustment(*args, config=cfg_n)
            float(np.asarray(out_n["cost"]))
            best_n = min(best_n, time.perf_counter() - t0)
        return best_n, max(int(out_n["iterations"]), 1)

    t5, i5 = timed_budget(5)
    t205, i205 = timed_budget(205)
    res["ba_solve5_s"] = round(t5, 3)
    res["ba_solve205_s"] = round(t205, 3)
    res["ba_iters205"] = i205
    if i205 > i5 and t205 > t5 + 1e-3:
        res["ba_iters_per_s_steady"] = round((i205 - i5) / (t205 - t5), 1)
        res["ba_ms_per_iter_device"] = round(
            (t205 - t5) / (i205 - i5) * 1e3, 2
        )
    else:
        # noise made the longer run no slower: flag instead of reporting
        # an absurd rate
        res["ba_iters_per_s_steady"] = None
    return res


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
    t = _diff(lambda v: sgm_aggregate(v), cv, n1=4, n2=24)
    out["sgm_ms"] = round(t * 1e3, 1)

    # PatchMatch at the r2 VERDICT's comparison size (360x202, 3 nbrs),
    # classic random-init 8-iteration schedule. r5: the production TPU
    # path is the rectified-frame Pallas-scored PatchMatch
    # (mvs/patchmatch.py patchmatch_rect_depth — per-pixel continuous
    # disparity, same candidate schedule); the old warp-based formulation
    # is timed alongside as patchmatch_warp_s_per_view.
    h2, w2 = 202, 360
    ref2 = jnp.asarray(rng.random((h2, w2)).astype(np.float32))
    nbrs2 = jnp.asarray(rng.random((3, h2, w2)).astype(np.float32))
    if jax.default_backend() == "tpu":
        from sfm_mvs_pipeline_tpu.mvs.patchmatch import patchmatch_rect_depth

        t = _chain(
            lambda r: patchmatch_rect_depth(
                r, nbrs2, pose_r, poses_n[:3], intr, 5.0, 20.0,
                jax.random.PRNGKey(0), iterations=8, max_disp=256,
            )[0],
            ref2, 4,
        )
        out["patchmatch_s_per_view"] = round(t, 3)
        t = _chain(
            lambda r: patchmatch_depth(
                r, nbrs2, pose_r, poses_n[:3], intr, 5.0, 20.0,
                jax.random.PRNGKey(0), iterations=8,
            )[0],
            ref2, 2,
        )
        out["patchmatch_warp_s_per_view"] = round(t, 2)
    else:
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
    walls = []
    rc = 1
    for _ in range(2):  # best-of-2: first run may still pay compile-cache
        t0 = time.perf_counter()
        rc = cli_main(
            [
                "-Prun=photogrammetrie", f"-Pimage={insel}", f"-Pout={out_dir}",
                "-Pfeature-limit=0", "-Ploglevel=4",
            ]
        )
        walls.append(time.perf_counter() - t0)
    res = {
        "insel_sparse_e2e_s": round(min(walls), 1),
        "insel_e2e_runs_s": [round(w, 1) for w in walls],
        "insel_rc": rc,
    }
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
            match_s, extra = _bench_match(dq, dt_arr)
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
    tpu_rate = 1.0 / match_s

    try:
        mxu, vpu, hbm, mxu_ests = _floors()
        pct, parts = _match_roofline(match_s, mxu, vpu, hbm)
        extra["match_pct_speed_of_light"] = round(pct, 1)
        extra["match_roofline"] = {
            "measured_ms": round(match_s * 1e3, 3),
            "model_mxu_ms": round(parts["mxu_ms"], 3),
            "model_vpu_ms": round(parts["vpu_ms"], 3),
            "model_hbm_ms": round(parts["hbm_ms"], 3),
            "mxu_tflops": round(mxu / 1e12, 1),
            "mxu_tflops_estimates": [round(m / 1e12, 1) for m in mxu_ests],
            "vpu_tops": round(vpu / 1e12, 2),
            "hbm_gbs": round(hbm / 1e9, 1),
        }
        try:
            mf = _merge_floor()
            extra["match_merge_floor_ms"] = round(mf * 1e3, 4)
            # Mosaic executes the dot and the top-2 merge SEQUENTIALLY
            # within a grid step (r5: three overlap designs measured
            # slower — BASELINE.md match section); the achievable bound
            # for this algorithm on this compiler is their SUM.
            serial_bound = parts["mxu_ms"] / 1e3 + mf
            extra["match_pct_of_serial_bound"] = round(
                serial_bound / match_s * 100.0, 1
            )
        except Exception as e:
            extra["merge_floor_error"] = str(e)[:120]
        # Hamming/ORB roofline (VERDICT r4 item 7): the +-1 expansion is
        # D=256, so its useful-work MXU floor is 2x the L2 path's; the
        # merge work is identical
        t_h = extra.pop("_hamming_t", None)
        if t_h:
            ham_mxu = 2 * F * F * 256 / mxu
            extra["hamming_pct_speed_of_light"] = round(
                ham_mxu / t_h * 100.0, 1
            )
            if "match_merge_floor_ms" in extra:
                extra["hamming_pct_of_serial_bound"] = round(
                    (ham_mxu + extra["match_merge_floor_ms"] / 1e3)
                    / t_h * 100.0, 1
                )
    except Exception as e:
        extra["floors_error"] = str(e)

    try:
        ba = _bench_ba()
        extra.update(ba)
    except Exception as e:
        extra["ba_error"] = str(e)

    try:
        extra.update(_bench_dense())
    except Exception as e:
        extra["dense_error"] = str(e)

    try:
        if time.perf_counter() - T_START < 540:
            extra.update(_bench_insel())
        else:
            extra["insel_skipped"] = "time budget"
    except Exception as e:
        extra["insel_error"] = str(e)

    extra.pop("_hamming_t", None)  # internal; dropped if floors failed
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
