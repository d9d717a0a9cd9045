"""Per-stage timing of one BA iteration on the current backend.

Timing methodology: each measurement is a jitted lax.scan whose every
iteration depends on the previous one (input perturbed by the running carry)
and which ends in a host scalar fetch — the same guard bench.py uses so the
remote-TPU tunnel's pipelining/dedup cannot inflate numbers.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ba_bench import make_problem  # noqa: E402

N_CHAIN = 20


def chain_time(make_step, pts0):
    """make_step(pts)->scalar; returns seconds/step via a dependency chain."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(pts):
        def body(c, _):
            s = make_step(pts * (1.0 + c * 1e-30))
            return s * 1e-30 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), pts.dtype), None, length=N_CHAIN)
        return c

    r = chain(pts0)
    float(r)  # compile + warm
    t0 = time.perf_counter()
    float(chain(pts0))
    return (time.perf_counter() - t0) / N_CHAIN


def main():
    import jax
    import jax.numpy as jnp

    from sfm_mvs_pipeline_tpu.sfm import ba as B

    prob = make_problem()
    O = len(prob["obs_point"])
    O_pad = 1 << (O - 1).bit_length()
    P = len(prob["points"])
    P_pad = 1 << (P - 1).bit_length()
    obs_point = np.concatenate([prob["obs_point"], np.zeros(O_pad - O, np.int32)])
    obs_shot = np.concatenate([prob["obs_shot"], np.zeros(O_pad - O, np.int32)])
    obs_uv = np.concatenate([prob["obs_uv"], np.zeros((O_pad - O, 2))])
    obs_w = np.concatenate([np.ones(O), np.zeros(O_pad - O)])
    points = np.concatenate([prob["points"], np.zeros((P_pad - P, 3))])

    tab = B.build_track_table(obs_point, obs_w, P_pad)
    print(f"backend={jax.default_backend()} O_pad={O_pad} P_pad={P_pad} L={tab.shape[1]}")

    dt = jnp.float32
    pts = jnp.asarray(points, dt)
    pos = jnp.asarray(prob["poses"], dt)
    K = jnp.asarray(prob["intr"], dt)
    cams = jnp.asarray(prob["cam_of_shot"], jnp.int32)
    op = jnp.asarray(obs_point, jnp.int32)
    os_ = jnp.asarray(obs_shot, jnp.int32)
    ouv = jnp.asarray(obs_uv, dt)
    ow = jnp.asarray(obs_w, dt)
    tabd = jnp.asarray(tab)
    imask = jnp.asarray(np.broadcast_to(prob["intr_mask"], (1, 7)), dt)
    pfree = jnp.ones(12, dt)
    lam = jnp.asarray(1e-4, dt)
    n_shots, n_cams = 12, 1
    jax.block_until_ready((pts, pos, K, ouv, ow, tabd))

    t = chain_time(
        lambda p: B._obs_jacobians(p, pos, K, cams, op, os_, ouv, ow)[0].sum(),
        pts,
    )
    print(f"jacobians:   {t*1e3:7.2f} ms")

    t = chain_time(
        lambda p: B.compute_residuals(p, pos, K, cams, op, os_, ouv, ow)[1], pts
    )
    print(f"residuals:   {t*1e3:7.2f} ms")

    def build_cost(p):
        out = B.ba_build_core(
            p, pos, K, cams, op, os_, ouv, ow, tabd, lam, imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        return out[0].sum() + out[4]

    t = chain_time(build_cost, pts)
    print(f"build total: {t*1e3:7.2f} ms")

    out = B.ba_build_reduced(
        pts, pos, K, cams, op, os_, ouv, ow, tabd, lam, imask, pfree,
        n_shots=n_shots, n_cams=n_cams,
    )
    S_red, rhs, Bp, gp, cost, Wc, Wi = out
    jax.block_until_ready(S_red)

    def solve_cost(s):
        return B.equilibrated_cholesky_solve(s, rhs).sum()

    t = chain_time(solve_cost, S_red)
    print(f"solve ({S_red.shape[0]}x{S_red.shape[0]}): {t*1e3:7.2f} ms")

    def backsub_cost(w):
        dcam = rhs * 1e-6
        dX, dpose, dintr = B.ba_backsub_points(
            dcam, Bp, gp, w, Wi, tabd, os_, cams[os_],
            n_shots=n_shots, n_cams=n_cams,
        )
        return dX.sum() + dpose.sum() + dintr.sum()

    t = chain_time(backsub_cost, Wc)
    print(f"backsub:     {t*1e3:7.2f} ms")

    def full_iter(p):
        S_red, rhs, Bp, gp, c, Wc, Wi = B.ba_build_core(
            p, pos, K, cams, op, os_, ouv, ow, tabd, lam, imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        dcam = B.equilibrated_cholesky_solve(S_red, rhs)
        dX, dpose, dintr = B.ba_backsub_points(
            dcam, Bp, gp, Wc, Wi, tabd, os_, cams[os_],
            n_shots=n_shots, n_cams=n_cams,
        )
        _, nc = B.compute_residuals(
            p + dX, pos + dpose, K + dintr, cams, op, os_, ouv, ow
        )
        return nc

    t = chain_time(full_iter, pts)
    print(f"full iter:   {t*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
