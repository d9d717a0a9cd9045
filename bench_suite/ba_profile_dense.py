"""Per-stage timing of the DENSE-grid BA path (the one bench.py exercises).

VERDICT r3 item 3: BA runs ~122 ms/iter against a <1 ms compute floor.
This breaks one dense LM iteration into its stages, each timed with the
chained-dependency harness (same guard as bench.py), to locate the time:

  jacobians  -- _dense_jacobians on the (P, S) grid
  residuals  -- compute_residuals_dense
  build      -- ba_build_dense (jacobians + camera blocks + Schur matmul)
  solve      -- equilibrated_cholesky_solve on the reduced D x D system
  solve_ns   -- Newton-Schulz inverse alternative (matmul-only, no
                triangular solves) for comparison
  backsub    -- ba_backsub_dense
  full       -- one complete LM body (what the while_loop runs)
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ba_bench import make_problem  # noqa: E402

N_CHAIN = 20


def chain_time(make_step, x0, n=N_CHAIN):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(x):
        def body(c, _):
            s = make_step(x * (1.0 + c * 1e-30))
            return jnp.ravel(s)[0].astype(x.dtype) * 1e-30 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), x.dtype), None, length=n)
        return c

    float(chain(x0))
    t0 = time.perf_counter()
    float(chain(x0))
    return (time.perf_counter() - t0) / n


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir",
        os.environ.get(
            "SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
        ),
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

    from sfm_mvs_pipeline_tpu.sfm import ba as B

    prob = make_problem()
    O = len(prob["obs_point"])
    P = len(prob["points"])
    O_pad = 1 << (O - 1).bit_length()
    P_pad = 1 << (P - 1).bit_length()
    obs_point = np.concatenate([prob["obs_point"], np.zeros(O_pad - O, np.int32)])
    obs_shot = np.concatenate([prob["obs_shot"], np.zeros(O_pad - O, np.int32)])
    obs_uv = np.concatenate([prob["obs_uv"], np.zeros((O_pad - O, 2))])
    obs_w = np.concatenate([prob["obs_w"], np.zeros(O_pad - O)])
    points = np.concatenate([prob["points"], np.zeros((P_pad - P, 3))])
    n_shots = 12
    n_cams = 1

    dense = B.pack_dense_obs(obs_point, obs_shot, obs_uv, obs_w, P_pad, n_shots)
    assert dense is not None
    uv_ps, w_ps = dense
    print(
        f"backend={jax.default_backend()} P_pad={P_pad} S={n_shots} "
        f"grid={P_pad * n_shots}",
        flush=True,
    )

    dt = jnp.float32
    pts = jnp.asarray(points, dt)
    pos = jnp.asarray(prob["poses"], dt)
    K = jnp.asarray(prob["intr"], dt)
    cams = jnp.asarray(prob["cam_of_shot"], jnp.int32)
    uv_d = jnp.asarray(uv_ps, dt)
    w_d = jnp.asarray(w_ps, dt)
    imask = jnp.asarray(np.broadcast_to(prob["intr_mask"], (1, 7)), dt)
    pfree = jnp.ones(n_shots, dt)
    lam = jnp.asarray(1e-4, dt)
    jax.block_until_ready((pts, pos, K, uv_d, w_d))

    t = chain_time(
        lambda p: B._dense_jacobians(p, pos, K, cams, uv_d, w_d)[0].sum(), pts
    )
    print(f"jacobians:   {t*1e3:8.2f} ms", flush=True)

    t = chain_time(
        lambda p: B.compute_residuals_dense(p, pos, K, cams, uv_d, w_d)[1], pts
    )
    print(f"residuals:   {t*1e3:8.2f} ms", flush=True)

    def build_cost(p):
        out = B.ba_build_dense(
            p, pos, K, cams, uv_d, w_d, lam, imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        return out[0].sum() + out[4]

    t = chain_time(build_cost, pts)
    print(f"build total: {t*1e3:8.2f} ms", flush=True)

    out = jax.jit(
        B.ba_build_dense, static_argnames=("n_shots", "n_cams", "axis_name")
    )(
        pts, pos, K, cams, uv_d, w_d, lam, imask, pfree,
        n_shots=n_shots, n_cams=n_cams,
    )
    S_red, rhs, Bp, gp, cost, U = out
    jax.block_until_ready(S_red)

    t = chain_time(lambda s: B.equilibrated_cholesky_solve(s, rhs).sum(), S_red)
    print(f"solve chol ({S_red.shape[0]}): {t*1e3:8.2f} ms", flush=True)

    def ns_solve(S, b, iters=24):
        # Newton-Schulz inverse on the equilibrated SPD system: matmul-only
        diag = jnp.diagonal(S)
        dead = diag <= 1e-12
        d = jnp.where(dead, 1.0, jax.lax.rsqrt(jnp.maximum(diag, 1e-20)))
        Ss = S * d[:, None] * d[None, :]
        live2 = (~dead)[:, None] & (~dead)[None, :]
        Ss = jnp.where(live2, Ss, 0.0) + jnp.diag(dead.astype(S.dtype))
        bb = jnp.where(dead, 0.0, b * d)
        n = S.shape[0]
        I = jnp.eye(n, dtype=S.dtype)
        # row-sum norm upper bound for ||S||_2
        alpha = 1.0 / (jnp.max(jnp.sum(jnp.abs(Ss), axis=1)) + 1e-20)
        X = alpha * I

        def body(_, X):
            return X @ (2.0 * I - Ss @ X)

        X = jax.lax.fori_loop(0, iters, body, X)
        x = X @ bb
        # one refinement
        r = bb - Ss @ x
        x = x + X @ r
        return x * d

    t = chain_time(lambda s: ns_solve(s, rhs).sum(), S_red)
    print(f"solve NS24:  {t*1e3:8.2f} ms", flush=True)

    # accuracy of NS vs host f64
    S_np = np.asarray(S_red, np.float64)
    rhs_np = np.asarray(rhs, np.float64)
    diag0 = np.abs(np.diag(S_np)) < 1e-12
    S_np[diag0, :] = 0.0
    S_np[:, diag0] = 0.0
    S_np[diag0, diag0] = 1.0
    rhs_np[diag0] = 0.0
    x_ref = np.linalg.solve(S_np, rhs_np)
    x_chol = np.asarray(jax.jit(B.equilibrated_cholesky_solve)(S_red, rhs), np.float64)
    x_ns = np.asarray(jax.jit(ns_solve)(S_red, rhs), np.float64)
    den = np.linalg.norm(x_ref) + 1e-30
    print(
        f"rel err: chol {np.linalg.norm(x_chol - x_ref)/den:.2e} "
        f"NS {np.linalg.norm(x_ns - x_ref)/den:.2e}",
        flush=True,
    )

    def backsub_cost(u):
        dcam = rhs * 1e-6
        dX, dpose, dintr = B.ba_backsub_dense(
            dcam, Bp, gp, u, n_shots=n_shots, n_cams=n_cams
        )
        return dX.sum() + dpose.sum() + dintr.sum()

    t = chain_time(backsub_cost, U)
    print(f"backsub:     {t*1e3:8.2f} ms", flush=True)

    def full_iter(p):
        S_red, rhs, Bp, gp, c, U = B.ba_build_dense(
            p, pos, K, cams, uv_d, w_d, lam, imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        dcam = B.equilibrated_cholesky_solve(S_red, rhs)
        dX, dpose, dintr = B.ba_backsub_dense(
            dcam, Bp, gp, U, n_shots=n_shots, n_cams=n_cams
        )
        _, nc = B.compute_residuals_dense(
            p + dX, pos + dpose, K + dintr, cams, uv_d, w_d
        )
        return nc

    t = chain_time(full_iter, pts)
    print(f"full iter:   {t*1e3:8.2f} ms", flush=True)

    def full_iter_ns(p):
        S_red, rhs, Bp, gp, c, U = B.ba_build_dense(
            p, pos, K, cams, uv_d, w_d, lam, imask, pfree,
            n_shots=n_shots, n_cams=n_cams,
        )
        dcam = ns_solve(S_red, rhs)
        dX, dpose, dintr = B.ba_backsub_dense(
            dcam, Bp, gp, U, n_shots=n_shots, n_cams=n_cams
        )
        _, nc = B.compute_residuals_dense(
            p + dX, pos + dpose, K + dintr, cams, uv_d, w_d
        )
        return nc

    t = chain_time(full_iter_ns, pts)
    print(f"full iterNS: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
