"""Bisect ba_build_dense: which stage owns the ~16 ms beyond the
jacobians? Times progressively larger prefixes of the build graph
(XLA dead-code-eliminates whatever the returned scalar doesn't need).
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ba_bench import make_problem  # noqa: E402


def _chain_n(f, x, n, reps=3):
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1.0 + c * 1e-30))
            return jnp.ravel(r)[0].astype(jnp.float32) * 1e-30 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chain(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best


def diff_time(f, x, n1=8, n2=48):
    return (_chain_n(f, x, n2) - _chain_n(f, x, n1)) / (n2 - n1)


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
    n_shots, n_cams = 12, 1
    uv_ps, w_ps = B.pack_dense_obs(obs_point, obs_shot, obs_uv, obs_w, P_pad, n_shots)

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
    oh_cam = jax.nn.one_hot(cams, n_cams, dtype=dt)

    def stages(p, upto):
        Jp, Jc, Ji, r = B._dense_jacobians(p, pos, K, cams, uv_d, w_d)
        Ji = Ji * imask[cams][None, :, None, :]
        Jc = Jc * pfree[None, :, None, None]
        acc = Jp.sum() + Jc.sum() + Ji.sum() + r.sum()
        if upto == "jac":
            return acc
        Hcc_pose = jnp.einsum("psai,psaj->sij", Jc, Jc)
        Hcc_cross = jnp.einsum("psai,psaj->sij", Jc, Ji)
        gc = jnp.einsum("psai,psa->si", Jc, r)
        Hcc_intr = jnp.einsum("psai,psaj,sc->cij", Ji, Ji, oh_cam)
        gi = jnp.einsum("psai,psa,sc->ci", Ji, r, oh_cam)
        acc = acc + Hcc_pose.sum() + Hcc_cross.sum() + gc.sum() + Hcc_intr.sum() + gi.sum()
        if upto == "cam":
            return acc
        Hpp = jnp.einsum("psai,psaj->pij", Jp, Jp)
        gp = jnp.einsum("psai,psa->pi", Jp, r)
        damped = Hpp + lam * B._diag_embed(
            jnp.maximum(
                jnp.stack([Hpp[:, 0, 0], Hpp[:, 1, 1], Hpp[:, 2, 2]], axis=-1),
                1e-8,
            )
        )
        Bp = B._inv3x3(damped)
        acc = acc + Bp.sum() + gp.sum()
        if upto == "pnt":
            return acc
        Wc = jnp.einsum("psai,psaj->psij", Jp, Jc)
        Wi = jnp.einsum("psai,psaj->psij", Jp, Ji)
        acc = acc + Wc.sum() + Wi.sum()
        if upto == "w":
            return acc
        Pn = Wc.shape[0]
        U_pose = jnp.transpose(Wc, (0, 2, 1, 3)).reshape(Pn, 3, n_shots * 6)
        U_intr = jnp.einsum("psij,sc->picj", Wi, oh_cam).reshape(Pn, 3, n_cams * 7)
        U = jnp.concatenate([U_pose, U_intr], axis=-1)
        acc = acc + U.sum()
        if upto == "u":
            return acc
        BU = jnp.einsum("pab,pbd->pad", Bp, U)
        S_corr = jnp.einsum("pad,pae->de", U, BU)
        rhs_corr = jnp.einsum("pad,pa->d", U, jnp.einsum("pab,pb->pa", Bp, gp))
        return acc + S_corr.sum() + rhs_corr.sum()

    for upto in ("jac", "cam", "pnt", "w", "u", "full"):
        t = diff_time(lambda p, u=upto: stages(p, u), pts)
        print(f"{upto:5s}: {t*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
