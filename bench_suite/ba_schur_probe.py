"""Probe: Schur correction WITHOUT materializing U (VERDICT r3 item 3).

The bisect showed U's transpose+reshape+concat costs 11.7 ms of the 33 ms
build. Variant B computes the same S_corr blockwise with einsums that
contract over the big P axis directly:

  S_cc[si, tj] = sum_p sum_a Wc[p,s,a,i] (Bp Wc)[p,t,a,j]
  S_ci, S_ii, rhs analogously (intrinsics rows summed over shots via
  oh_cam).

Checks numerical equality vs the shipped variant, then difference-times
both sections in isolation.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


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

    P, S, C = 32768, 12, 1
    D = 6 * S + 7 * C
    rng = np.random.default_rng(0)
    Wc = jnp.asarray(rng.normal(size=(P, S, 3, 6)).astype(np.float32) * 0.1)
    Wi = jnp.asarray(rng.normal(size=(P, S, 3, 7)).astype(np.float32) * 0.1)
    M = rng.normal(size=(P, 3, 3)).astype(np.float32)
    Bp = jnp.asarray(M @ M.transpose(0, 2, 1) + 3 * np.eye(3, dtype=np.float32))
    gp = jnp.asarray(rng.normal(size=(P, 3)).astype(np.float32))
    oh_cam = jnp.asarray(np.ones((S, C), np.float32))

    def variant_a(Wc_):
        U_pose = jnp.transpose(Wc_, (0, 2, 1, 3)).reshape(P, 3, S * 6)
        U_intr = jnp.einsum("psij,sc->picj", Wi, oh_cam).reshape(P, 3, C * 7)
        U = jnp.concatenate([U_pose, U_intr], axis=-1)
        BU = jnp.einsum("pab,pbd->pad", Bp, U)
        S_corr = jnp.einsum("pad,pae->de", U, BU)
        rhs_corr = jnp.einsum("pad,pa->d", U, jnp.einsum("pab,pb->pa", Bp, gp))
        return S_corr, rhs_corr

    def variant_b(Wc_):
        BWc = jnp.einsum("pab,psbi->psai", Bp, Wc_)  # (P,S,3,6)
        Vi = jnp.einsum("psaj,sc->pacj", Wi, oh_cam)  # (P,3,C,7)
        BVi = jnp.einsum("pab,pbcj->pacj", Bp, Vi)
        cc = jnp.einsum("psai,ptaj->sitj", Wc_, BWc).reshape(6 * S, 6 * S)
        ci = jnp.einsum("psai,pacj->sicj", Wc_, BVi).reshape(6 * S, 7 * C)
        ii = jnp.einsum("pacj,padk->cjdk", Vi, BVi).reshape(7 * C, 7 * C)
        S_corr = jnp.block([[cc, ci], [ci.T, ii]])
        Bg = jnp.einsum("pab,pb->pa", Bp, gp)
        rc = jnp.einsum("psai,pa->si", Wc_, Bg).reshape(-1)
        ri = jnp.einsum("pacj,pa->cj", Vi, Bg).reshape(-1)
        rhs_corr = jnp.concatenate([rc, ri])
        return S_corr, rhs_corr

    Sa, ra = jax.jit(variant_a)(Wc)
    Sb, rb = jax.jit(variant_b)(Wc)
    err_S = float(jnp.max(jnp.abs(Sa - Sb)) / (jnp.max(jnp.abs(Sa)) + 1e-9))
    err_r = float(jnp.max(jnp.abs(ra - rb)) / (jnp.max(jnp.abs(ra)) + 1e-9))
    print(f"equality: S {err_S:.2e} rhs {err_r:.2e}", flush=True)

    ta = diff_time(lambda w: variant_a(w)[0].sum() + variant_a(w)[1].sum(), Wc)
    print(f"variant A (U materialized): {ta*1e3:8.2f} ms", flush=True)
    tb = diff_time(lambda w: variant_b(w)[0].sum() + variant_b(w)[1].sum(), Wc)
    print(f"variant B (blockwise):      {tb*1e3:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
