"""Probe: do the BA build's einsums pay tiny-minor-dim padding on TPU?

*** RESULTS FROM THIS PROBE ARE INVALID — kept as a cautionary artifact.
The chained-dependency harness perturbs the input by a scalar, and XLA's
algebraic simplifier HOISTS scalar factors out of bilinear ops:
einsum((1+c)j, (1+c)j) = (1+c)^2 einsum(j, j), so the einsum runs once
outside the scan and the probe measures ~nothing (0.022 ms for reading
112 MB would be 5 TB/s). Only NONLINEAR kernel bodies can be
chain-probed; see the r4 note in the repo memory/BASELINE. The real BA
stage costs come from bench_suite/ba_build_bisect.py, whose stages are
nonlinear in the perturbed points. ***
"""


from __future__ import annotations

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))


import json
import os
import time

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.environ.get("SFM_MVS_TPU_CACHE", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)


def _chain_n(f, x, n, reps=3):
    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1.0 + c * 1e-20))
            return jnp.ravel(r)[0].astype(jnp.float32) * 1e-20 + c, None

        c, _ = jax.lax.scan(body, jnp.zeros((), jnp.float32), None, length=n)
        return c

    float(chain(x))
    best = np.inf
    for _ in range(reps):
        t0 = time.perf_counter()
        float(chain(x))
        best = min(best, time.perf_counter() - t0)
    return best


def diff_time(f, x, n1=8, n2=72):
    return (_chain_n(f, x, n2) - _chain_n(f, x, n1)) / (n2 - n1)


def main():
    P, S = 32768, 12
    rng = np.random.default_rng(0)
    Jc = jnp.asarray(rng.normal(size=(P, S, 2, 6)).astype(np.float32))
    Jp = jnp.asarray(rng.normal(size=(P, S, 2, 3)).astype(np.float32))
    # transposed layout: P minormost
    JcT = jnp.asarray(np.moveaxis(np.asarray(Jc), 0, -1).copy())  # (S,2,6,P)
    JpT = jnp.asarray(np.moveaxis(np.asarray(Jp), 0, -1).copy())  # (S,2,3,P)

    out = {}

    # camera diagonal block: sum over P of Jc^T Jc per shot
    t = diff_time(lambda j: jnp.einsum("psai,psaj->sij", j, j), Jc)
    out["hcc_slotmajor_ms"] = round(t * 1e3, 3)
    t = diff_time(lambda j: jnp.einsum("saip,sajp->sij", j, j), JcT)
    out["hcc_pminor_ms"] = round(t * 1e3, 3)

    # Schur row outer product Wc = Jp^T Jc per slot
    t = diff_time(
        lambda j: jnp.einsum("psai,psaj->psij", Jp, j).sum(), Jc
    )
    out["wc_slotmajor_ms"] = round(t * 1e3, 3)
    t = diff_time(
        lambda j: jnp.einsum("saip,sajp->sijp", JpT, j).sum(), JcT
    )
    out["wc_pminor_ms"] = round(t * 1e3, 3)

    # flattened-minor variant: (P, S*2*6) elementwise-expanded products
    Jc_f = Jc.reshape(P, S * 12)
    t = diff_time(lambda j: (j * j).sum(axis=0), Jc_f)
    out["flat_reduce_ms"] = round(t * 1e3, 3)

    print(json.dumps(out))


if __name__ == "__main__":
    main()
