"""r5 prototype: per-lane dynamic gather inside a Pallas TPU kernel.

Finding #1 (first run): tpu.dynamic_gather is limited to ONE vreg (128
lanes) along the gather dimension — a (256, 640) lane-gather fails with
"Multiple source vregs along gather dimension". So wide gathers must be
decomposed as idx = 128*hi + lo: static 128-lane shifts select the source
vreg (hi), an in-vreg dynamic gather applies lo, and a select merges.

This probe validates the 128-lane primitive's semantics (global idx within
a 128-wide array == per-vreg idx) and measures its throughput, then
validates + times the hi/lo decomposition for a 640-wide source.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update(
    "jax_compilation_cache_dir", os.path.expanduser("~/.cache/sfm_mvs_tpu_xla")
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)

import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bench import _diff


def main():
    rng = np.random.default_rng(0)

    # --- 1. 128-wide correctness
    H, W = 256, 128
    x = jnp.asarray(rng.random((H, W)).astype(np.float32))
    idx = jnp.asarray(rng.integers(0, W, size=(H, W)).astype(np.int32))

    def kernel(x_ref, i_ref, o_ref):
        o_ref[...] = jnp.take_along_axis(x_ref[...], i_ref[...], axis=1)

    @jax.jit
    def gather1(xv, iv):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xv, iv)

    out = np.asarray(gather1(x, idx))
    want = np.take_along_axis(np.asarray(x), np.asarray(idx), axis=1)
    print("128-wide correct:", np.array_equal(out, want), flush=True)

    # --- 2. wide-source gather via hi/lo decomposition
    HG, WG, WL = 64, 640, 128  # source rows 640 wide; output 128 lanes/vreg
    # emulate: out[r, c0*128+l] = src[r, g[r, c]] for arbitrary g in [0, WG)
    src = jnp.asarray(rng.random((HG, WG)).astype(np.float32))
    g = jnp.asarray(rng.integers(0, WG, size=(HG, WG)).astype(np.int32))
    n_hi = WG // 128

    def wide_kernel(s_ref, g_ref, o_ref):
        sv = s_ref[...]
        gv = g_ref[...]
        lo = jax.lax.rem(gv, 128)
        hi = jax.lax.div(gv, 128)
        # output processed in 128-lane column blocks
        for c0 in range(n_hi):
            lo_c = lo[:, c0 * 128:(c0 + 1) * 128]
            hi_c = hi[:, c0 * 128:(c0 + 1) * 128]
            acc = jnp.zeros((HG, 128), jnp.float32)
            for d in range(n_hi):
                block = sv[:, d * 128:(d + 1) * 128]
                got = jnp.take_along_axis(block, lo_c, axis=1)
                acc = jnp.where(hi_c == d, got, acc)
            o_ref[:, c0 * 128:(c0 + 1) * 128] = acc

    @jax.jit
    def wide(sv, gv):
        return pl.pallas_call(
            wide_kernel,
            out_shape=jax.ShapeDtypeStruct((HG, WG), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(sv, gv)

    out = np.asarray(wide(src, g))
    want = np.asarray(src)[np.arange(HG)[:, None], np.asarray(g)]
    print("wide hi/lo correct:", np.array_equal(out, want), flush=True)

    # --- 3. throughput: K gathers of (HG, 128) within-vreg
    K = 64
    xs = jnp.asarray(rng.random((256, 128)).astype(np.float32))
    ii = jnp.asarray(rng.integers(0, 128, size=(256, 128)).astype(np.int32))

    def kernel_k(x_ref, i_ref, o_ref):
        xv = x_ref[...]
        iv = i_ref[...]
        acc = jnp.zeros_like(xv)
        for k in range(K):
            acc = acc + jnp.take_along_axis(
                xv, jax.lax.rem(iv + k, 128), axis=1
            )
        o_ref[...] = acc

    @jax.jit
    def gather_k(xv):
        return pl.pallas_call(
            kernel_k,
            out_shape=jax.ShapeDtypeStruct((256, 128), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        )(xv, ii)

    t = _diff(gather_k, xs, n1=8, n2=104)
    rate = K * 256 * 128 / t
    print(f"{K} in-vreg gathers of (256x128): {t*1e3:.4f} ms -> "
          f"{rate/1e9:.2f} G elem/s (XLA ceiling ~0.11)", flush=True)


if __name__ == "__main__":
    main()
