"""Microbenchmark: XLA matmul precision-path floors on this TPU chip.

Measures the wall-clock of an 8192x8192x128 dot_general under the three
precision paths (f32 HIGHEST, bf16x3 HIGH, native bf16) to document why the
framework forces an explicit matmul precision everywhere (see README
"matmul note": the default-precision f32 path lowers to a ~0.9 TFLOP/s
fallback on this chip vs ~420 TFLOP/s with any explicit precision).
Not part of bench.py or the test suite; run directly: python bench_suite/matmul_floor.py
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import time, numpy as np, jax, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
F, D = 8192, 128
rng = np.random.default_rng(0)
dq = jnp.asarray(np.abs(rng.normal(size=(F, D))).astype(np.float32))
dt = jnp.asarray(np.abs(rng.normal(size=(F, D))).astype(np.float32))
dqb = dq.astype(jnp.bfloat16); dtb = dt.astype(jnp.bfloat16)
jax.block_until_ready((dq, dt, dqb, dtb))

def timeit(f, x, n=30):
    @jax.jit
    def chain(q):
        def body(c, _):
            r = f(q * (1 + c * 1e-20))
            return r + c, None
        c, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=n)
        return c
    r = chain(x); jax.block_until_ready(r)
    t0 = time.perf_counter(); jax.block_until_ready(chain(x))
    return (time.perf_counter() - t0) / n

# pure XLA matmul floors
for tag, a, b, prec in [("f32 HIGHEST", dq, dt, jax.lax.Precision.HIGHEST),
                        ("f32 DEFAULT-bf16x3(HIGH)", dq, dt, jax.lax.Precision.HIGH),
                        ("bf16", dqb, dtb, jax.lax.Precision.DEFAULT)]:
    f = lambda q, b=b, prec=prec: jnp.float32(jax.lax.dot_general(q, b,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32, precision=prec)[0, 0]) * 1e-30
    el = timeit(f, a)
    print(f"XLA matmul {tag:26s} {el*1e3:7.3f} ms  ({2*F*F*D/el/1e12:.1f} TFLOP/s)")
