#!/usr/bin/env python
"""Empirical VPU peak calibration: a Pallas kernel of pure chained FMAs
(no memory traffic in the loop) and one of pure exp, to convert measured
kernel times into utilization numbers for docs/OPTIMIZATIONS.md.
"""

import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from fib_tf_tpu.utils import cache
from fib_tf_tpu.utils.profiling import time_fn

H, W = 256, 512
CHAIN = 512          # FMAs per element per pass
EXPS = 64            # exps per element per pass


PAR = 8  # independent chains to hide VPU pipeline latency


def fma_kernel(x_ref, o_ref):
    x = x_ref[:]
    ys = [x * (1.0 + i * 1e-7) for i in range(PAR)]
    a = 1.0000001
    b = 1e-7
    for _ in range(CHAIN // PAR):
        ys = [y * a + b for y in ys]
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


def exp_kernel(x_ref, o_ref):
    x = x_ref[:]
    ys = [x * (1.0 + i * 1e-7) for i in range(PAR)]
    for _ in range(EXPS // PAR):
        ys = [jnp.exp(y * 1e-6) for y in ys]
    acc = ys[0]
    for y in ys[1:]:
        acc = acc + y
    o_ref[:] = acc


def run(kernel, ops_per_elem, label, unit, length=500):
    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((H, W), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )
    x = jnp.ones((H, W), jnp.float32)

    def make(n):
        @jax.jit
        def many(x):
            return jax.lax.scan(lambda s, _: (call(s), None), x, None,
                                length=n)[0]
        return many

    # difference two lengths: the axon tunnel adds ~30 ms per host sync
    t1 = time_fn(make(length), x, iters=5, warmup=2)
    t2 = time_fn(make(2 * length), x, iters=5, warmup=2)
    total = H * W * ops_per_elem * length
    rate = total / (t2 - t1)
    print(f"{label}: {rate/1e12:.3f} T{unit}/s  "
          f"(t1={t1*1e3:.2f} ms t2={t2*1e3:.2f} ms)")
    return rate


if __name__ == "__main__":
    cache.enable()
    # FMA = 2 flops
    run(fma_kernel, CHAIN * 2, "VPU peak f32 (chained FMA)", "flop")
    run(exp_kernel, EXPS, "VPU exp throughput", "exp")
