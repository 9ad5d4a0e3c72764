#!/usr/bin/env python
"""Head-to-head cost of the three table-lookup realizations inside a
whole-grid Pallas kernel (VERDICT r2 #5): is the MXU one-hot variant a
competitive realization of the reference's 1 mV lookup table
(courtemanche.h:352-357), or is direct evaluation simply faster on TPU?

  python tools/table_bench.py onehot|direct [--size 512] [--outer 300]

Each variant advances a dummy V plane for `dt_per_step=10` substeps per
outer step; per-substep cost comes from differencing two scan lengths
(cancels the axon tunnel sync constant).  `direct` evaluates the court
calc_intermediates rates inline; `onehot` does the iota-compare one-hot
matmul against the 150x30 table.  Compare both against the full court
whole-grid substep (24.3 us at 512**2) — the lookup only wins if it costs
less than the rate math it replaces.
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def main():
    p = argparse.ArgumentParser()
    p.add_argument("variant", choices=["onehot", "direct"])
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--outer", type=int, default=300)
    p.add_argument("--iters", type=int, default=5)
    args = p.parse_args()

    from fib_tf_tpu.models.courtemanche import (
        INTER_KEYS, calc_intermediates_np,
    )
    from fib_tf_tpu.models.courtemanche import calc_intermediates
    from fib_tf_tpu.ops import table as table_ops
    from fib_tf_tpu.utils import cache
    from fib_tf_tpu.utils.profiling import sync, time_fn

    cache.enable()
    n = args.size
    n_sub = 10
    tbl = jnp.asarray(
        table_ops.build_table(calc_intermediates_np, INTER_KEYS)
    )

    def kernel(v_ref, tbl_ref, o_ref):
        v = v_ref[:]
        t = tbl_ref[:]
        for _ in range(n_sub):
            if args.variant == "onehot":
                inter = table_ops.lookup_onehot_iota(t, v, INTER_KEYS)
            else:
                inter = calc_intermediates(v)
            acc = sum(inter[k] for k in INTER_KEYS[:6])
            v = v + 1e-6 * acc  # keep every substep live
        o_ref[:] = v

    plane = jax.ShapeDtypeStruct((n, n), jnp.float32)
    spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    call_ = pl.pallas_call(
        kernel, out_shape=plane, in_specs=[spec, spec], out_specs=spec,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )

    def call(v):
        return call_(v, tbl)

    def make_run(length):
        @jax.jit
        def run(v):
            return jax.lax.scan(
                lambda s, _: (call(s), None), v, None, length=length
            )[0]
        return run

    run1, run2 = make_run(args.outer), make_run(2 * args.outer)
    v0 = jnp.asarray(
        np.random.default_rng(0)
        .uniform(-80, 20, (n, n)).astype(np.float32)
    )
    print("compiling...", flush=True)
    sync(run1(v0))
    sync(run2(v0))
    t1 = time_fn(run1, v0, iters=args.iters, warmup=1)
    t2 = time_fn(run2, v0, iters=args.iters, warmup=1)
    us = (t2 - t1) / (args.outer * n_sub) * 1e6
    print(f"table[{args.variant}] {n}x{n}: {us:.1f} us/substep "
          f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms)")


if __name__ == "__main__":
    main()
