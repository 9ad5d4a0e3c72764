#!/usr/bin/env python
"""Measure the shard_map chunk's per-shard cost on a 1-DEVICE TPU mesh
(VERDICT r2 #1): the identical shard_map/ppermute/block-kernel program
runs with zero-distance halos, so the number isolates the COMPUTE side of
the multi-chip crossover on the one real chip this machine has.

  python tools/spmd_bench.py br  --flavor per-substep|wide-xla|wide-kernel
  python tools/spmd_bench.py court --flavor wide-kernel --height 1024 --width 512

Compare against the single-chip numbers from tools/kernel_bench.py
(whole-grid kernel / plain XLA).  The ICI side of the crossover is the
K-row halo message (K = dt_per_step rows x W x 4 B per neighbor per outer
step), which is microseconds on v5e ICI — see docs/OPTIMIZATIONS.md §9.
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["fenton", "br", "court", "court_ultra",
                                     "ms", "lr1", "tp06"])
    p.add_argument("--flavor", default="wide-kernel",
                   choices=["per-substep", "wide-xla", "wide-kernel"])
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--outer", type=int, default=1000,
                   help="outer steps per timed scan")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cheby", action="store_true", default=True)
    p.add_argument("--no-cheby", dest="cheby", action="store_false")
    p.add_argument("--skip", action="store_true", default=True)
    p.add_argument("--no-skip", dest="skip", action="store_false")
    args = p.parse_args()

    from jax.sharding import Mesh

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.models import MODEL_REGISTRY
    from fib_tf_tpu.parallel.spmd import make_spmd_chunk
    from fib_tf_tpu.utils import cache
    from fib_tf_tpu.utils.profiling import sync, time_fn

    cache.enable()
    # per-model recommended dt (0.1 for the reference models; the stiff
    # lr1 refuses dt > 0.05 and runs at its default 0.02)
    dt = MODEL_REGISTRY[args.model].default_dt
    cfg = SimConfig(width=args.width, height=args.height, dt=dt, duration=1,
                    diff=0.809, cheby=args.cheby, skip=args.skip,
                    ultra_slow=(args.model == "court_ultra"))
    model = MODEL_REGISTRY[args.model](cfg)
    mesh = Mesh(np.asarray(jax.devices()[:1]).reshape(1), ("rows",))

    wide = args.flavor != "per-substep"
    use_kernel = args.flavor == "wide-kernel"
    chunk1 = make_spmd_chunk(model, mesh, args.outer, wide_halo=wide,
                             use_kernel=use_kernel)
    chunk2 = make_spmd_chunk(model, mesh, 2 * args.outer, wide_halo=wide,
                             use_kernel=use_kernel)

    state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

    def run1(s):
        return chunk1(s)[0]

    def run2(s):
        return chunk2(s)[0]

    print("compiling...", flush=True)
    sync(run1(state))
    sync(run2(state))
    t1 = time_fn(run1, state, iters=args.iters, warmup=1)
    t2 = time_fn(run2, state, iters=args.iters, warmup=1)
    substeps = args.outer * model.dt_per_step
    us = (t2 - t1) / substeps * 1e6
    print(f"{args.model} spmd[{args.flavor}] 1-dev mesh @ "
          f"{args.height}x{args.width}: {us:.1f} us/substep "
          f"(t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms, {substeps} substeps)")


if __name__ == "__main__":
    main()
