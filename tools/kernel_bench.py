#!/usr/bin/env python
"""Kernel-level microbenchmark: µs per substep of one outer step, measured
as a jitted scan on whatever backend jax provides (the real TPU under
axon).  The numbers in docs/OPTIMIZATIONS.md §8 come from this tool.

  python tools/kernel_bench.py br --kernel tiled --tile-rows 128
  python tools/kernel_bench.py court --kernel xla
  python tools/kernel_bench.py fenton --kernel whole
"""

import argparse
import os as _os
import sys as _sys

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def make_hole(size: int):
    """Canonical spiral-run obstacle: a disk at grid center, r=size/8
    (the 512-grid examples use r=64-ish; scaled so small grids work)."""
    from fib_tf_tpu.ops import stencil

    return stencil.add_hole_to_phase_field(
        None, size, size, size // 2, size // 2, max(3, size // 8))


def build_step(model, kernel: str, tile_rows: int, phase=None):
    if kernel == "xla":
        from fib_tf_tpu.models.base import grid_geometry

        geom = grid_geometry(phase)
        return lambda s: model.step(s, geom)
    if kernel == "whole":
        from fib_tf_tpu.ops.pallas_step import make_pallas_step

        return make_pallas_step(model, phase=phase)
    if kernel == "tiled":
        from fib_tf_tpu.ops.pallas_tiled import make_tiled_pallas_step

        return make_tiled_pallas_step(model, tile_rows=tile_rows, phase=phase)
    raise ValueError(kernel)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model",
                   choices=["fenton", "br", "court", "court_ultra", "ms",
                            "lr1", "tp06"])
    p.add_argument("--kernel", default="xla",
                   choices=["xla", "whole", "tiled"])
    p.add_argument("--tile-rows", type=int, default=128)
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--outer", type=int, default=200,
                   help="outer steps per timed scan")
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--cheby", action="store_true", default=True)
    p.add_argument("--no-cheby", dest="cheby", action="store_false")
    p.add_argument("--skip", action="store_true", default=True)
    p.add_argument("--no-skip", dest="skip", action="store_false")
    p.add_argument("--hole", action="store_true",
                   help="run with a center-disk phase field (times the "
                        "phase-correction arm of the kernels)")
    p.add_argument("--gscale", default=None, metavar="CH=F[,CH=F...]",
                   help="channel-block factors baked into the body "
                        "(A/B the zero-runtime-cost claim; a distinct "
                        "dose is a new kernel compile)")
    args = p.parse_args()

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.models import MODEL_REGISTRY
    from fib_tf_tpu.utils import cache
    from fib_tf_tpu.utils.profiling import sync, time_fn

    cache.enable()
    # per-model recommended dt (0.1 for the reference models; the stiff
    # lr1 refuses dt > 0.05 and runs at its default 0.02)
    dt = MODEL_REGISTRY[args.model].default_dt
    from fib_tf_tpu.cli import _parse_gscale

    cfg = SimConfig(width=args.size, height=args.size, dt=dt, duration=1,
                    diff=0.809, cheby=args.cheby, skip=args.skip,
                    ultra_slow=(args.model == "court_ultra"),
                    g_scale=_parse_gscale(args.gscale))
    model = MODEL_REGISTRY[args.model](cfg)
    phase = make_hole(args.size) if args.hole else None
    step = build_step(model, args.kernel, args.tile_rows, phase=phase)

    state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

    def make_scan(n):
        @jax.jit
        def scan(s):
            return jax.lax.scan(lambda st, _: (step(st), None), s, None,
                                length=n)[0]
        return scan

    # the axon tunnel adds a ~30 ms constant per host sync; difference two
    # scan lengths so the reported number is pure device time
    scan1, scan2 = make_scan(args.outer), make_scan(2 * args.outer)
    print("compiling...", flush=True)
    import time as _time
    _t0 = _time.time()
    sync(scan1(state))
    print(f"  scan1 compile+run: {_time.time() - _t0:.1f} s", flush=True)
    sync(scan2(state))
    t1 = time_fn(scan1, state, iters=args.iters, warmup=1)
    t2 = time_fn(scan2, state, iters=args.iters, warmup=1)
    substeps = args.outer * model.dt_per_step
    us = (t2 - t1) / substeps * 1e6
    print(f"{args.model}{'+hole' if args.hole else ''} {args.kernel}"
          f"{' tile=' + str(args.tile_rows) if args.kernel == 'tiled' else ''}"
          f" @ {args.size}x{args.size}: {us:.1f} us/substep"
          f" (t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms, {substeps} substeps)")


if __name__ == "__main__":
    main()
