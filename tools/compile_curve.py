#!/usr/bin/env python
"""Mosaic compile-time vs substeps-per-launch curve (VERDICT r4 #3/#4).

Measures, for one (model, substeps_per_launch, kernel-flavor) point:
  * compile seconds: wall time of jax.jit(step).lower(state).compile()
    — the Mosaic compile(s) of the launch kernels (persistent cache NOT
    enabled, so this is the cold cost a first-time user pays; note the
    axon server amortizes identical programs, so re-running the same
    point in a later process may come back warm — treat the FIRST run
    of a point as the datum);
  * runtime us/substep: two differenced scan lengths (the ~30 ms tunnel
    sync constant cancels; tools/kernel_bench.py convention).

  python tools/compile_curve.py tp06 --spl 2
  python tools/compile_curve.py tp06 --spl 5 --skip
  python tools/compile_curve.py br --spl 1 --skip
  python tools/compile_curve.py tp06 --spl 2 --flavor block   # sharded
                                           # per-shard block kernel on a
                                           # 1-device TPU mesh (the tp06
                                           # whitelist experiment)

Prints one JSON line: {"model", "spl", "flavor", "skip", "compile_s",
"us_per_substep", ...}.  --compile-only skips the runtime phase (for
divergence probes under an external timeout).
"""

import argparse
import json
import os as _os
import sys as _sys
import time

_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("model", choices=["fenton", "br", "court", "court_ultra",
                                     "ms", "lr1", "tp06"])
    p.add_argument("--spl", type=int, default=0,
                   help="substeps per launch; 0 = monolith (whole outer "
                        "step in one kernel)")
    p.add_argument("--flavor", default="whole",
                   choices=["whole", "block", "widexla"],
                   help="whole = fused whole-grid kernel; block = the "
                        "per-shard block kernel on a 1-device TPU mesh; "
                        "widexla = the same wide-halo shard_map chunk "
                        "with the XLA substep body (the comparison "
                        "point the block whitelist decides against)")
    p.add_argument("--size", type=int, default=512)
    p.add_argument("--outer", type=int, default=1000)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--skip", action="store_true")
    p.add_argument("--cheby", action="store_true", default=True)
    p.add_argument("--compile-only", action="store_true")
    p.add_argument("--cache", action="store_true",
                   help="enable the persistent compile cache — use when "
                        "only the RUNTIME number matters (compile_s then "
                        "reflects a possibly-warm cache, not the cold "
                        "cost)")
    args = p.parse_args()

    if args.cache:
        from fib_tf_tpu.utils import cache as _cache

        _cache.enable()

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.models import MODEL_REGISTRY
    from fib_tf_tpu.utils.profiling import sync, time_fn

    dt = MODEL_REGISTRY[args.model].default_dt
    spl = args.spl if args.spl > 0 else None
    cfg = SimConfig(width=args.size, height=args.size, dt=dt, duration=1,
                    diff=0.809, cheby=args.cheby, skip=args.skip,
                    ultra_slow=(args.model == "court_ultra"),
                    substeps_per_launch=spl)
    model = MODEL_REGISTRY[args.model](cfg)
    state = {k: jnp.asarray(v) for k, v in model.initial_state().items()}

    if args.flavor == "whole":
        from fib_tf_tpu.ops.pallas_step import make_pallas_step

        step = make_pallas_step(model, substeps_per_launch=spl)

        def scan_of(n):
            @jax.jit
            def scan(s):
                return jax.lax.scan(lambda st, _: (step(st), None), s,
                                    None, length=n)[0]
            return scan
    else:
        # per-shard block kernel (or the wide-XLA body) fed by wide-halo
        # ppermute on a 1-device TPU mesh — the identical program the
        # multi-chip path runs, with zero-distance halos
        # (tools/spmd_bench.py convention)
        from fib_tf_tpu.parallel.sharding import make_mesh
        from fib_tf_tpu.parallel.spmd import make_spmd_chunk

        mesh = make_mesh((1,))

        def scan_of(n):
            inner = make_spmd_chunk(model, mesh, n, wide_halo=True,
                                    use_kernel=(args.flavor == "block"),
                                    substeps_per_launch=spl)

            def scan(s):
                return inner(s)[0]
            return scan

    print(f"lowering {args.model} spl={args.spl} flavor={args.flavor} "
          f"skip={args.skip}...", flush=True)
    scan1 = scan_of(args.outer)
    t0 = time.time()
    out = scan1(state)       # first call: compile + one run
    sync(out)
    compile_s = time.time() - t0
    print(f"  first run (compile + {args.outer} steps): {compile_s:.1f} s",
          flush=True)

    rec = {"model": args.model, "spl": args.spl, "flavor": args.flavor,
           "skip": bool(args.skip), "size": args.size,
           "compile_s": round(compile_s, 1)}
    if not args.compile_only:
        scan2 = scan_of(2 * args.outer)
        sync(scan2(state))
        t1 = time_fn(scan1, state, iters=args.iters, warmup=1)
        t2 = time_fn(scan2, state, iters=args.iters, warmup=1)
        substeps = args.outer * model.dt_per_step
        rec["us_per_substep"] = round((t2 - t1) / substeps * 1e6, 2)
        rec["t1_ms"] = round(t1 * 1e3, 1)
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
