#!/usr/bin/env python
"""Volume (3D) kernel microbenchmark: µs per substep of one outer step
over a [D, H, W] volume — the XLA path vs the fused whole-volume Pallas
kernel (ops/pallas_volume.py).  Same sync-corrected two-scan-length
differencing as tools/kernel_bench.py (the axon tunnel adds ~30 ms per
host sync).  Numbers land in docs/OPTIMIZATIONS.md §14.

  python tools/volume_bench.py fenton --depth 16 --height 256 --width 512 --kernel whole
  python tools/volume_bench.py br --depth 8 --height 256 --width 512 --kernel xla

`--mesh1` runs the wide-halo shard_map chunk on a 1-device mesh (the
identical ppermute/block-kernel program with zero-distance halos — the
compute side of the multi-chip crossover, same methodology as
tools/spmd_bench.py / OPTIMIZATIONS §10b); `--kernel whole` then means
the per-shard fused volume block kernel.
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
                                     "ms", "lr1"])
    p.add_argument("--kernel", default="xla",
                   choices=["xla", "whole", "tiled"])
    p.add_argument("--tile-rows", type=int, default=None,
                   help="tiled kernel row-tile size (default: "
                        "engine.volume.pick_volume_tile_rows)")
    p.add_argument("--depth", type=int, default=16)
    p.add_argument("--height", type=int, default=256)
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--dt", type=float, default=0.05)
    p.add_argument("--dz-ratio", type=float, default=1.0)
    p.add_argument("--twist", type=float, default=0.0,
                   help="fiber_twist radians (enables rotational anisotropy)")
    p.add_argument("--fiber-ratio", type=float, default=1.0)
    p.add_argument("--outer", type=int, default=200)
    p.add_argument("--iters", type=int, default=5)
    p.add_argument("--mesh1", action="store_true",
                   help="run the wide-halo shard_map chunk on a 1-device "
                        "mesh (zero-distance halos; measures the "
                        "per-shard compute of the multi-chip path)")
    p.add_argument("--halo-k", type=int, default=None,
                   help="wide-halo exchange cadence (see run_volume)")
    args = p.parse_args()

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.models import MODEL_REGISTRY
    from fib_tf_tpu.models.base import volume_geometry
    from fib_tf_tpu.engine.volume import volume_state
    from fib_tf_tpu.ops import stencil3d
    from fib_tf_tpu.utils import cache
    from fib_tf_tpu.utils.profiling import sync, time_fn

    cache.enable()
    # respect the model's stability bound (the stiff lr1 runs at 0.02)
    dt = min(args.dt, MODEL_REGISTRY[args.model].default_dt)
    cfg = SimConfig(width=args.width, height=args.height, dt=dt,
                    duration=1, diff=0.809,
                    ultra_slow=(args.model == "court_ultra"))
    model = MODEL_REGISTRY[args.model](cfg)
    fiber = None
    if args.fiber_ratio < 1.0:
        angles = stencil3d.twist_angles(args.depth, 0.0, args.twist)
        fiber = stencil3d.fiber_tensors(angles, args.fiber_ratio)
    if args.kernel == "whole":
        from fib_tf_tpu.ops.pallas_volume import make_pallas_volume_step

        step = make_pallas_volume_step(
            model, args.depth, dz_ratio=args.dz_ratio, fiber=fiber
        )
    elif args.kernel == "tiled":
        from fib_tf_tpu.engine.volume import pick_volume_tile_rows
        from fib_tf_tpu.ops.pallas_volume import make_tiled_volume_step

        tr = args.tile_rows or pick_volume_tile_rows(model, args.depth)
        if tr is None:
            raise SystemExit("no valid tile_rows for this volume")
        print(f"tile_rows={tr}", flush=True)
        step = make_tiled_volume_step(
            model, args.depth, tr, dz_ratio=args.dz_ratio, fiber=fiber
        )
    else:
        geom = volume_geometry(dz_ratio=args.dz_ratio, fiber=fiber)
        step = lambda s: model.step(s, geom)

    state_mb = (len(model.state_keys()) * args.depth * args.height
                * args.width * 4 / 2 ** 20)
    state = {k: jnp.asarray(v)
             for k, v in volume_state(model, args.depth).items()}

    if args.mesh1:
        from jax.sharding import Mesh
        from fib_tf_tpu.parallel.volume_spmd import make_volume_spmd_chunk

        mesh = Mesh(np.array(jax.devices()[:1]), ("z",))

        def make_scan(n):
            chunk = make_volume_spmd_chunk(
                model, mesh, n, args.depth, dz_ratio=args.dz_ratio,
                fiber=fiber, use_kernel=(args.kernel == "whole"),
                halo_k=args.halo_k,
            )
            buf = jnp.zeros((), jnp.float32)

            def scan(s):
                return chunk(s, buf, jnp.int32(0))[0]
            return scan
    else:
        def make_scan(n):
            @jax.jit
            def scan(s):
                return jax.lax.scan(lambda st, _: (step(st), None), s, None,
                                    length=n)[0]
            return scan

    scan1, scan2 = make_scan(args.outer), make_scan(2 * args.outer)
    print(f"compiling... (state {state_mb:.1f} MB)", flush=True)
    sync(scan1(state))
    sync(scan2(state))
    t1 = time_fn(scan1, state, iters=args.iters, warmup=1)
    t2 = time_fn(scan2, state, iters=args.iters, warmup=1)
    substeps = args.outer * model.dt_per_step
    us = (t2 - t1) / substeps * 1e6
    cells = args.depth * args.height * args.width
    gcup = cells / us * 1e-3
    print(f"{args.model} {args.kernel} @ {args.depth}x{args.height}x"
          f"{args.width}: {us:.1f} us/substep ({gcup:.1f} G cell-updates/s;"
          f" t1={t1*1e3:.1f} ms, t2={t2*1e3:.1f} ms, {substeps} substeps)")


if __name__ == "__main__":
    main()
