#!/usr/bin/env python
"""Anisotropic fiber conduction demo: a point stimulus in fibrous tissue
produces an ELLIPTICAL wavefront whose long axis follows the fibers.

No reference counterpart (the reference only reserved a fiber field in
its native Config, common.h:21-24); this exercises the framework's
fiber_angle/fiber_ratio extension.  Saves a snapshot PNG and reports the
measured long/short axis ratio of the wavefront.
"""

import argparse
import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.models import Fenton4v
from fib_tf_tpu.utils.viz import Screen


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--size", type=int, default=256)
    p.add_argument("--duration", type=float, default=20.0)
    p.add_argument("--angle", type=float, default=0.0,
                   help="fiber angle in degrees from the x axis")
    p.add_argument("--ratio", type=float, default=0.25,
                   help="cross-fiber conduction fraction")
    p.add_argument("--out", default="anisotropy.png")
    args = p.parse_args()

    n = args.size
    cfg = SimConfig(
        width=n, height=n, dt=0.1, dt_per_plot=10, diff=1.5,
        duration=args.duration,
        fiber_angle=np.deg2rad(args.angle), fiber_ratio=args.ratio,
    )
    sim = Simulation(Fenton4v(cfg))
    sim.define(s1=False)                 # no S1 stripe: point stimulus only

    # a small square stimulus at the center (a point source)
    state = sim.model.initial_state(s1=False)
    c = n // 2
    state["u"][c - 2 : c + 2, c - 2 : c + 2] = 1.0

    res = sim.simulate(state=state)
    u = res.state["u"]

    # wavefront extent along x and y through the center
    above = u[c, :] > 0.2
    x_extent = int(above.sum())
    above = u[:, c] > 0.2
    y_extent = int(above.sum())
    long_axis = max(x_extent, y_extent)
    short_axis = max(min(x_extent, y_extent), 1)
    print(f"wavefront extent: x={x_extent} y={y_extent} cells "
          f"(long/short = {long_axis / short_axis:.2f}; fibers at "
          f"{args.angle:.0f} deg, ratio {args.ratio})")

    im = Screen(n, n, "anisotropy", backend="headless")
    im.imshow(u)
    im.save(args.out)
    print(f"saved {args.out}")


if __name__ == "__main__":
    main()
