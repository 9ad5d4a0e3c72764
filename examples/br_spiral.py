#!/usr/bin/env python
"""Beeler-Reuter spiral-wave experiment with the optimization matrix.

Reference br.py:347-382: 512x512, obstacle at (150, 200) r=40, S2 at
300 ms; the cheby/skip flags select the compile-time variants benchmarked
in the reference's Table 1.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse

import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.models import BeelerReuter
from fib_tf_tpu.utils import viz


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cheby", action="store_true", default=True)
    ap.add_argument("--no-cheby", dest="cheby", action="store_false")
    ap.add_argument("--skip", action="store_true", default=False)
    ap.add_argument("--duration", type=float, default=1000.0)
    ap.add_argument("--size", type=int, default=512)
    args = ap.parse_args()

    n = args.size
    cfg = SimConfig(
        width=n, height=n, dt=0.1, dt_per_plot=10, diff=0.809,
        duration=args.duration, cheby=args.cheby, skip=args.skip,
    )
    sim = Simulation(BeelerReuter(cfg))
    sim.add_hole_to_phase_field(n * 150 // 512, n * 200 // 512,
                                max(n * 40 // 512, 4))
    sim.define()
    sim.add_pace_op("s2", "luq", 10.0)

    res = sim.simulate(schedule=[(min(300, args.duration * 0.3), "s2")],
                       record_frames_every_ms=10)
    print(f"cheby={args.cheby} skip={args.skip}: {res.elapsed:.3f} s "
          f"({res.sim_seconds_per_wall_second:.2f}x real time)")
    for i, cl in res.cycle_lengths:
        print(f"wavefront at step {i}, cycle length {cl:.0f} ms")

    viz.save_cube("cube", res.frames)
    im = viz.Screen(cfg.height, cfg.width, "Beeler-Reuter")
    im.imshow(res.frames[-1])
    im.save("br_final.png")


if __name__ == "__main__":
    main()
