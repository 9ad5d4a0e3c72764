#!/usr/bin/env python
"""Fenton 4v spiral-wave experiment.

The canonical end-to-end run (reference fenton.py:155-187): 512x512 sheet,
circular obstacle at the center, S1 stripe + S2 left-upper-quadrant
cross-stimulation at 210 ms, spiral anchors to the hole; a [T, H, W]
voltage movie is saved as cube.npy for replay with examples/playcube.py.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.models import Fenton4v
from fib_tf_tpu.utils import viz


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--duration", type=float, default=1000.0)
    args = ap.parse_args()
    n = args.size
    cfg = SimConfig(
        width=n, height=n, dt=0.1, dt_per_plot=10, diff=1.5,
        duration=args.duration, timeline=False, save_graph=False,
    )
    sim = Simulation(Fenton4v(cfg))
    sim.add_hole_to_phase_field(n // 2, n // 2, max(n // 17, 4))
    sim.define()
    sim.add_pace_op("s2", "luq", 1.0)

    res = sim.simulate(
        schedule=[(210, "s2")],
        record_frames_every_ms=10,
    )
    print(f"elapsed: {res.elapsed:.3f} s  "
          f"({res.cell_updates_per_sec/1e9:.2f} G cell-updates/s, "
          f"{res.sim_seconds_per_wall_second:.2f}x real time)")

    viz.save_cube("cube", res.frames)
    # optional live view of the final frame
    im = viz.Screen(cfg.height, cfg.width, "Fenton 4v")
    im.imshow(res.frames[-1])
    im.save("fenton_final.png")


if __name__ == "__main__":
    main()
