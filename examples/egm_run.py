#!/usr/bin/env python
"""Pseudo-electrogram over a Beeler-Reuter spiral.

Reference egm.py:15-50: two Gaussian virtual electrodes (r=5) at
(300±15, 256) over a BR sheet with an obstacle at (150, 256) r=50; the
masked-mean samples (computed ON-DEVICE here, inside the compiled scan)
are taken every 1 ms and saved as a bipolar electrogram.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.engine.observers import ElectrogramRecorder
from fib_tf_tpu.models import BeelerReuter


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--duration", type=float, default=3000.0)
    args = ap.parse_args()
    cfg = SimConfig(
        width=args.size, height=args.size, dt=0.1, dt_per_plot=10,
        diff=1.0, duration=args.duration, cheby=True, skip=False,
    )
    sim = Simulation(BeelerReuter(cfg))
    sim.add_hole_to_phase_field(150, 256, 50)
    sim.add_electrode(300 + 15, 256, radius=5)
    sim.add_electrode(300 - 15, 256, radius=5)
    sim.define()
    sim.add_pace_op("s2", "luq", 10.0)

    res = sim.simulate(schedule=[(300, "s2")])

    rec = ElectrogramRecorder(every_ms=1.0, dt=cfg.dt,
                              dt_per_step=sim.model.dt_per_step)
    rec.feed(0, res.probes["egm"])
    rec.save("test.dat")
    egm = rec.as_array()
    bipolar = egm[:, 0] - egm[:, 1]
    print(f"saved {egm.shape[0]} samples; bipolar p-p = "
          f"{bipolar.max() - bipolar.min():.6f}")


if __name__ == "__main__":
    main()
