#!/usr/bin/env python
"""Courtemanche chained two-model run with state handoff.

Reference court.py:585-636: an annulus domain (disk hole + neg ring),
S2 at 350 ms, trend probe (V and Na_i at a pixel) recorded every 10 dt,
then a SECOND model with different geometry seeded from the first model's
final state (the checkpoint/resume pattern), trends concatenated and saved.
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import numpy as np

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine import Simulation
from fib_tf_tpu.models import Courtemanche


def cl_observer(i, cl):
    print("Observer: %d:\t%d" % (i, cl))


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--duration", type=float, default=1000.0)
    ap.add_argument("--adaptive-dv", type=float, default=None,
                    help="adaptive-dt step-doubling threshold in mV "
                         "(e.g. 25): lets long fibrillatory runs "
                         "integrate through the explicit-Euler stiffness "
                         "instead of raising (forces the XLA path)")
    args = ap.parse_args()
    n = args.size
    # note: the reference ran 20000 ms; this demo trims to 1000 ms per
    # model.  Long fibrillatory runs against the 1e-5 phase-field floor can
    # eventually hit explicit-Euler stiffness; unlike the reference (whose
    # NaN guard was commented out, ionic.py:208-212) the engine raises
    # FloatingPointError instead of silently integrating NaNs —
    # --adaptive-dv 25 re-takes the offending substeps at refined dt
    # instead (ops/adaptive.py).
    cfg = SimConfig(
        width=n, height=n, dt=0.1, dt_per_plot=10, diff=0.809,
        duration=args.duration, adaptive_dv=args.adaptive_dv,
    )

    sim1 = Simulation(Courtemanche(cfg))
    sim1.add_hole_to_phase_field(n // 2, n // 2, max(n // 17, 4))
    sim1.add_hole_to_phase_field(n // 2, n // 2, n // 2 - 6, neg=True)
    sim1.define()
    sim1.add_pace_op("s2", "luq", 10.0)
    sim1.cl_observer = cl_observer

    res1 = sim1.simulate(schedule=[(min(350, args.duration * 0.35), "s2")])
    data = [res1.probes["trend"]]

    sim2 = Simulation(Courtemanche(cfg))
    sim2.add_hole_to_phase_field(n // 2, n // 2, max(n // 5, 8))
    sim2.add_hole_to_phase_field(n // 2, n // 2, n // 2 - 6, neg=True)
    sim2.define(state=res1.state)        # resume from model 1's final state
    sim2.cl_observer = cl_observer

    res2 = sim2.simulate()
    data.append(res2.probes["trend"])

    np.savetxt("vol_na_2.dat", np.concatenate(data))
    print("saved trend data:", sum(len(d) for d in data), "samples")


if __name__ == "__main__":
    main()
