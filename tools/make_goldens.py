#!/usr/bin/env python
"""Generate the golden 0D action-potential traces in tests/golden/.

Run on the CPU backend in float32.  These pin the numerical behavior of
the model zoo (SURVEY.md §4b): any refactor — kernel rewrites, op
reorderings, new fast paths — must keep reproducing them to 1e-3 relative
tolerance at matching sample times.

Regenerating: python tools/make_goldens.py  (only when a deliberate
physics change is made; note it in the commit message).
"""

import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from fib_tf_tpu.config import SimConfig  # noqa: E402
from fib_tf_tpu.models import (  # noqa: E402
    BeelerReuter,
    Courtemanche,
    CourtemancheUltra,
    Fenton4v,
    LuoRudy91,
    TenTusscher06,
    cell_geometry,
)

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "golden")


def trace_cell(model, state, n_outer):
    geom = cell_geometry()

    def body(s, _):
        s = model.step(s, geom)
        return s, s[model.pot_key][0, 0]

    state = {k: jnp.asarray(v) for k, v in state.items()}
    _, tr = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n_outer)
    )(state)
    return np.asarray(tr)


def main():
    os.makedirs(OUT, exist_ok=True)
    cfg = SimConfig(width=8, height=8, dt=0.1, duration=1)

    specs = {
        # name -> (model, stim_value, n_outer)
        "fenton_ap": (Fenton4v(cfg), 0.3, 400),
        "br_direct_ap": (BeelerReuter(cfg.replace(cheby=False)), -30.0, 700),
        "br_cheby_ap": (BeelerReuter(cfg.replace(cheby=True)), -30.0, 700),
        "br_cheby_skip_ap": (
            BeelerReuter(cfg.replace(cheby=True, skip=True)), -30.0, 700),
        "court_ap": (Courtemanche(cfg), 20.0, 400),
        "court_table_ap": (Courtemanche(cfg.replace(table=True)), 20.0, 400),
        "court_ultra_ap": (CourtemancheUltra(cfg), 20.0, 400),
        # lr1 is stiff: dt=0.02 (its recommended dt), 0.2 ms per outer
        # step, 2200 samples = 440 ms (APD90 ~367 ms fits in the trace)
        "lr1_ap": (LuoRudy91(cfg.replace(dt=0.02)), -30.0, 2200),
        # tp06 shares lr1's stiffness: dt=0.02, 2000 samples = 400 ms
        # (epi APD90 ~302 ms fits in the trace)
        "tp06_ap": (TenTusscher06(cfg.replace(dt=0.02)), 20.0, 2000),
        "tp06_skip_ap": (
            TenTusscher06(cfg.replace(dt=0.02, skip=True)), 20.0, 2000),
    }
    for name, (model, stim, n) in specs.items():
        state = model.initial_state(s1=False)
        state[model.pot_key][:] = stim
        tr = trace_cell(model, state, n)
        np.save(os.path.join(OUT, f"{name}.npy"), tr)
        print(f"{name}: {n} samples, peak={tr.max():.4f}, "
              f"final={tr[-1]:.4f}")

    # tissue-level golden (see tests/test_golden.py::test_golden_tissue)
    from fib_tf_tpu.engine import Simulation

    tcfg = SimConfig(width=32, height=32, dt=0.1, dt_per_plot=10,
                     diff=1.5, duration=8)
    sim = Simulation(Fenton4v(tcfg))
    sim.add_hole_to_phase_field(16, 16, 5)
    sim.define()
    sim.add_pace_op("s2", "luq", 1.0)
    res = sim.simulate(schedule=[(4, "s2")])
    np.save(os.path.join(OUT, "fenton_tissue_u.npy"), res.state["u"])
    print(f"fenton_tissue_u: sum={res.state['u'].sum():.4f}")


if __name__ == "__main__":
    main()
