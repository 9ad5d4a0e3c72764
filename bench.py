"""Headline benchmark: Beeler-Reuter, 512x512, dt=0.1 ms, cheby+skip —
the reference's best published configuration (details.md Table 1:
3.9 wall-s per simulated second on a GTX-1080).

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline"}
  value       = wall-seconds per simulated second (lower is better)
  vs_baseline = 3.9 / value  (speedup over the reference's best GPU number)

Run on whatever jax.devices() provides (the real TPU chip under axon).
Compile time is excluded (the engine pre-compiles its chunks).
"""

import json
import sys

REFERENCE_BEST_S_PER_SIM_S = 3.9   # BASELINE.md: BR cheby+skip on GTX-1080


def main():
    from fib_tf_tpu.utils import cache
    cache.enable()  # Pallas kernel compiles are minutes; cache them on disk

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.engine import Simulation
    from fib_tf_tpu.models import BeelerReuter

    # 20 s of simulated time: the one-off per-run costs (~60-90 ms of
    # device-tunnel syncs) are <0.3% of the measurement, so the number
    # is the steady-state rate (0.123 at 5 s vs 0.1145 at 20 s; the
    # kernel itself is 10.8 us/substep = 0.108)
    sim_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 20000.0
    cfg = SimConfig(
        width=512, height=512, dt=0.1, dt_per_plot=10, diff=0.809,
        duration=sim_ms, cheby=True, skip=True,
    )
    sim = Simulation(BeelerReuter(cfg)).define()
    # simulate()'s internal warmup compiles + executes every chunk length
    # once before the timed region; a full extra 20 s-sim warm-up run adds
    # no statistical power (VERDICT r2 #10) and doubled bench wall time
    res = sim.simulate(check_finite=False)

    wall_per_sim_s = res.elapsed / (sim_ms / 1000.0)
    print(json.dumps({
        "metric": "beeler_reuter_512x512_cheby_skip_wall_s_per_sim_s",
        "value": round(wall_per_sim_s, 6),
        "unit": "wall_s_per_sim_s",
        "vs_baseline": round(REFERENCE_BEST_S_PER_SIM_S / wall_per_sim_s, 2),
    }))


if __name__ == "__main__":
    main()
