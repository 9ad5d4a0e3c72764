"""Headline benchmark: Beeler-Reuter, 512x512, dt=0.1 ms, cheby+skip —
the reference's best published configuration (details.md Table 1:
3.9 wall-s per simulated second on a GTX-1080).

Prints ONE JSON line:  {"metric", "value", "unit", "vs_baseline",
                        "spread", "samples"}
("samples", not "n": the driver's wrapping artifact has its own
top-level "n" meaning the round number, and one key with two meanings
in one file misleads round-over-round tooling — ADVICE r4.)
  value       = MEDIAN wall-seconds per simulated second over `n`
                repeated runs (lower is better)
  spread      = [min, max] across the runs (VERDICT r3 #4: a scoreboard
                needs its noise quantified, not guessed)
  vs_baseline = 3.9 / value  (speedup over the reference's best GPU
                number)

Run on whatever jax.devices() provides (the real TPU chip under axon).
Compile time is excluded (the engine pre-compiles its chunks; runs after
the first reuse the same executable).
"""

import json
import statistics
import sys

REFERENCE_BEST_S_PER_SIM_S = 3.9   # BASELINE.md: BR cheby+skip on GTX-1080
N_RUNS = 5


def main():
    from fib_tf_tpu.utils import cache
    cache.enable()  # Pallas kernel compiles are minutes; cache them on disk

    from fib_tf_tpu.config import SimConfig
    from fib_tf_tpu.engine import Simulation
    from fib_tf_tpu.models import BeelerReuter

    # 20 s of simulated time per run: the one-off per-run costs (~60-90 ms
    # of device-tunnel syncs) are <0.3% of the measurement, so each sample
    # is the steady-state rate (the kernel itself is ~10.6 us/substep at
    # the engine's br+skip spl=1 launch-split default = 0.106 wall-s/sim-s)
    sim_ms = float(sys.argv[1]) if len(sys.argv) > 1 else 20000.0
    n_runs = int(sys.argv[2]) if len(sys.argv) > 2 else N_RUNS
    cfg = SimConfig(
        width=512, height=512, dt=0.1, dt_per_plot=10, diff=0.809,
        duration=sim_ms, cheby=True, skip=True,
    )
    sim = Simulation(BeelerReuter(cfg)).define()
    # simulate()'s internal warmup compiles + executes every chunk length
    # once before its timed region, so run 1 is already steady-state; the
    # remaining runs reuse the compiled chunk directly
    samples = []
    for _ in range(n_runs):
        res = sim.simulate(check_finite=False)
        samples.append(res.elapsed / (sim_ms / 1000.0))

    value = statistics.median(samples)
    print(json.dumps({
        "metric": "beeler_reuter_512x512_cheby_skip_wall_s_per_sim_s",
        "value": round(value, 6),
        "unit": "wall_s_per_sim_s",
        "vs_baseline": round(REFERENCE_BEST_S_PER_SIM_S / value, 2),
        "spread": [round(min(samples), 6), round(max(samples), 6)],
        "samples": n_runs,
    }))


if __name__ == "__main__":
    main()
