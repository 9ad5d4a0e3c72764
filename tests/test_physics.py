"""Physics acceptance tests against the reference's measured validation
data: conduction velocity vs diffusion coefficient
(diff_conduction_velcoty.dat: FENTON vel = 29 + 50*diff,
BEELER-REUTER vel = 21 + 28*diff, in cm/s).

The absolute cm/s scale depends on the (unpublished) grid spacing, so the
unit-free check is the *shape* of the linear law: measured CV in cells/ms
at several diffusion values must be linear with the same intercept/slope
ratio as the published fits.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import BeelerReuter, Fenton4v, grid_geometry


def measure_cv_cells_per_ms(model, threshold, x0=30, x1=90, max_ms=120):
    """Planar-wave conduction velocity on a narrow strip: S1 at the left
    edge, time the wavefront between columns x0 and x1 at mid-height."""
    geom = grid_geometry()
    state = {k: jnp.asarray(v) for k, v in model.initial_state(s1=True).items()}
    key = model.pot_key
    row = model.cfg.height // 2

    def body(s, _):
        s = model.step(s, geom)
        return s, jnp.stack([s[key][row, x0], s[key][row, x1]])

    n_outer = int(max_ms / (model.dt_per_step * model.cfg.dt))
    _, probes = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n_outer)
    )(state)
    probes = np.asarray(probes)

    t = {}
    for j, col in enumerate((x0, x1)):
        above = np.where(probes[:, j] > threshold)[0]
        if len(above) == 0:
            raise AssertionError(f"wave never reached column {col}")
        t[col] = above[0] * model.dt_per_step * model.cfg.dt
    dt_ms = t[x1] - t[x0]
    assert dt_ms > 0, "front must reach x1 after x0"
    return (x1 - x0) / dt_ms


def fit_line(xs, ys):
    slope, intercept = np.polyfit(xs, ys, 1)
    return intercept, slope


class TestConductionVelocity:
    def test_fenton_linear_law(self):
        cfg = SimConfig(width=128, height=16, dt=0.1, duration=1)
        diffs = [0.5, 1.0, 1.5]
        cvs = []
        for d in diffs:
            model = Fenton4v(cfg.replace(diff=d))
            cvs.append(measure_cv_cells_per_ms(model, threshold=0.5))
        # CV must increase with diffusion
        assert cvs[0] < cvs[1] < cvs[2]
        intercept, slope = fit_line(diffs, cvs)
        # published law: vel = 29 + 50*diff -> intercept/slope = 0.58
        ratio = intercept / slope
        assert ratio == pytest.approx(29.0 / 50.0, abs=0.35)

    def test_beeler_reuter_linear_law(self):
        cfg = SimConfig(width=128, height=16, dt=0.1, duration=1,
                        cheby=False, skip=False)
        diffs = [0.5, 1.0, 2.0]
        cvs = []
        for d in diffs:
            model = BeelerReuter(cfg.replace(diff=d))
            cvs.append(measure_cv_cells_per_ms(model, threshold=-40.0))
        assert cvs[0] < cvs[1] < cvs[2]
        intercept, slope = fit_line(diffs, cvs)
        # published law: vel = 21 + 28*diff -> intercept/slope = 0.75
        ratio = intercept / slope
        assert ratio == pytest.approx(21.0 / 28.0, abs=0.45)

    def test_fenton_cv_ratio_between_diffs(self):
        """Direct ratio check against the published table rows
        (diff_conduction_velcoty.dat): CV(1.5)/CV(0.5) = 101.0/52.8."""
        cfg = SimConfig(width=128, height=16, dt=0.1, duration=1)
        cv05 = measure_cv_cells_per_ms(
            Fenton4v(cfg.replace(diff=0.5)), threshold=0.5
        )
        cv15 = measure_cv_cells_per_ms(
            Fenton4v(cfg.replace(diff=1.5)), threshold=0.5
        )
        assert cv15 / cv05 == pytest.approx(101.0 / 52.8, rel=0.15)
