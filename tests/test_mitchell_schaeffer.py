"""Mitchell-Schaeffer 2003 two-variable model (models/mitchell_schaeffer).

Zoo extension beyond the reference's three families.  The model's value
for validation: the gate ODE is piecewise-linear, so our Rush-Larsen-form
substep is EXACT, and the paper's analysis gives closed-form relations —
the APD satisfies h(t) = h_peak·exp(−APD/τ_close) exactly during the
closing phase, and the τ_in→0 asymptote APD_max = τ_close·ln(τ_out/4τ_in)
(Mitchell & Schaeffer 2003 eqs. 11-13) bounds it."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import MODEL_REGISTRY
from fib_tf_tpu.models.base import cell_geometry, grid_geometry
from fib_tf_tpu.models.mitchell_schaeffer import (
    TAU_CLOSE,
    TAU_IN,
    TAU_OUT,
    U_GATE,
    MitchellSchaeffer,
    apd_max_analytic,
)


def ap_trace(n_outer=500, dt=0.1):
    cfg = SimConfig(width=4, height=4, dt=dt)
    m = MitchellSchaeffer(cfg)
    geom = cell_geometry()
    s = {k: jnp.asarray(v) for k, v in m.initial_state(s1=False).items()}
    s = {**s, "u": s["u"] + 0.3}  # suprathreshold kick from rest
    step = jax.jit(lambda s: m.step(s, geom))
    us, hs = [], []
    for _ in range(n_outer):
        s = step(s)
        us.append(float(s["u"][0, 0]))
        hs.append(float(s["h"][0, 0]))
    return np.array(us), np.array(hs)


@pytest.fixture(scope="module")
def ap():
    return ap_trace()


class TestActionPotential:
    def test_registry(self):
        assert MODEL_REGISTRY["ms"] is MitchellSchaeffer
        assert MODEL_REGISTRY["mitchell_schaeffer"] is MitchellSchaeffer

    def test_upstroke_regenerates_to_near_one(self, ap):
        us, _ = ap
        assert 0.9 < us.max() <= 1.0

    def test_returns_to_rest(self, ap):
        us, hs = ap
        assert us[-1] < 1e-3
        assert hs[-1] > 0.8  # gate mostly reopened by 500 ms

    def test_apd_matches_exact_gate_relation(self, ap):
        """During the closing phase h decays exactly with τ_close, so
        the time above u_gate must equal τ_close·ln(h_start/h_min)."""
        us, hs = ap
        above = us > U_GATE
        apd = above.sum() * 1.0  # outer step = 1 ms
        h_start = hs[np.argmax(above)]  # h at gate-crossing (≈1 from rest)
        h_min = hs.min()
        predicted = TAU_CLOSE * np.log(h_start / h_min)
        assert apd == pytest.approx(predicted, rel=0.02)

    def test_apd_near_paper_asymptote(self, ap):
        """The τ_in→0 asymptote APD_max = τ_close·ln(τ_out/(4·τ_in)) =
        241 ms; at the canonical parameters the finite-τ_in AP runs
        ~18% longer (h_min 0.15 vs the asymptotic 0.20).  Pin the
        measured value to the asymptote within that documented band."""
        us, _ = ap
        apd = (us > U_GATE).sum() * 1.0
        assert apd_max_analytic() == pytest.approx(241.4, abs=0.5)
        assert apd_max_analytic() < apd < 1.3 * apd_max_analytic()

    def test_h_min_bracketed_by_asymptote(self, ap):
        _, hs = ap
        h_min_asym = 4.0 * TAU_IN / TAU_OUT
        assert 0.5 * h_min_asym < hs.min() < h_min_asym

    def test_exact_gate_substep_vs_euler(self):
        """The exponential h update is exact: halving dt must not change
        the h trajectory at matched times (to float noise), unlike an
        Euler gate."""
        _, h1 = ap_trace(n_outer=100, dt=0.1)
        _, h2 = ap_trace(n_outer=200, dt=0.05)
        np.testing.assert_allclose(h1, h2[1::2], rtol=5e-2, atol=5e-3)


class TestTissue:
    def test_planar_cv_scales_with_sqrt_diff(self):
        def cv(diff):
            cfg = SimConfig(width=128, height=8, dt=0.1, diff=diff)
            m = MitchellSchaeffer(cfg)
            g = grid_geometry()
            s = {k: jnp.asarray(v) for k, v in m.initial_state().items()}
            step = jax.jit(lambda s: m.step(s, g))
            t = {}
            for i in range(400):
                s = step(s)
                for xc in (30, 90):
                    if xc not in t and float(s["u"][4, xc]) > 0.5:
                        t[xc] = i + 1.0
                if len(t) == 2:
                    return 60.0 / (t[90] - t[30])
            raise AssertionError("wave never crossed the strip")

        c1, c2 = cv(1.5), cv(0.375)
        assert c1 == pytest.approx(1.82, rel=0.05)  # as-built pin
        assert c1 / c2 == pytest.approx(2.0, rel=0.15)  # CV ∝ sqrt(D)

    def test_engine_simulate(self):
        from fib_tf_tpu.engine import Simulation

        cfg = SimConfig(width=32, height=32, dt=0.1, duration=30,
                        dt_per_plot=10)
        sim = Simulation(MitchellSchaeffer(cfg)).define()
        res = sim.simulate()
        assert np.isfinite(res.probes["v"]).all()
        assert res.probes["v"].max() > 0.5  # the S1 wave passes the probe

    def test_runs_in_3d(self):
        from fib_tf_tpu.engine.volume import run_volume

        m = MitchellSchaeffer(SimConfig(width=24, height=24, dt=0.05))
        final, probes, _ = run_volume(m, depth=4, n_outer=20)
        assert np.isfinite(final["u"]).all()

    def test_adaptive_compatible(self):
        geom = grid_geometry()
        cfg = SimConfig(width=16, height=16, dt=0.1)
        plain = MitchellSchaeffer(cfg)
        adapt = MitchellSchaeffer(cfg.replace(adaptive_dv=1e9))
        s = {k: jnp.asarray(v) for k, v in plain.initial_state().items()}
        a = b = s
        for _ in range(5):
            a = plain.step(a, geom)
            b = adapt.step(b, geom)
        for k in a:
            np.testing.assert_allclose(a[k], b[k], rtol=1e-6, atol=1e-8)
