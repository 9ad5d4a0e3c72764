"""Published-physiology pins (VERDICT r2 #4).

Absolute 0D action-potential characteristics checked against the model
papers, NOT against this repo's own goldens — so a rate-math bug that the
self-goldens and the CV-ratio tests both inherit (shared ancestry with the
C++ cross-check) still fails here.

Ground truth:
- Courtemanche, Ramirez & Nattel 1998 (Am J Physiol 275:H301): resting
  potential -81.2 mV, AP amplitude ~105 mV, APD90 ~300 ms for the healthy
  cell (their Fig. 2 / Table 2).  Reproduced here with ``chronic=False``.
- Chronic-AF remodeling (reference court.py:167-170: g_to x0.5, g_CaL
  x0.3, g_Kur scaled) shortens APD90 by ~25% — consistent with the AF
  electrical-remodeling literature the reference models (e.g.
  Courtemanche et al. 1999 companion paper).  The default config
  (chronic=True) is pinned at its measured 228 ms with that reasoning.
- Beeler & Reuter 1977 (J Physiol 268:177): resting potential -84.57 mV,
  amplitude ~105 mV, max upstroke velocity ~115 V/s.  NOTE the reference
  deliberately doubles the d/f (Ca) gate rates (br.py:49-62, the ab_coef
  x2 quirk) which shortens the plateau: APD90 measures ~200 ms instead of
  the paper's ~285 ms.  The quirk is load-bearing parity (CLAUDE.md), so
  APD90 is pinned at the as-built value with this explanation.
- Fenton 4v minimal model (per the reference fenton.py parameter set,
  lineage Cherry & Fenton 2007 / Bueno-Orovio 2008): dimensionless u in
  [0, ~1]; pinned at the as-built peak/APD90 as drift detectors (the
  external ground truth for fenton is the CV table in test_physics.py).

Protocol: 4x4 cell geometry (no diffusion), quiesce >=1 s from the model
initial conditions, then a suprathreshold voltage reset (the reference's
S1 mechanism, e.g. court.py:80-82) and record the transmembrane potential
every outer step.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.models import (
    BeelerReuter,
    Courtemanche,
    Fenton4v,
    cell_geometry,
)

GEOM = cell_geometry()


def _scan_trace(step_fn, state, n, key):
    state = {k: jnp.asarray(v) for k, v in state.items()}

    def body(s, _):
        s = step_fn(s)
        return s, s[key][0, 0]

    final, tr = jax.jit(
        lambda s: jax.lax.scan(body, s, None, length=n)
    )(state)
    return jax.device_get(final), np.asarray(tr)


def apd90(tr, rest, dt_ms):
    """AP duration at 90% repolarization: first up-crossing of the 90%
    level to the first down-crossing after the peak."""
    peak = tr.max()
    thr = peak - 0.9 * (peak - rest)
    i_peak = int(tr.argmax())
    below = np.where(tr[i_peak:] < thr)[0]
    up = np.where(tr >= thr)[0][0]
    assert len(below), "AP did not repolarize within the trace"
    return float((i_peak + below[0] - up) * dt_ms)


def _court_ap(chronic):
    cfg = SimConfig(width=4, height=4, dt=0.1, duration=10, chronic=chronic)
    model = Courtemanche(cfg)
    quiet, tr_q = _scan_trace(
        lambda s: model.step(s, GEOM), model.initial_state(s1=False),
        1500, "V")  # 1 ms per outer step
    rest = float(tr_q[-1])
    stim = {k: np.array(v) for k, v in quiet.items()}
    stim["V"] = np.full_like(stim["V"], 0.0)  # suprathreshold reset
    _, tr = _scan_trace(lambda s: model.step(s, GEOM), stim, 600, "V")
    return rest, tr


@pytest.fixture(scope="module")
def court_healthy():
    return _court_ap(chronic=False)


@pytest.fixture(scope="module")
def court_chronic():
    return _court_ap(chronic=True)


@pytest.fixture(scope="module")
def br_ap():
    cfg = SimConfig(width=4, height=4, dt=0.1, duration=10,
                    cheby=False, skip=False)
    model = BeelerReuter(cfg)
    quiet, tr_q = _scan_trace(
        lambda s: model.step(s, GEOM), model.initial_state(s1=False),
        3000, "V")  # dt_per_step substeps of 0.1 ms per sample
    rest = float(tr_q[-1])
    stim = {k: np.array(v) for k, v in quiet.items()}
    # jump to -50 mV (suprathreshold, Na gates still at rest) so the
    # genuine Na upstroke is IN the trace; per-substep (0.1 ms) sampling
    # resolves dV/dt_max
    stim["V"] = np.full_like(stim["V"], -50.0)
    _, tr = _scan_trace(lambda s: model.solve(s, GEOM, n=1), stim,
                        5000, "V")
    return rest, tr


@pytest.fixture(scope="module")
def fenton_ap():
    cfg = SimConfig(width=4, height=4, dt=0.1, duration=10)
    model = Fenton4v(cfg)
    quiet, tr_q = _scan_trace(
        lambda s: model.step(s, GEOM), model.initial_state(s1=False),
        1000, "u")  # 1 ms per outer step (dt_per_step=10)
    rest = float(tr_q[-1])
    stim = {k: np.array(v) for k, v in quiet.items()}
    stim["u"] = np.full_like(stim["u"], 0.3)
    _, tr = _scan_trace(lambda s: model.step(s, GEOM), stim, 500, "u")
    return rest, tr


class TestCourtemanche1998:
    """Courtemanche 1998, healthy cell (chronic=False)."""

    def test_resting_potential(self, court_healthy):
        rest, _ = court_healthy
        # paper: -81.2 mV; must hold its rest (no drift) after 1.5 s
        assert rest == pytest.approx(-81.2, abs=0.8)

    def test_ap_amplitude(self, court_healthy):
        rest, tr = court_healthy
        assert float(tr.max()) - rest == pytest.approx(105.0, rel=0.05)

    def test_apd90(self, court_healthy):
        rest, tr = court_healthy
        # paper: ~300 ms; measured 297 ms
        assert apd90(tr, rest, 1.0) == pytest.approx(300.0, rel=0.05)


class TestCourtemancheChronicAF:
    """Default config (chronic=True): AF remodeling shortens APD90 ~25%."""

    def test_resting_potential(self, court_chronic):
        rest, _ = court_chronic
        assert rest == pytest.approx(-81.2, abs=0.8)

    def test_apd90_shortened(self, court_chronic):
        rest, tr = court_chronic
        a = apd90(tr, rest, 1.0)
        assert a == pytest.approx(228.0, rel=0.04)
        # and it IS a shortening vs healthy (sanity on the remodeling)
        assert a < 260.0


class TestBeelerReuter1977:
    def test_resting_potential(self, br_ap):
        rest, _ = br_ap
        # paper IC: -84.57 mV; the as-built equilibrium settles ~1.7 mV
        # above it over 3 s (slow Ca/j relaxation under the RL quirks)
        assert rest == pytest.approx(-84.57, abs=2.5)

    def test_ap_amplitude(self, br_ap):
        rest, tr = br_ap
        assert float(tr.max()) - rest == pytest.approx(105.0, rel=0.08)

    def test_max_upstroke(self, br_ap):
        _, tr = br_ap
        # paper: ~115 V/s (measured 120 from the -50 mV jump)
        dvdt = np.diff(tr) / 0.1  # mV/ms == V/s
        assert float(dvdt.max()) == pytest.approx(115.0, rel=0.10)

    def test_peak_is_vclip(self, br_ap):
        # the reference clips V at +25 mV (br.py V-clip quirk); the AP
        # peak therefore sits exactly on the clip
        _, tr = br_ap
        assert float(tr.max()) == pytest.approx(25.0, abs=0.2)

    def test_apd90_asbuilt(self, br_ap):
        rest, tr = br_ap
        # ~200 ms as built (x2 d/f quirk), vs the paper's ~285 ms
        assert apd90(tr, rest, 0.1) == pytest.approx(200.0, rel=0.05)


class TestFenton4v:
    def test_rest_and_peak(self, fenton_ap):
        rest, tr = fenton_ap
        assert abs(rest) < 0.02          # dimensionless rest ~0
        assert float(tr.max()) == pytest.approx(0.99, abs=0.05)

    def test_apd90_asbuilt(self, fenton_ap):
        rest, tr = fenton_ap
        assert apd90(tr, rest, 1.0) == pytest.approx(196.0, rel=0.05)
