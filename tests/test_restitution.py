"""S1-S2 APD restitution protocol (engine/restitution.py).

The reference had no restitution tooling (serial one-process-per-run
scans were its only parameter-sweep mechanism); this is a beyond-parity
component built on the batched ensemble axis.
"""

import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.engine.restitution import (
    RestitutionResult, apd_at_level, restitution_scan,
)
from fib_tf_tpu.models import Fenton4v



# long tail: excluded from the smoke tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow

class TestApdAtLevel:
    def test_square_pulse(self):
        tr = np.zeros(100, np.float32)
        tr[10:50] = 1.0  # 40-sample AP at 2 ms/sample
        t_up, apd = apd_at_level(tr, rest=0.0, dt_ms=2.0)
        assert t_up == 20.0
        assert apd == 80.0

    def test_windowed_start(self):
        tr = np.zeros(100, np.float32)
        tr[10:30] = 1.0  # earlier beat, outside the window
        tr[60:80] = 1.0
        t_up, apd = apd_at_level(tr, rest=0.0, dt_ms=1.0, start=40)
        assert t_up == 60.0
        assert apd == 20.0

    def test_flat_trace_nan(self):
        t_up, apd = apd_at_level(np.zeros(50, np.float32), 0.0, 1.0)
        assert np.isnan(t_up) and np.isnan(apd)

    def test_no_repolarization_nan_apd(self):
        tr = np.zeros(50, np.float32)
        tr[10:] = 1.0
        t_up, apd = apd_at_level(tr, 0.0, 1.0)
        assert t_up == 10.0 and np.isnan(apd)


class TestRestitutionScan:
    @pytest.fixture(scope="class")
    def result(self) -> RestitutionResult:
        cfg = SimConfig(width=8, height=8, dt=0.1, duration=10, diff=1.5)
        model = Fenton4v(cfg)
        return restitution_scan(
            model, coupling_ms=np.array([120.0, 240.0, 320.0]),
            bcl_ms=350.0, n_s1=1, tail_ms=350.0,
        )

    def test_refractory_coupling_fails_to_capture(self, result):
        # fenton APD ~ 190 ms: an S2 at 120 ms is inside the AP
        assert not result.captured[0]
        assert np.isnan(result.apd_ms[0])

    def test_diastolic_couplings_capture(self, result):
        assert result.captured[1] and result.captured[2]
        assert np.isfinite(result.apd_ms[1:]).all()
        assert np.isfinite(result.di_ms[1:]).all()

    def test_s1_apd_physiological(self, result):
        # fenton 4v APD90 from rest is ~190 ms (tests/test_physiology.py
        # pins the paced value; the single-S1 beat is close)
        assert 150.0 <= result.apd_s1_ms <= 230.0

    def test_apd_shortens_at_short_di(self, result):
        # the defining restitution property: APD monotone in DI here
        assert result.di_ms[1] < result.di_ms[2]
        assert result.apd_ms[1] < result.apd_ms[2]
        assert result.apd_ms[2] <= result.apd_s1_ms + 5.0

    def test_slope_positive(self, result):
        s = result.slope()
        assert s is not None and 0.0 < s < 2.0

    def test_traces_shape(self, result):
        assert result.traces.shape[0] == 3
        assert result.dt_ms == 1.0


class TestDynamicRestitutionScan:
    """Dynamic (steady-state-pacing) protocol: one BCL per member,
    last-two-beats readout (engine/restitution.dynamic_restitution_scan).
    Measured fenton (dt=0.1, 8x8, 4 beats): APD 164/175/182/194 ms at
    BCL 220/260/300/400, DI 51..206, residual short-BCL beat-to-beat
    difference 5 ms."""

    @pytest.fixture(scope="class")
    def result(self):
        from fib_tf_tpu.engine.restitution import dynamic_restitution_scan

        cfg = SimConfig(width=8, height=8, dt=0.1, duration=10, diff=1.5)
        return dynamic_restitution_scan(
            Fenton4v(cfg), np.array([220.0, 260.0, 300.0, 400.0]),
            n_beats=4, tail_ms=350.0)

    def test_all_rates_capture(self, result):
        assert result.captured.all()

    def test_apd_shortens_with_rate(self, result):
        assert (np.diff(result.apd_ms) > 0).all()   # BCL-sorted ascending
        assert (np.diff(result.di_ms) > 0).all()
        assert result.apd_ms[0] == pytest.approx(164.0, abs=8.0)
        assert result.apd_ms[-1] == pytest.approx(194.0, abs=8.0)

    def test_alternans_small_and_rate_dependent(self, result):
        # fenton at these rates adapts within a few beats: beat-to-beat
        # difference largest at the shortest BCL, ~0 at BCL 400
        alt = result.alternans_ms
        assert np.isfinite(alt).all()
        assert alt[0] <= 10.0
        assert alt[-1] <= 0.5

    def test_di_consistent_with_bcl_minus_apd(self, result):
        # DI ~= BCL - APD_prev for 1:1 capture (measured, not assumed:
        # the upstroke-to-upstroke interval is the BCL)
        est = result.bcl_ms - result.apd_prev_ms
        np.testing.assert_allclose(result.di_ms, est, atol=6.0)

    def test_odd_n_beats_window_bounded(self):
        """Regression (r4 review): the penultimate beat's APD search is
        bounded at the NEXT stimulus.  With odd n_beats on an
        alternans-regime tp06 member the penultimate beat is the
        low-peak one; unbounded, apd_at_level found the global peak in
        the FINAL beat and returned a two-beat-spanning APD (591.8 ms,
        alternans = BCL, DI < 0) that still passed the capture gate."""
        from fib_tf_tpu.engine.restitution import dynamic_restitution_scan
        from fib_tf_tpu.models import TenTusscher06

        m = TenTusscher06(SimConfig(width=4, height=4, dt=0.02,
                                    duration=10))
        r = dynamic_restitution_scan(m, np.array([320.0]), n_beats=3,
                                     tail_ms=450.0)
        assert r.captured[0]
        assert r.apd_prev_ms[0] < 320.0        # within its own cycle
        assert r.di_ms[0] > 0.0
        # self-consistency: APD_prev + DI spans exactly one cycle
        # (the unbounded bug gave apd_prev 591.8, di -271.8)
        assert r.apd_prev_ms[0] + r.di_ms[0] == pytest.approx(320.0,
                                                              abs=2.0)
        # measured post-fix: a genuine large beat-2/beat-3 difference
        # (the un-settled alternans regime), NOT aliased to the BCL
        assert r.alternans_ms[0] == pytest.approx(139.2, abs=20.0)

    def test_n_beats_validation(self):
        from fib_tf_tpu.engine.restitution import dynamic_restitution_scan

        cfg = SimConfig(width=8, height=8, dt=0.1, duration=10)
        with pytest.raises(ValueError, match="n_beats"):
            dynamic_restitution_scan(Fenton4v(cfg), np.array([300.0]),
                                     n_beats=1)


class TestCVRestitutionScan:
    """CV restitution (engine/restitution.cv_restitution_scan): the S2
    wave's conduction velocity vs the diastolic interval it propagates
    into, on genuine conducting strips (left-edge column stimuli), one
    coupling per member.

    Measured BR (dt=0.1, diff=0.809, cheby+skip, 8x128 strip, BCL 500):
    S1 CV 1.535 cells/ms; the classic collapse toward the refractory
    edge — CV 1.306 at DI 34.8, 1.426 at 48.7, 1.499 at 67.1, plateau
    1.542; conduction block at CI 210."""

    @pytest.fixture(scope="class")
    def br(self):
        from fib_tf_tpu.engine.restitution import cv_restitution_scan
        from fib_tf_tpu.models import BeelerReuter

        cfg = SimConfig(width=128, height=8, dt=0.1, duration=10,
                        diff=0.809, cheby=True, skip=True)
        return cv_restitution_scan(
            BeelerReuter(cfg), np.array([210.0, 230.0, 250.0, 270.0,
                                         400.0]),
            bcl_ms=500.0, n_s1=1, tail_ms=250.0)

    def test_block_at_refractory_coupling(self, br):
        assert not br.captured[0]
        assert np.isnan(br.cv[0])

    def test_cv_collapses_toward_block(self, br):
        assert br.captured[1:].all()
        cv = br.cv[1:]
        assert (np.diff(cv) > 0).all()       # monotone recovery with DI
        assert cv[0] == pytest.approx(1.306, abs=0.06)
        # >= 10% depression at DI ~35 vs the plateau
        assert cv[0] < 0.90 * cv[-1]

    def test_plateau_matches_s1_cv(self, br):
        assert br.cv_s1 == pytest.approx(1.535, abs=0.05)
        assert br.cv[-1] == pytest.approx(br.cv_s1, rel=0.02)

    def test_di_monotone_in_coupling(self, br):
        di = br.di_ms[1:]
        assert np.isfinite(di).all()
        assert (np.diff(di) > 0).all()

    def test_traces_shape(self, br):
        assert br.traces.ndim == 3 and br.traces.shape[2] == 2

    def test_sites_validation(self):
        from fib_tf_tpu.engine.restitution import cv_restitution_scan

        cfg = SimConfig(width=64, height=8, dt=0.1, duration=10)
        with pytest.raises(ValueError, match="sites"):
            cv_restitution_scan(Fenton4v(cfg), np.array([300.0]),
                                sites=(60, 40))

    def test_fenton_strip(self):
        """Fenton: block at CI 150, capture from 225, plateau CV equals
        the S1 wave's 3.32 cells/ms at diff=1.5 (this parameter set
        shows a mildly SUPERNORMAL short-DI limb — the premature front
        propagates into incompletely repolarized, still-excitable
        tissue — so only the plateau and the block edge are pinned)."""
        from fib_tf_tpu.engine.restitution import cv_restitution_scan

        cfg = SimConfig(width=128, height=8, dt=0.1, duration=10,
                        diff=1.5)
        r = cv_restitution_scan(
            Fenton4v(cfg), np.array([150.0, 225.0, 400.0]),
            bcl_ms=400.0, n_s1=1, tail_ms=250.0)
        assert not r.captured[0]
        assert r.captured[1:].all()
        assert r.cv_s1 == pytest.approx(3.32, abs=0.10)
        assert r.cv[2] == pytest.approx(r.cv_s1, rel=0.02)
        assert r.di_ms[1] == pytest.approx(23.1, abs=5.0)
