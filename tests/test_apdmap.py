"""Per-pixel APD / alternans maps (utils/apd.py, CLI `apdmap`).

The spatial alternans quantification — cross-validated against the 0D
dynamic-restitution protocol (same beats, same threshold convention)
and demonstrated producing the textbook phenomenon: spatially
DISCORDANT alternans with nodal lines on a fast-paced BR strip.
"""

import json

import numpy as np
import pytest

from fib_tf_tpu.config import SimConfig
from fib_tf_tpu.utils.apd import apd_map


# long tail: excluded from the smoke tier (pytest -m 'not slow')
pytestmark = pytest.mark.slow


def _square_movie():
    """Two bands alternating out of phase: A fires 40 then 20 frames,
    B fires 20 then 40."""
    mv = np.full((200, 4, 6), -85.0, np.float32)
    mv[20:60, :2] = 20.0
    mv[100:120, :2] = 20.0
    mv[20:40, 2:] = 20.0
    mv[100:140, 2:] = 20.0
    return mv


class TestSynthetic:
    def test_square_pulses(self):
        r = apd_map(_square_movie(), frame_ms=1.0)
        assert r.valid.all()
        assert r.apd_prev[0, 0] == pytest.approx(40.8, abs=1.0)
        assert r.apd_last[0, 0] == pytest.approx(20.8, abs=1.0)
        assert r.alternans[0, 0] == pytest.approx(20.0, abs=0.5)
        assert (r.n_beats == 2).all()

    def test_discordance_half_and_half(self):
        r = apd_map(_square_movie(), frame_ms=1.0)
        # the two bands (2 of 4 rows each) alternate in opposite phase
        assert r.discordance == pytest.approx(0.5, abs=0.01)

    def test_single_beat_invalid(self):
        mv = np.zeros((100, 2, 2), np.float32)
        mv[10:40] = 1.0
        r = apd_map(mv, 1.0)
        assert not r.valid.any()
        # the one complete beat is still reported as apd_last
        assert np.isfinite(r.apd_last).all()
        assert np.isnan(r.apd_prev).all()

    def test_flat_pixels_invalid(self):
        mv = np.zeros((100, 2, 2), np.float32)
        mv[10:30, 0, 0] = 1.0
        mv[50:70, 0, 0] = 1.0
        r = apd_map(mv, 1.0)
        assert r.valid[0, 0]
        assert not r.valid[1, 1]          # never fired
        assert r.discordance is None      # nothing alternates > 1 ms

    def test_unfinished_last_beat_truncated(self):
        """A beat still above threshold at the movie's end means this
        pixel would read a phase-flipped EARLIER beat pair — it must be
        flagged `truncated` and excluded from `valid` (the r4-discovered
        failure mode; the earlier pair is still reported for
        inspection), and crossing the 2% budget raises the warning."""
        mv = np.full((200, 1, 1), -85.0, np.float32)
        mv[10:40] = 20.0
        mv[80:110] = 20.0
        mv[150:] = 20.0     # never repolarizes in frame
        with pytest.warns(UserWarning, match="cut off"):
            r = apd_map(mv, 1.0)
        assert r.truncated[0, 0]
        assert r.truncated_fraction == 1.0
        assert not r.valid[0, 0]
        # the earlier complete pair is still visible to a caller who
        # understands the flag
        assert r.apd_last[0, 0] == pytest.approx(30.8, abs=1.0)
        assert r.apd_prev[0, 0] == pytest.approx(30.8, abs=1.0)

    def test_truncated_partial_grid(self):
        """Only the cut-off pixels lose validity; fully-recorded ones
        keep theirs, and a <=2% fraction stays silent."""
        mv = np.tile(np.full((200, 1, 1), -85.0, np.float32), (1, 10, 10))
        mv[10:40] = 20.0
        mv[80:110] = 20.0
        mv[150:180] = 20.0
        mv[190:, 0, 0] = 20.0   # 1 of 100 pixels: new beat cut off
        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("error")   # 1% < 2%: no warning
            r = apd_map(mv, 1.0)
        assert r.truncated[0, 0] and not r.valid[0, 0]
        assert r.truncated.sum() == 1
        assert r.truncated_fraction == pytest.approx(0.01)
        assert r.valid[5, 5]
        assert r.apd_last[5, 5] == pytest.approx(30.8, abs=1.0)

    def test_shape_validation(self):
        with pytest.raises(ValueError, match="T, H, W"):
            apd_map(np.zeros((10, 4)), 1.0)
        with pytest.raises(ValueError, match="too short"):
            apd_map(np.zeros((2, 4, 4)), 1.0)


class TestAgainstDynamicProtocol:
    def test_tp06_uniform_sheet_matches_0d(self):
        """Uniform-field tp06 at BCL 320 (the alternans pin of
        tests/test_tp06.py::TestAlternans): the map must reproduce the
        0D protocol's APDs at every pixel — measured apd_prev 253.2 /
        apd_last 206.7, alternans 46.5 ms."""
        from fib_tf_tpu.engine.ensemble import (
            EnsembleEvent, run_ensemble, stack_states,
        )
        from fib_tf_tpu.models import TenTusscher06

        m = TenTusscher06(SimConfig(width=4, height=4, dt=0.02,
                                    duration=10))
        dt_ms = 0.2
        bcl = int(round(320 / dt_ms))
        beats = [50 + k * bcl for k in range(6)]
        n_outer = beats[-1] + int(round(450 / dt_ms))
        mask = np.zeros((4, 4), np.float32)
        ev = [EnsembleEvent(step=int(s), mask=mask) for s in beats]
        st = stack_states([m.initial_state(s1=False)])
        _, tr = run_ensemble(m, st, n_outer, events=ev,
                             probe=lambda s: s["V"])
        r = apd_map(np.asarray(tr)[0], frame_ms=dt_ms)
        assert r.valid.all()
        assert float(np.nanmax(r.alternans) - np.nanmin(r.alternans)) \
            < 0.5  # uniform field: spatially flat
        assert r.alternans[2, 2] == pytest.approx(46.5, abs=2.0)
        assert r.apd_prev[2, 2] == pytest.approx(253.2, abs=2.0)
        assert r.apd_last[2, 2] == pytest.approx(206.7, abs=2.0)
        assert (r.n_beats == 6).all()


class TestDiscordantAlternans:
    @pytest.fixture(scope="class")
    def strip(self):
        """tp06 strip (4x256, diff=0.809) edge-paced at BCL 330 ms for
        6 beats — just above the 0D alternans rate (TestAlternans: 46 ms
        at 320), with CV restitution converting the temporal alternans
        into SPATIAL discordance down the strip.  Measured: alternans
        0.08 -> 26.1 ms, signed ΔAPD running -25.7 (x=10) through ONE
        nodal line at x~112 to +12.2 at the far end, 44.9% of tissue
        out of phase — textbook discordant alternans.  The tail (400
        ms) must let the final beat repolarize everywhere or far
        pixels silently read the previous (phase-flipped) beat pair —
        the apd_map docstring caveat, discovered here.

        (BR cannot run this experiment: its restitution slope is 0.43
        at these rates — 0D dynamic alternans is exactly 0, measured —
        which is why the steep tp06 is the demo model.)"""
        from fib_tf_tpu.engine.ensemble import (
            EnsembleEvent, run_ensemble, stack_states,
        )
        from fib_tf_tpu.models import TenTusscher06

        cfg = SimConfig(width=256, height=4, dt=0.02, duration=10,
                        diff=0.809)
        m = TenTusscher06(cfg)
        dt_ms = m.dt_per_step * cfg.dt
        mask = np.full((4, 256), m.min_v, np.float32)
        mask[:, :4] = 0.0
        beats = [int(round(10 / dt_ms)) + k * int(round(330 / dt_ms))
                 for k in range(6)]
        ev = [EnsembleEvent(step=int(s), mask=mask) for s in beats]
        st = stack_states([m.initial_state(s1=False)])
        _, tr = run_ensemble(m, st,
                             beats[-1] + int(round(400 / dt_ms)),
                             events=ev, probe=lambda s: s["V"])
        return apd_map(np.asarray(tr)[0], frame_ms=dt_ms)

    def test_all_tissue_captures(self, strip):
        assert strip.valid.all()

    def test_alternans_gradient(self, strip):
        assert float(np.nanmax(strip.alternans)) == pytest.approx(
            26.0, abs=8.0)
        assert float(np.nanmin(strip.alternans)) < 2.0

    def test_discordant_with_node(self, strip):
        signed = strip.apd_last - strip.apd_prev
        row = signed[2]
        # opposite-phase regions across ONE nodal line (~x 112):
        # -25.7 near the pacing site, +12.2 at the far end
        assert float(np.nanmin(row)) < -15.0
        assert float(np.nanmax(row)) > 6.0
        changes = int((np.diff(np.sign(row[np.isfinite(row)])) != 0)
                      .sum())
        assert changes == 1
        d = strip.discordance
        assert d == pytest.approx(0.449, abs=0.1)


class TestCli:
    def test_apdmap_json(self, tmp_path, capsys):
        from fib_tf_tpu import cli

        p = tmp_path / "cube.npy"
        np.save(p, _square_movie())
        rc = cli.main(["apdmap", str(p), "--frame-ms", "1",
                       "--json"])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["valid_fraction"] == 1.0
        assert rec["max_alternans_ms"] == pytest.approx(20.0, abs=0.5)
        assert rec["discordance"] == pytest.approx(0.5, abs=0.01)

    def test_apdmap_volume_movie(self, tmp_path, capsys):
        """[T, D, H, W] volume movies stack z-slices for the maps."""
        from fib_tf_tpu import cli

        mv = _square_movie()
        vol = np.stack([mv, mv], axis=1)   # [T, 2, 4, 6]
        p = tmp_path / "vol.npy"
        np.save(p, vol)
        rc = cli.main(["apdmap", str(p), "--frame-ms", "1", "--json"])
        assert rc == 0
        rec = json.loads(capsys.readouterr().out.strip())
        assert rec["valid_fraction"] == 1.0
        assert rec["max_alternans_ms"] == pytest.approx(20.0, abs=0.5)

    def test_apdmap_plot(self, tmp_path, capsys):
        from fib_tf_tpu import cli

        p = tmp_path / "cube.npy"
        np.save(p, _square_movie())
        out = tmp_path / "apd.png"
        rc = cli.main(["apdmap", str(p), "--frame-ms", "1",
                       "--save-plot", str(out)])
        assert rc == 0
        assert out.exists()
