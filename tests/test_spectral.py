"""Dominant-frequency mapping (utils/spectral.py).

Ground truth: synthetic movies of pure known-frequency oscillations.
"""

import numpy as np
import pytest

from fib_tf_tpu.utils.spectral import DFMap, dominant_frequency_map


def two_region_cube(t_frames=200, frame_ms=10.0, f_left=5.0, f_right=10.0):
    """Left half oscillates at f_left Hz, right half at f_right Hz."""
    t = np.arange(t_frames) * frame_ms / 1000.0
    cube = np.zeros((t_frames, 16, 32), np.float32)
    cube[:, :, :16] = np.sin(2 * np.pi * f_left * t)[:, None, None]
    cube[:, :, 16:] = np.sin(2 * np.pi * f_right * t)[:, None, None]
    return cube


class TestDFMap:
    def test_two_region_frequencies(self):
        m = dominant_frequency_map(two_region_cube(), frame_ms=10.0)
        assert m.active.all()
        assert np.allclose(m.df_hz[:, :16], 5.0, atol=0.5)
        assert np.allclose(m.df_hz[:, 16:], 10.0, atol=0.5)
        assert m.median_oi() > 0.9  # pure tones are fully organized

    def test_quiescent_pixels_inactive(self):
        cube = two_region_cube()
        cube[:, :, 16:] = 0.25  # flat right half
        m = dominant_frequency_map(cube, frame_ms=10.0)
        assert m.active[:, :16].all()
        assert not m.active[:, 16:].any()
        assert (m.df_hz[:, 16:] == 0.0).all()
        assert m.median_df() == pytest.approx(5.0, abs=0.5)

    def test_phase_field_forces_inactive(self):
        ph = np.ones((16, 32), np.float32)
        ph[:, 16:] = 0.0
        m = dominant_frequency_map(two_region_cube(), frame_ms=10.0,
                                   phase_field=ph)
        assert not m.active[:, 16:].any()

    def test_disorganized_low_oi(self):
        rng = np.random.default_rng(0)
        cube = rng.standard_normal((400, 8, 8)).astype(np.float32)
        m = dominant_frequency_map(cube, frame_ms=10.0)
        assert m.median_oi() < 0.5  # broadband noise

    def test_band_respected(self):
        # 10 Hz tone searched only in [1, 7] Hz: peak must stay in band
        cube = two_region_cube(f_left=10.0, f_right=10.0)
        m = dominant_frequency_map(cube, frame_ms=10.0, f_max_hz=7.0)
        assert (m.df_hz[m.active] <= 7.0).all()

    def test_errors(self):
        with pytest.raises(ValueError, match="movie"):
            dominant_frequency_map(np.zeros((4, 4), np.float32), 10.0)
        with pytest.raises(ValueError, match="too short"):
            dominant_frequency_map(np.zeros((4, 4, 4), np.float32), 10.0)
        with pytest.raises(ValueError, match="band"):
            dominant_frequency_map(two_region_cube(), 10.0,
                                   f_min_hz=60.0)  # beyond Nyquist

    def test_plot(self, tmp_path):
        from fib_tf_tpu.utils.spectral import plot_df_map

        m = dominant_frequency_map(two_region_cube(), frame_ms=10.0)
        p = str(tmp_path / "df.png")
        plot_df_map(p, m)
        import os

        assert os.path.getsize(p) > 0
