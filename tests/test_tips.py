"""Phase-singularity detection / spiral-tip tracking (utils/tips.py).

Synthetic fields with KNOWN topological charge are the ground truth: a
rotating spiral cos(theta0 - omega*t) has exactly one phase singularity
at its core; a plane wave has none.
"""

import numpy as np
import pytest

from fib_tf_tpu.utils.tips import (
    cancel_pairs,
    phase_movie,
    phase_singularities,
    singularity_count,
    track_tips,
)

H = W = 32
CY = CX = 15.5  # core between pixels


def spiral_cube(n_frames=40, omega=np.pi / 4, cy=CY, cx=CX):
    """cos(theta0 - omega t): one rotor at (cy, cx).  With tau=2 the
    embedding lag is omega*tau = pi/2, the ideal quadrature."""
    y, x = np.mgrid[0:H, 0:W]
    theta0 = np.arctan2(y - cy, x - cx)
    t = np.arange(n_frames)[:, None, None]
    return np.cos(theta0[None] - omega * t).astype(np.float32)


def plane_cube(n_frames=40, omega=np.pi / 4):
    y = np.mgrid[0:H, 0:W][0]
    t = np.arange(n_frames)[:, None, None]
    return np.cos(0.3 * y[None] - omega * t).astype(np.float32)


class TestPhaseSingularities:
    def test_pure_phase_field_charge_plus_one(self):
        y, x = np.mgrid[0:H, 0:W]
        theta = np.arctan2(y - CY, x - CX).astype(np.float32)
        tips = phase_singularities(theta)
        assert tips.shape == (1, 3)
        yy, xx, q = tips[0]
        assert q == 1.0
        assert abs(yy - CY) < 1.0 and abs(xx - CX) < 1.0

    def test_mirrored_field_charge_minus_one(self):
        y, x = np.mgrid[0:H, 0:W]
        theta = np.arctan2(y - CY, x - CX).astype(np.float32)
        tips = phase_singularities(-theta)
        assert tips.shape == (1, 3)
        assert tips[0, 2] == -1.0

    def test_opposite_pair(self):
        y, x = np.mgrid[0:H, 0:W]
        theta = (
            np.arctan2(y - CY, x - 7.5) - np.arctan2(y - CY, x - 23.5)
        ).astype(np.float32)
        tips = phase_singularities(theta)
        assert len(tips) == 2
        assert sorted(tips[:, 2]) == [-1.0, 1.0]

    def test_uniform_field_empty(self):
        tips = phase_singularities(np.zeros((H, W), np.float32))
        assert tips.shape == (0, 3)

    def test_phase_field_mask_suppresses(self):
        y, x = np.mgrid[0:H, 0:W]
        theta = np.arctan2(y - CY, x - CX).astype(np.float32)
        hole = np.ones((H, W), np.float32)
        hole[12:20, 12:20] = 0.0  # obstacle covering the core
        assert len(phase_singularities(theta, phase_field=hole)) == 0
        # mask away from the core changes nothing
        edge = np.ones((H, W), np.float32)
        edge[:2] = 0.0
        assert len(phase_singularities(theta, phase_field=edge)) == 1


class TestCancelPairs:
    def test_tight_opposite_pair_cancels(self):
        tips = np.array([[10, 10, 1], [14, 13, -1]], np.float32)
        assert len(cancel_pairs(tips, min_sep=12.0)) == 0

    def test_far_pair_survives(self):
        tips = np.array([[10, 10, 1], [10, 40, -1]], np.float32)
        assert len(cancel_pairs(tips, min_sep=12.0)) == 2

    def test_same_charge_never_cancels(self):
        tips = np.array([[10, 10, -1], [12, 11, -1]], np.float32)
        assert len(cancel_pairs(tips, min_sep=12.0)) == 2

    def test_closest_pair_first(self):
        # -1 between two +1s: cancels with the NEAR one, far +1 stays
        tips = np.array(
            [[10, 10, 1], [10, 14, -1], [10, 21, 1]], np.float32
        )
        out = cancel_pairs(tips, min_sep=12.0)
        assert len(out) == 1 and out[0, 1] == 21.0

    def test_disabled(self):
        tips = np.array([[10, 10, 1], [11, 11, -1]], np.float32)
        assert len(cancel_pairs(tips, min_sep=0.0)) == 2


class TestPhaseMovie:
    def test_shape_and_range(self):
        th = phase_movie(spiral_cube(), tau=2)
        assert th.shape == (38, H, W)
        assert (th > -np.pi - 1e-6).all() and (th <= np.pi + 1e-6).all()

    def test_bad_tau_raises(self):
        with pytest.raises(ValueError, match="tau"):
            phase_movie(spiral_cube(n_frames=5), tau=5)

    def test_non_movie_raises(self):
        with pytest.raises(ValueError, match="movie"):
            phase_movie(np.zeros((4, 4), np.float32))


class TestTracking:
    def test_rotor_one_stationary_track(self):
        tracks = track_tips(spiral_cube(), tau=2)
        assert len(tracks) == 1
        tr = tracks[0]
        assert tr.charge == 1
        assert len(tr) == 38  # present in every embedded frame
        path = tr.path()
        assert np.allclose(path[:, 0], CY, atol=1.5)
        assert np.allclose(path[:, 1], CX, atol=1.5)
        ey, ex = tr.meander_extent()
        assert ey <= 2.0 and ex <= 2.0

    def test_plane_wave_no_tracks(self):
        assert track_tips(plane_cube(), tau=2) == []

    def test_singularity_count_series(self):
        counts = singularity_count(spiral_cube(), tau=2)
        assert counts.shape == (38,)
        assert (counts == 1).all()
        assert (singularity_count(plane_cube(), tau=2) == 0).all()

    def test_min_length_filters_flicker(self):
        cube = plane_cube(n_frames=30)
        # inject a 3-frame spiral burst: shorter than min_length=5
        cube[10:13] = spiral_cube(n_frames=3)
        tracks = track_tips(cube, tau=2, min_length=5)
        assert tracks == []

    def test_gap_coasting_bridges_missed_frames(self):
        # blank one cube frame mid-movie: with tau=2 that wipes the
        # detection in embedded frames 18 and 20.  Gap coasting bridges
        # both holes into one track; max_gap=0 splits around them (the
        # lone frame-19 detection is dropped by min_length)
        cube = spiral_cube(n_frames=40)
        cube[20] = 0.0
        bridged = track_tips(cube, tau=2, max_gap=3)
        assert len(bridged) == 1 and len(bridged[0]) >= 34
        split = track_tips(cube, tau=2, max_gap=0)
        assert len(split) == 2

    def test_meandering_core_single_track(self):
        # core drifts 0.8 cells/frame: one continuous track whose
        # meander extent matches the drift
        frames = []
        for t in range(40):
            y, x = np.mgrid[0:H, 0:W]
            th0 = np.arctan2(y - (8.5 + 0.4 * t), x - CX)
            frames.append(np.cos(th0 - (np.pi / 4) * t))
        cube = np.stack(frames).astype(np.float32)
        tracks = track_tips(cube, tau=2, max_jump=5.0)
        assert len(tracks) == 1
        ey, ex = tracks[0].meander_extent()
        assert 12.0 <= ey <= 18.0 and ex <= 3.0
