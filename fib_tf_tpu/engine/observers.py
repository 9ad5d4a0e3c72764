"""Observers: host-side consumers of on-device probe streams.

The reference computed all observations on the host from full-frame
device->host copies every plot interval (ionic.py:206-224, egm.py:41-47).
Here the per-step scalars (wavefront probe, trend pixel, electrode means)
are emitted *from inside* the compiled scan, so a chunk of N steps costs a
single small transfer; only rendering still pulls full frames.
"""

from __future__ import annotations

from typing import Callable, List, Optional

import numpy as np


class CycleLengthDetector:
    """Wavefront-passage detector replicating reference ionic.py:216-224.

    Watches the normalized potential at the observer pixel at plot-interval
    sampling; on an upward crossing of 0.5 reports the cycle length in ms
    via `observer(step, cl)` (or print, like the reference default).
    """

    def __init__(
        self,
        dt: float,
        dt_per_step: int,
        plot_interval: int,
        observer: Optional[Callable[[int, float], None]] = None,
    ):
        self.dt = dt
        self.dt_per_step = dt_per_step
        self.plot_interval = plot_interval
        self.observer = observer
        self.last_spike = 0
        self.v_prev = -np.inf  # reference seeds with raw min_v, always < 0.5
        self.cycle_lengths: List[tuple] = []

    def feed(self, start_step: int, probe_series: np.ndarray):
        """Consume per-outer-step probe values for steps
        [start_step, start_step + len(probe_series))."""
        for k, v1 in enumerate(probe_series):
            i = start_step + k
            if i % self.plot_interval != 0:
                continue
            if v1 >= 0.5 and self.v_prev < 0.5:
                cl = (i - self.last_spike) * self.dt_per_step * self.dt
                self.cycle_lengths.append((i, cl))
                if self.observer is None:
                    print(
                        "wavefront reaches the middle top point at %d, "
                        "cycle length is %d" % (i, cl)
                    )
                else:
                    self.observer(i, cl)
                self.last_spike = i
            self.v_prev = v1


class ElectrogramRecorder:
    """Bipolar pseudo-electrogram from two virtual electrodes
    (reference egm.py:5-12, 37-50), sampled every `every_ms`.

    The per-electrode means ride the probe stream (computed on-device);
    this class just subsamples and stores them.
    """

    def __init__(self, every_ms: float, dt: float, dt_per_step: int):
        self.sample_interval = max(1, int(every_ms / (dt_per_step * dt)))
        self.samples: List[np.ndarray] = []

    def feed(self, start_step: int, egm_series: np.ndarray):
        """`egm_series` is [n_steps, n_electrodes]."""
        for k in range(egm_series.shape[0]):
            if (start_step + k) % self.sample_interval == 0:
                self.samples.append(np.asarray(egm_series[k]))

    def as_array(self) -> np.ndarray:
        return np.asarray(self.samples)

    def save(self, path: str):
        np.savetxt(path, self.as_array())


def fibrillation_density(
    image: np.ndarray, phase: Optional[np.ndarray], threshold: float = 0.2
) -> float:
    """Fraction of (in-tissue) cells below the depolarization cutoff — the
    fibrillation density rho of court_ultra.py:504-509."""
    if phase is None:
        phase = np.ones_like(image)
    in_tissue = phase > 1e-3
    return float(np.sum(image[in_tissue] < threshold) / np.sum(in_tissue))


def phase_weighted_mean(field: np.ndarray, phase: Optional[np.ndarray]) -> float:
    """Phase-field-weighted spatial mean, as used by court_ultra's
    cl_observer logging (court_ultra.py:465-486)."""
    if phase is None:
        return float(np.mean(field))
    return float(np.average(field, weights=phase))
