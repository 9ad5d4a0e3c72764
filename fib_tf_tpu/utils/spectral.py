"""Spectral analysis of saved voltage movies: dominant-frequency maps.

The standard frequency-domain quantification of fibrillation (Berenfeld
& Jalife's DF mapping): per-pixel FFT of the voltage time series, peak
magnitude in a physiological band -> dominant frequency (DF) map, plus
the organization index (OI: fraction of spectral power concentrated
around the peak) — high OI = periodic rotor drive, low OI = disorganized
wavelets.  Complements utils/tips.py (spatial: where the rotors are)
with the temporal view (how fast each region is driven).

Host-side numpy on the playcube [T, H, W] movie format, like the
reference's offline playcube replay (the reference had no frequency
tooling at all; cycle length at ONE probe pixel, ionic.py:216-224, was
its only rate measurement).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class DFMap:
    """Result of `dominant_frequency_map`."""

    df_hz: np.ndarray        # [H, W] dominant frequency (Hz); 0 = quiescent
    oi: np.ndarray           # [H, W] organization index in [0, 1]
    freqs_hz: np.ndarray     # analysis band bin centers
    active: np.ndarray       # [H, W] bool: pixel had supra-threshold power

    def median_df(self) -> float:
        """Median DF over active pixels (the map's headline number)."""
        vals = self.df_hz[self.active]
        return float(np.median(vals)) if vals.size else 0.0

    def median_oi(self) -> float:
        vals = self.oi[self.active]
        return float(np.median(vals)) if vals.size else 0.0


def dominant_frequency_map(
    cube: np.ndarray,
    frame_ms: float,
    f_min_hz: float = 1.0,
    f_max_hz: Optional[float] = None,
    oi_band_hz: float = 0.75,
    phase_field: Optional[np.ndarray] = None,
    power_floor: float = 1e-3,
) -> DFMap:
    """Per-pixel dominant frequency of a [T, H, W] movie.

    `frame_ms` is the movie cadence (10 for the canonical cubes).  The
    mean is removed per pixel (DC is not a rhythm); the search band is
    [f_min_hz, f_max_hz or Nyquist].  OI = power within +-`oi_band_hz`
    of the peak / total band power.  Pixels whose band power is below
    `power_floor` x the grid's maximum (quiescent tissue, obstacle
    interiors) are marked inactive with df = oi = 0; `phase_field`
    < 0.5 forces inactive.
    """
    cube = np.asarray(cube, np.float32)
    if cube.ndim != 3:
        raise ValueError(f"expected [T, H, W] movie, got {cube.shape}")
    t = cube.shape[0]
    if t < 8:
        raise ValueError(f"movie too short for spectra (T={t})")
    fs = 1000.0 / frame_ms
    nyq = fs / 2.0
    f_max_hz = nyq if f_max_hz is None else min(f_max_hz, nyq)
    if not 0 <= f_min_hz < f_max_hz:
        raise ValueError(f"bad band [{f_min_hz}, {f_max_hz}] Hz at "
                         f"{fs:.1f} Hz sampling")

    x = cube - cube.mean(axis=0, keepdims=True)
    # Hann taper: the movies are short non-integer numbers of cycles and
    # leakage from the rectangle window can move the peak bin
    x *= np.hanning(t)[:, None, None].astype(np.float32)
    spec = np.abs(np.fft.rfft(x, axis=0)) ** 2
    freqs = np.fft.rfftfreq(t, d=1.0 / fs)
    band = (freqs >= f_min_hz) & (freqs <= f_max_hz)
    spec, freqs = spec[band], freqs[band]
    if len(freqs) < 2:
        raise ValueError("analysis band holds fewer than 2 FFT bins; "
                         "record a longer movie or widen the band")

    peak = np.argmax(spec, axis=0)
    df = freqs[peak]
    total = spec.sum(axis=0)
    in_band = (
        np.abs(freqs[:, None, None] - df[None]) <= oi_band_hz
    )
    oi = np.where(total > 0, (spec * in_band).sum(axis=0)
                  / np.maximum(total, 1e-30), 0.0)

    active = total > power_floor * float(total.max())
    if phase_field is not None:
        active &= np.asarray(phase_field) >= 0.5
    return DFMap(
        df_hz=np.where(active, df, 0.0).astype(np.float32),
        oi=np.where(active, oi, 0.0).astype(np.float32),
        freqs_hz=freqs.astype(np.float32),
        active=active,
    )


def plot_df_map(path: str, m: DFMap):
    """DF map + OI map side by side."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax1, ax2) = plt.subplots(
        1, 2, figsize=(9.6, 4.6), constrained_layout=True
    )
    im1 = ax1.imshow(np.where(m.active, m.df_hz, np.nan),
                     cmap="viridis", interpolation="nearest")
    fig.colorbar(im1, ax=ax1, shrink=0.8, label="Hz")
    ax1.set_title(f"dominant frequency (median {m.median_df():.1f} Hz)",
                  fontsize=10)
    im2 = ax2.imshow(np.where(m.active, m.oi, np.nan), vmin=0, vmax=1,
                     cmap="magma", interpolation="nearest")
    fig.colorbar(im2, ax=ax2, shrink=0.8, label="OI")
    ax2.set_title(f"organization index (median {m.median_oi():.2f})",
                  fontsize=10)
    for ax in (ax1, ax2):
        ax.set_xticks([]), ax.set_yticks([])
    fig.savefig(path, dpi=150)
    plt.close(fig)
