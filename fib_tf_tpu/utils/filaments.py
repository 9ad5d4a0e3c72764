"""Scroll-wave filament detection — the 3D rotor census.

2D reentry organizes around phase singularities (utils/tips.py); 3D
reentry organizes around FILAMENTS — curves of phase singularities
threading the volume, the organizing centers of scroll waves (Gray,
Pertsov & Jalife, Nature 1998).  Filament number and total length are
the standard 3D fibrillation-complexity metrics (a scroll breaking up
multiplies filaments; a stable scroll keeps one short one).

Construction: per z-slice time-delay-embedding phase + plaquette winding
(exactly utils/tips.phase_singularities, reused), then same-charge
singularities in ADJACENT slices are linked greedily by in-plane
distance into filament polylines.  A transmural scroll shows up as one
filament spanning all slices; a U-shaped filament (both ends on one
surface, the half-depth-S2 geometry of examples/scroll_wave.py) shows up
with both endpoints at low |z| span per branch.

Host-side numpy on snapshot pairs or saved [T, D, H, W] movies, like the
2D tip tracker — offline analysis, hot loop untouched.  No reference
equivalent (the reference is strictly 2D and judged rotors by eye).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

import numpy as np

from fib_tf_tpu.utils import tips as tips2d


@dataclass
class Filament:
    """One linked filament: `points` is [n, 3] float (z, y, x) with one
    singularity per spanned z-slice; `charge` the common winding sign."""

    points: np.ndarray
    charge: int

    @property
    def z_span(self) -> int:
        """Number of consecutive z-slices threaded."""
        return len(self.points)

    @property
    def arc_length(self) -> float:
        """Polyline length in cells (0 for a single-slice fragment)."""
        if len(self.points) < 2:
            return 0.0
        return float(
            np.sum(np.linalg.norm(np.diff(self.points, axis=0), axis=1))
        )


def slice_singularities(
    vol_now: np.ndarray,
    vol_old: np.ndarray,
    v_star: Optional[float] = None,
    phase_field: Optional[np.ndarray] = None,
    min_sep: float = 3.0,
) -> List[np.ndarray]:
    """Per-z-slice phase singularities of one `[D, H, W]` snapshot pair
    (now and `tau` ago).  Returns a list of [n, 3] (y, x, charge) arrays,
    one per slice — `tips2d.phase_singularities` + `cancel_pairs` applied
    slice-wise; `phase_field` is the extruded 2D tissue mask."""
    vol_now = np.asarray(vol_now, np.float32)
    vol_old = np.asarray(vol_old, np.float32)
    if vol_now.shape != vol_old.shape or vol_now.ndim != 3:
        raise ValueError(
            f"expected matching [D, H, W] volumes, got "
            f"{vol_now.shape} vs {vol_old.shape}"
        )
    if v_star is None:
        lo = min(float(vol_now.min()), float(vol_old.min()))
        hi = max(float(vol_now.max()), float(vol_old.max()))
        v_star = 0.5 * (lo + hi)
    theta = np.arctan2(vol_now - v_star, vol_old - v_star)
    return [
        tips2d.cancel_pairs(
            tips2d.phase_singularities(theta[z], phase_field), min_sep
        )
        for z in range(vol_now.shape[0])
    ]


def link_filaments(
    per_slice: List[np.ndarray], link_dist: float = 6.0
) -> List[Filament]:
    """Greedy nearest-neighbor linking of same-charge singularities in
    adjacent z-slices (the z-axis analog of tips2d.track_tips' frame
    linking).  A filament ends where no same-charge singularity sits
    within `link_dist` cells in the next slice; z-gaps break filaments
    (each fragment is reported)."""
    open_fils: List[List[np.ndarray]] = []   # list of [z, y, x, q] rows
    done: List[Filament] = []

    for z, sings in enumerate(per_slice):
        used = np.zeros(len(sings), bool)
        still_open: List[List[np.ndarray]] = []
        # match each open filament to its nearest unused singularity
        # (every open filament was extended at z-1: unmatched ones are
        # closed below, so there is no gap-coasting — a z-gap breaks
        # the filament)
        for fil in open_fils:
            last = fil[-1]
            best, best_d = None, link_dist
            for i, s in enumerate(sings):
                if used[i] or s[2] != last[3]:
                    continue
                d = float(np.hypot(s[0] - last[1], s[1] - last[2]))
                if d <= best_d:
                    best, best_d = i, d
            if best is None:
                done.append(_finish(fil))
            else:
                used[best] = True
                s = sings[best]
                fil.append(np.array([z, s[0], s[1], s[2]], np.float32))
                still_open.append(fil)
        # unmatched singularities open new filaments
        for i, s in enumerate(sings):
            if not used[i]:
                still_open.append(
                    [np.array([z, s[0], s[1], s[2]], np.float32)]
                )
        open_fils = still_open

    done.extend(_finish(f) for f in open_fils)
    return done


def _finish(rows: List[np.ndarray]) -> Filament:
    pts = np.stack(rows)
    return Filament(points=pts[:, :3], charge=int(pts[0, 3]))


def filament_census(
    vol_now: np.ndarray,
    vol_old: np.ndarray,
    v_star: Optional[float] = None,
    phase_field: Optional[np.ndarray] = None,
    link_dist: float = 6.0,
    min_sep: float = 3.0,
    min_span: int = 2,
) -> List[Filament]:
    """Filaments of one snapshot pair: slice singularities, linked, with
    single-slice fragments below `min_span` dropped (embedding flicker,
    the 3D analog of tips2d's min-length track filter)."""
    per_slice = slice_singularities(
        vol_now, vol_old, v_star=v_star, phase_field=phase_field,
        min_sep=min_sep,
    )
    fils = link_filaments(per_slice, link_dist=link_dist)
    return [f for f in fils if f.z_span >= min_span]


def plot_filaments(
    path: str,
    vol_now: np.ndarray,
    fils: List[Filament],
    mid_slice: Optional[int] = None,
) -> None:
    """Save a two-panel figure: the mid-depth potential slice with
    filament pierce points, and the filaments in (x, y) colored by z
    (the top-down filament projection)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    vol_now = np.asarray(vol_now)
    d = vol_now.shape[0]
    z_mid = d // 2 if mid_slice is None else mid_slice
    fig, (ax0, ax1) = plt.subplots(1, 2, figsize=(11, 5))
    ax0.imshow(vol_now[z_mid], cmap="magma", origin="lower")
    ax0.set_title(f"potential, z={z_mid}")
    for f in fils:
        on = f.points[np.abs(f.points[:, 0] - z_mid) < 1.0]
        if len(on):
            ax0.plot(on[:, 2], on[:, 1], "o", mfc="none",
                     mec="cyan" if f.charge > 0 else "lime", ms=12, mew=2)
    for f in fils:
        sc = ax1.scatter(f.points[:, 2], f.points[:, 1],
                         c=f.points[:, 0], cmap="viridis", vmin=0,
                         vmax=max(d - 1, 1), s=18,
                         marker="o" if f.charge > 0 else "s")
        ax1.plot(f.points[:, 2], f.points[:, 1], "-", lw=0.8, alpha=0.6,
                 color="gray")
    ax1.set_xlim(0, vol_now.shape[2])
    ax1.set_ylim(0, vol_now.shape[1])
    ax1.set_aspect("equal")
    ax1.set_title(f"{len(fils)} filament(s), top-down, colored by z")
    if fils:
        fig.colorbar(sc, ax=ax1, label="z slice")
    fig.tight_layout()
    fig.savefig(path, dpi=110)
    plt.close(fig)


def census_movie(
    movie: np.ndarray,
    tau: int = 2,
    v_star: Optional[float] = None,
    **kw,
) -> List[List[Filament]]:
    """Filament census over a saved `[T, D, H, W]` movie: one filament
    list per frame from `t` vs `t - tau` (delay embedding in frames,
    like tips2d.phase_movie)."""
    movie = np.asarray(movie, np.float32)
    if movie.ndim != 4:
        raise ValueError(f"expected [T, D, H, W] movie, got {movie.shape}")
    if v_star is None:
        v_star = 0.5 * (float(movie.min()) + float(movie.max()))
    return [
        filament_census(movie[t], movie[t - tau], v_star=v_star, **kw)
        for t in range(tau, movie.shape[0])
    ]
