"""Phase-singularity (spiral-tip) detection and tracking.

The reference's central experiments are spiral-wave runs (fenton.py
S1-S2 spiral, court_ultra fibrillation), and its docs discuss tip
meander — but it shipped no tip-finding tooling; outcomes were judged by
eye from Screen frames.  This module post-processes saved voltage movies
(`cube.npy`, [T, H, W] — the playcube format) into tip trajectories:

1. `phase_movie`: time-delay-embedding phase
   theta(t) = atan2(V(t+tau) - V*, V(t) - V*) — the standard
   two-variable state-space angle (Gray, Pertsov & Jalife, Nature 1998;
   no derivative needed, robust at cube frame rates).
2. `phase_singularities`: +-1 winding of theta around each 2x2
   plaquette (Iyer & Gray's topological-charge method) — a spiral tip is
   a phase singularity, where all phases meet.
3. `track_tips`: greedy nearest-neighbor linking of per-frame
   singularities into trajectories (the meander path).

All host-side numpy on saved movies — analysis is offline, like the
reference's playcube replay, so the hot loop stays untouched.
`fibrillation_density` (engine/observers.py) counts activity; this
counts ROTORS — the number of phase singularities is the standard
fibrillation-complexity metric.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import List, Optional, Tuple

import numpy as np

_TWO_PI = 2.0 * np.pi


def _wrap(x: np.ndarray) -> np.ndarray:
    """Wrap phase differences to (-pi, pi]."""
    return x - _TWO_PI * np.round(x / _TWO_PI)


def phase_movie(
    cube: np.ndarray, tau: int = 2, v_star: Optional[float] = None
) -> np.ndarray:
    """[T, H, W] potential movie -> [T - tau, H, W] phase in (-pi, pi].

    `v_star` is the embedding origin (default: cube midrange); `tau` the
    embedding delay in frames — 1-4 frames at the reference's 1 ms
    dt_per_plot spans a cardiac upstroke well.
    """
    cube = np.asarray(cube, np.float32)
    if cube.ndim != 3:
        raise ValueError(f"expected [T, H, W] movie, got {cube.shape}")
    if not 0 < tau < cube.shape[0]:
        raise ValueError(f"tau={tau} out of range for T={cube.shape[0]}")
    if v_star is None:
        v_star = 0.5 * (float(cube.min()) + float(cube.max()))
    return np.arctan2(cube[tau:] - v_star, cube[:-tau] - v_star)


def phase_singularities(
    theta: np.ndarray, phase_field: Optional[np.ndarray] = None
) -> np.ndarray:
    """Phase singularities of one [H, W] phase frame.

    Returns [n, 3] float array of (y, x, charge) with y/x at the
    plaquette center (i+0.5, j+0.5) and charge +-1 (winding of theta
    around the 2x2 plaquette / 2pi).  `phase_field` (the tissue mask,
    ops/stencil.add_hole_to_phase_field convention) suppresses spurious
    singularities pinned inside obstacles/boundary: plaquettes touching
    phi < 0.5 are dropped.
    """
    t00 = theta[:-1, :-1]
    t01 = theta[:-1, 1:]
    t11 = theta[1:, 1:]
    t10 = theta[1:, :-1]
    circ = (
        _wrap(t01 - t00) + _wrap(t11 - t01)
        + _wrap(t10 - t11) + _wrap(t00 - t10)
    )
    charge = np.round(circ / _TWO_PI).astype(np.int32)
    if phase_field is not None:
        ph = np.asarray(phase_field)
        tissue = (
            (ph[:-1, :-1] >= 0.5) & (ph[:-1, 1:] >= 0.5)
            & (ph[1:, 1:] >= 0.5) & (ph[1:, :-1] >= 0.5)
        )
        charge = np.where(tissue, charge, 0)
    ys, xs = np.nonzero(charge)
    return np.stack(
        [ys + 0.5, xs + 0.5, charge[ys, xs]], axis=-1
    ).astype(np.float32) if len(ys) else np.zeros((0, 3), np.float32)


def cancel_pairs(tips: np.ndarray, min_sep: float) -> np.ndarray:
    """Drop mutually-annihilating opposite-charge pairs closer than
    `min_sep` cells (closest pair first).

    A +1/-1 pair tighter than one rotor core diameter cannot be two
    sustained rotors — it is phase-embedding noise at a wavetail or a
    sub-frame wavebreak flicker.  Genuine counter-rotating (figure-of-
    eight) pairs sit at least a core apart and survive.  `min_sep=0`
    disables."""
    if min_sep <= 0 or len(tips) < 2:
        return tips
    keep = np.ones(len(tips), bool)
    while True:
        best, best_d = None, min_sep
        for i in range(len(tips)):
            if not keep[i]:
                continue
            for j in range(i + 1, len(tips)):
                if not keep[j] or tips[i, 2] * tips[j, 2] >= 0:
                    continue
                d = float(np.hypot(tips[i, 0] - tips[j, 0],
                                   tips[i, 1] - tips[j, 1]))
                if d <= best_d:
                    best, best_d = (i, j), d
        if best is None:
            return tips[keep]
        keep[best[0]] = keep[best[1]] = False


@dataclass
class TipTrack:
    """One tip trajectory: frame indices and (y, x) positions.

    Frames need not be consecutive — the linker tolerates detection
    gaps (see `track_tips(max_gap=...)`)."""

    charge: int
    frames: List[int] = field(default_factory=list)
    ys: List[float] = field(default_factory=list)
    xs: List[float] = field(default_factory=list)

    def __len__(self) -> int:
        return len(self.frames)

    def path(self) -> np.ndarray:
        """[n, 2] (y, x) positions."""
        return np.stack([self.ys, self.xs], axis=-1)

    def meander_extent(self) -> Tuple[float, float]:
        """(y, x) bounding-box size of the tip path — the meander core."""
        return (
            float(max(self.ys) - min(self.ys)),
            float(max(self.xs) - min(self.xs)),
        )


def track_tips(
    cube: np.ndarray,
    tau: int = 2,
    v_star: Optional[float] = None,
    phase_field: Optional[np.ndarray] = None,
    max_jump: float = 75.0,
    max_gap: int = 3,
    min_length: int = 5,
    pair_min_sep: float = 12.0,
) -> List[TipTrack]:
    """Track spiral tips through a [T, H, W] movie.

    Per-frame singularities (after `cancel_pairs(pair_min_sep)` noise
    rejection) are linked to same-charge tracks by global greedy
    matching (closest per-frame speed first).  A track may continue
    from a tip seen up to `max_gap` frames ago — the topological-charge
    detector misses ~10-15% of frames at coarse cube frame rates — with
    the distance budget scaling as `max_jump * gap`.  Unmatched tips
    start new tracks; tracks shorter than `min_length` detections are
    dropped (birth/death flickers at wavebreak).  Returns tracks sorted
    by length, longest first.

    `max_jump` is the per-FRAME tip displacement budget in cells.  At
    the canonical 10 ms cube cadence (fenton_spiral's
    record_frames_every_ms=10) the detected singularity of a meandering
    512^2 Fenton spiral jumps up to ~70 cells between frames — tip
    motion plus detection jitter along the wavefront — so the default
    75 links that movie into one track (measured).  Scale it with your
    frame interval, and tighten for crowded fibrillation movies where a
    large budget could bridge distinct rotors.
    """
    theta = phase_movie(cube, tau=tau, v_star=v_star)
    live: List[TipTrack] = []
    done: List[TipTrack] = []
    for t in range(theta.shape[0]):
        tips = cancel_pairs(
            phase_singularities(theta[t], phase_field=phase_field),
            pair_min_sep,
        )
        # global greedy: all admissible (track, tip) pairs; fresher
        # tracks claim first (a coasting track must not outbid a track
        # matched last frame), ties by distance
        pairs = []
        for i, tr in enumerate(live):
            gap = t - tr.frames[-1]
            for j, (y, x, q) in enumerate(tips):
                if int(q) != tr.charge:
                    continue
                d = float(np.hypot(y - tr.ys[-1], x - tr.xs[-1]))
                if d <= max_jump * gap:
                    pairs.append((gap, d, i, j))
        pairs.sort()
        used_tr = np.zeros(len(live), bool)
        used_tip = np.zeros(len(tips), bool)
        for _, _, i, j in pairs:
            if used_tr[i] or used_tip[j]:
                continue
            used_tr[i] = used_tip[j] = True
            y, x, _ = tips[j]
            live[i].frames.append(t)
            live[i].ys.append(float(y))
            live[i].xs.append(float(x))
        # retire tracks that exhausted their gap budget (max_gap =
        # missed frames tolerated between detections)
        nxt = []
        for tr in live:
            (nxt if t - tr.frames[-1] <= max_gap else done).append(tr)
        live = nxt
        # unmatched tips found a new track
        for j, (y, x, q) in enumerate(tips):
            if not used_tip[j]:
                live.append(TipTrack(
                    charge=int(q), frames=[t], ys=[float(y)], xs=[float(x)]
                ))
    done.extend(live)
    done = [tr for tr in done if len(tr) >= min_length]
    done.sort(key=len, reverse=True)
    return done


def plot_tracks(path: str, cube: np.ndarray, tracks: List[TipTrack]):
    """Final voltage frame with each tip path overlaid; start marked with
    a circle, end with a square (direction without color-only coding)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(5.4, 5.0), constrained_layout=True)
    ax.imshow(cube[-1], cmap="Greys_r", interpolation="nearest")
    colors = ["#3d6fd6", "#d65f3d", "#3da95c", "#9a5fd6", "#d6a23d"]
    for i, tr in enumerate(tracks[:5]):
        c = colors[i % len(colors)]
        ax.plot(tr.xs, tr.ys, color=c, lw=1.3,
                label=f"tip {i} ({tr.charge:+d}, {len(tr)} fr)")
        ax.plot(tr.xs[0], tr.ys[0], "o", color=c, ms=5)
        ax.plot(tr.xs[-1], tr.ys[-1], "s", color=c, ms=5)
    if tracks:
        ax.legend(loc="upper right", fontsize=7, framealpha=0.85)
    ax.set_title("spiral-tip trajectories (phase singularities)",
                 fontsize=10)
    ax.set_xticks([]), ax.set_yticks([])
    fig.savefig(path, dpi=150)
    plt.close(fig)


def singularity_count(
    cube: np.ndarray,
    tau: int = 2,
    v_star: Optional[float] = None,
    phase_field: Optional[np.ndarray] = None,
    pair_min_sep: float = 12.0,
) -> np.ndarray:
    """[T - tau] number of phase singularities per frame — the rotor
    count, the standard fibrillation-complexity series (compare
    engine/observers.fibrillation_density, which measures active AREA).
    Noise pairs are cancelled as in `track_tips`; pass
    `pair_min_sep=0` for the raw topological count."""
    theta = phase_movie(cube, tau=tau, v_star=v_star)
    return np.array([
        len(cancel_pairs(
            phase_singularities(f, phase_field=phase_field), pair_min_sep
        )) for f in theta
    ])
