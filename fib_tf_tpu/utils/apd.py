"""Per-pixel APD and alternans maps from saved voltage movies.

The spatial complement of the 0D restitution protocols
(engine/restitution.py): where `dynamic_restitution_scan` reads the
last two APDs at ONE probe pixel per pacing rate, `apd_map` reads them
at EVERY pixel of a `[T, H, W]` movie — the map alternans analyses are
actually about, because spatially DISCORDANT alternans (neighbouring
regions alternating out of phase, separated by nodal lines) is the
standard precursor of conduction block and wavebreak.  The reference
had no per-pixel quantification at all (its screens were judged by
eye); this rides the same saved-cube pipeline as the spiral-tip and
dominant-frequency tools (utils/tips.py, utils/spectral.py, CLI
`tips`/`dfmap` — here `apdmap`).

Everything is vectorized numpy on the host: beat segmentation by
threshold crossing with cumulative-count event ranking (no per-pixel
Python loops), APDs at the `apd_at_level` threshold convention of the
physiology pins (peak - level*(peak - rest), per pixel), and
sub-sample linear interpolation of both crossings.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import numpy as np


@dataclass
class ApdMapResult:
    apd_last: np.ndarray    # [H, W] APD of the last complete beat (ms)
    apd_prev: np.ndarray    # [H, W] APD of the beat before it (ms)
    alternans: np.ndarray   # [H, W] |apd_last - apd_prev| (ms)
    t_up_last: np.ndarray   # [H, W] upstroke time of the last beat (ms)
    t_up_prev: np.ndarray   # [H, W] upstroke time of the previous beat
    n_beats: np.ndarray     # [H, W] int count of complete beats seen
    valid: np.ndarray       # [H, W] bool, >= 2 complete beats AND the
    #                         movie's tail repolarized (not `truncated`)
    truncated: np.ndarray = None  # [H, W] bool: final beat cut by the
    #                         movie's end (still above threshold at the
    #                         last frame) — such pixels would silently
    #                         read a phase-flipped EARLIER beat pair, so
    #                         they are excluded from `valid`

    @property
    def truncated_fraction(self) -> float:
        """Fraction of firing tissue whose final beat the movie cut
        off.  More than a few percent means the recording should be
        extended (~APD_max + conduction time past the last stimulus)
        before trusting cross-pixel phase claims."""
        if self.truncated is None:
            return 0.0
        firing = self.n_beats >= 1
        denom = int(firing.sum())
        if denom == 0:
            return 0.0
        return float((self.truncated & firing).sum() / denom)

    @property
    def discordance(self) -> Optional[float]:
        """Fraction of valid tissue whose phase of alternation opposes
        the majority (0 = fully concordant, -> 0.5 = maximally
        discordant).  Uses the SIGNED last-minus-previous difference;
        None if nothing alternates above 1 ms."""
        signed = self.apd_last - self.apd_prev
        m = self.valid & (np.abs(signed) > 1.0)
        if not m.any():
            return None
        pos = (signed[m] > 0).mean()
        return float(min(pos, 1.0 - pos))


def _first_event_at_rank(event: np.ndarray, rank: np.ndarray,
                         want: np.ndarray) -> np.ndarray:
    """Index (along axis 0) of the event whose cumulative rank equals
    `want` per pixel; 0 where absent (caller masks validity).

    `event` [T, H, W] bool, `rank` its cumsum along t, `want` [H, W]."""
    sel = event & (rank == want[None])
    return np.argmax(sel, axis=0)


def apd_map(
    movie: np.ndarray,
    frame_ms: float,
    level: float = 0.9,
    rest: Optional[np.ndarray] = None,
    min_apd_ms: float = 5.0,
) -> ApdMapResult:
    """Per-pixel APD of the last two complete beats in `movie`.

    - `movie`: `[T, H, W]` potential (any scale — normalized engine
      frames or mV volumes sliced to 2D; thresholds are per-pixel).
    - `frame_ms`: movie cadence (the engine's
      `record_frames_every_ms` / `dt_per_plot` product).
    - `level`: repolarization level (0.9 = APD90), threshold
      `peak - level*(peak - rest)` per pixel — the apd_at_level
      convention (engine/restitution.py, tests/test_physiology.py).
    - `rest`: per-pixel resting potential `[H, W]`; default the
      per-pixel movie minimum (correct once any diastole is in frame).

    A "complete beat" is a rising threshold crossing followed by a
    falling one; beats still above threshold at the movie's end are
    ignored.  Pixels with fewer than two complete beats (holes, core,
    2:1-blocked regions) report NaN with `valid=False` — so a 2:1
    region shows up as a valid=False island, distinct from the
    out-of-phase bands `discordance` measures.

    For CROSS-PIXEL phase comparisons (the signed map / `discordance`)
    the movie must include enough tail for the final beat to
    repolarize at EVERY pixel: a pixel whose last beat is cut off at
    the movie's end would otherwise silently read the previous beat
    pair, which flips its phase in an alternating rhythm.  Such pixels
    are DETECTED (still above threshold at the last frame), reported in
    `truncated`, excluded from `valid`, and a UserWarning fires when
    they exceed 2% of firing tissue — record ~APD_max + conduction time
    past the last stimulus to avoid them.
    """
    movie = np.asarray(movie, np.float32)
    if movie.ndim != 3:
        raise ValueError(f"movie must be [T, H, W], got {movie.shape}")
    t_len = movie.shape[0]
    if t_len < 3:
        raise ValueError("movie too short to segment beats")

    if rest is None:
        rest = movie.min(axis=0)
    peak = movie.max(axis=0)
    thr = peak - level * (peak - rest)
    amp_ok = (peak - rest) > 1e-6  # flat pixels (holes) never fire

    above = movie >= thr[None]
    rising = np.zeros_like(above)
    falling = np.zeros_like(above)
    rising[1:] = above[1:] & ~above[:-1]
    falling[1:] = ~above[1:] & above[:-1]

    # int32 ranks: beat counts are tiny, and int64 cumsums over a
    # 512² x 100+-frame movie would cost hundreds of MB on this host
    r_rank = np.cumsum(rising, axis=0, dtype=np.int32)
    f_rank = np.cumsum(falling, axis=0, dtype=np.int32)
    n_rising = r_rank[-1]
    n_falling = f_rank[-1]

    def interp_cross(idx):
        """Crossing time (ms) linearly interpolated inside [idx-1, idx];
        one algebraic form serves both directions ((thr-v0)/(v1-v0)
        equals (v0-thr)/(v0-v1))."""
        i0 = np.maximum(idx - 1, 0)
        flat = movie.reshape(t_len, -1)
        v0 = np.take_along_axis(flat, i0.reshape(1, -1), axis=0)[0]
        v1 = np.take_along_axis(flat, idx.reshape(1, -1), axis=0)[0]
        v0 = v0.reshape(idx.shape)
        v1 = v1.reshape(idx.shape)
        d = v1 - v0
        frac = np.where(np.abs(d) > 1e-12, (thr - v0) / np.where(
            np.abs(d) > 1e-12, d, 1.0), 0.0)
        frac = np.clip(frac, 0.0, 1.0)
        return (idx - 1 + frac) * frame_ms

    def beat(rank_from_last):
        """(t_up, apd, ok) for the rank_from_last-th complete beat
        counting back from the movie's end (1 = last complete)."""
        # complete beats only: the k-th rising is complete iff a falling
        # with rank > f_rank[rising_k] exists.  Work from the falling
        # side instead: the j-th-from-last FALLING ends the j-th-from-
        # last complete beat.
        want_f = n_falling - (rank_from_last - 1)
        ok = amp_ok & (want_f >= 1)
        f_idx = _first_event_at_rank(falling, f_rank, want_f)
        # the rising that started this beat: the last rising at or
        # before f_idx, i.e. rank r_rank[f_idx]
        flatr = r_rank.reshape(t_len, -1)
        r_at_f = np.take_along_axis(
            flatr, f_idx.reshape(1, -1), axis=0
        )[0].reshape(f_idx.shape)
        ok &= r_at_f >= 1
        r_idx = _first_event_at_rank(rising, r_rank,
                                     np.maximum(r_at_f, 1))
        t_up = interp_cross(r_idx)
        t_dn = interp_cross(f_idx)
        apd = t_dn - t_up
        ok &= apd >= min_apd_ms
        return (np.where(ok, t_up, np.nan),
                np.where(ok, apd, np.nan), ok)

    t_up_l, apd_l, ok_l = beat(1)
    t_up_p, apd_p, ok_p = beat(2)
    # distinct beats required (rank bookkeeping guarantees it when both
    # exist, but a single beat would alias: want_f differs so it can't)
    # tail guard: a pixel still above threshold at the movie's end has
    # its ongoing beat cut off — "last complete" is then an EARLIER
    # beat, phase-flipped relative to fully-recorded neighbours
    truncated = amp_ok & above[-1]
    valid = ok_l & ok_p & ~truncated
    alternans = np.where(valid, np.abs(apd_l - apd_p), np.nan)
    res = ApdMapResult(
        apd_last=apd_l, apd_prev=apd_p, alternans=alternans,
        t_up_last=t_up_l, t_up_prev=t_up_p,
        n_beats=np.minimum(n_rising, n_falling).astype(np.int32),
        valid=valid, truncated=truncated,
    )
    if res.truncated_fraction > 0.02:
        import warnings

        warnings.warn(
            f"apd_map: {res.truncated_fraction:.1%} of firing pixels "
            "still above threshold at the movie's end (final beat cut "
            "off — excluded from `valid`); extend the recording by "
            "~APD_max + conduction time past the last stimulus",
            UserWarning, stacklevel=2,
        )
    return res


def plot_apd_map(path: str, r: ApdMapResult) -> None:
    """Two-panel figure: last-beat APD map and SIGNED beat-to-beat
    difference (diverging scale — discordant regions show as opposite
    signs with nodal lines between them)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, (ax, ax2) = plt.subplots(
        1, 2, figsize=(9.2, 3.8), constrained_layout=True)
    h, w = r.apd_last.shape
    # strips would render as slivers under equal aspect
    aspect = "auto" if max(h, w) > 4 * min(h, w) else None
    apd = np.where(r.valid, r.apd_last, np.nan)
    im = ax.imshow(apd, cmap="viridis", interpolation="nearest",
                   aspect=aspect)
    fig.colorbar(im, ax=ax, shrink=0.85, label="APD (ms)")
    ax.set_title("last-beat APD", fontsize=10)
    signed = np.where(r.valid, r.apd_last - r.apd_prev, np.nan)
    lim = np.nanmax(np.abs(signed)) if np.isfinite(signed).any() else 1.0
    lim = max(float(lim), 1e-3)
    im2 = ax2.imshow(signed, cmap="RdBu_r", vmin=-lim, vmax=lim,
                     interpolation="nearest", aspect=aspect)
    fig.colorbar(im2, ax=ax2, shrink=0.85, label="ΔAPD (ms)")
    ax2.set_title("beat-to-beat ΔAPD (signed)", fontsize=10)
    for a in (ax, ax2):
        a.set_xticks([])
        a.set_yticks([])
    fig.savefig(path, dpi=150)
    plt.close(fig)
