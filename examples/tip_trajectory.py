#!/usr/bin/env python
"""Spiral-tip trajectory from a saved voltage movie.

The reference's headline experiment is the anchored spiral
(fenton.py:155-187 saves `cube.npy`; playcube.py replays it), and its
docs discuss tip meander — but it had no tip-finding tooling.  This
post-processes a cube into phase-singularity trajectories
(utils/tips.py: time-delay-embedding phase + topological charge), the
standard quantification of spiral dynamics:

  python examples/fenton_spiral.py                 # writes cube.npy
  python examples/tip_trajectory.py cube.npy --save-plot tips.png
  python examples/tip_trajectory.py cube.npy --json
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import argparse
import json

import numpy as np

from fib_tf_tpu.utils.tips import plot_tracks, singularity_count, track_tips


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("cube", nargs="?", default="cube.npy",
                    help="[T, H, W] .npy voltage movie (fenton_spiral / "
                         "CLI run --save-cube format)")
    ap.add_argument("--tau", type=int, default=2,
                    help="phase-embedding delay in frames")
    ap.add_argument("--max-jump", type=float, default=75.0,
                    help="max tip movement per frame when linking "
                         "(cells; default sized for 10 ms/frame cubes)")
    ap.add_argument("--max-gap", type=int, default=3,
                    help="missed frames a track may coast over")
    ap.add_argument("--min-length", type=int, default=5,
                    help="drop tracks shorter than this many detections")
    ap.add_argument("--json", action="store_true")
    ap.add_argument("--save-plot", default=None, metavar="PATH")
    args = ap.parse_args()

    cube = np.load(args.cube)
    tracks = track_tips(cube, tau=args.tau, max_jump=args.max_jump,
                        max_gap=args.max_gap, min_length=args.min_length)
    counts = singularity_count(cube, tau=args.tau)

    if args.json:
        print(json.dumps({
            "frames": int(cube.shape[0]),
            "n_tracks": len(tracks),
            "mean_singularities": float(counts.mean()),
            "max_singularities": int(counts.max()) if len(counts) else 0,
            "tracks": [{
                "charge": tr.charge,
                "length": len(tr),
                "start_frame": tr.frames[0],
                "meander_extent": list(tr.meander_extent()),
            } for tr in tracks[:16]],
        }))
    else:
        print(f"{args.cube}: {cube.shape[0]} frames {cube.shape[1]}x"
              f"{cube.shape[2]}, mean rotors/frame {counts.mean():.2f}")
        if not tracks:
            print("no sustained tips (plane wave or quiescent)")
        for i, tr in enumerate(tracks[:8]):
            ey, ex = tr.meander_extent()
            print(f"  tip {i}: charge {tr.charge:+d}, {len(tr)} frames "
                  f"from frame {tr.frames[0]}, meander {ey:.1f}x{ex:.1f} "
                  f"cells around ({np.mean(tr.ys):.0f}, {np.mean(tr.xs):.0f})")

    if args.save_plot:
        plot_tracks(args.save_plot, cube, tracks)
        print(f"saved {args.save_plot}")


if __name__ == "__main__":
    main()
