#!/usr/bin/env python
"""Replay a saved voltage movie (cube.npy) at ~40 fps
(reference playcube.py:5-15)."""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.join(_os.path.dirname(_os.path.abspath(__file__)), ".."))


import sys

from fib_tf_tpu.utils.viz import Screen, play_cube


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "cube.npy"
    import numpy as np

    cube = np.load(path)
    im = Screen(cube.shape[1], cube.shape[2], "cube replay")
    play_cube(cube, im=im, fps=40)
    if im.backend_name == "headless":
        im.save("cube_last_frame.png")
        print("headless: wrote cube_last_frame.png")
    else:
        im.wait()


if __name__ == "__main__":
    main()
