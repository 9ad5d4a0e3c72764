"""Visualization: live Screen (SDL2 / matplotlib / headless) + cube replay.

Role parity with the reference's screen.py (SDL2 imshow/plot/text/save,
screen.py:255-374) and playcube.py (movie replay), re-designed around a
single software composition path: frames are rendered to RGB with
numpy/PIL (grayscale or a matplotlib colormap), then presented by whichever
backend is available:

  * `sdl`       — a minimal fresh ctypes binding of libSDL2 (only the calls
                  imshow needs); used when libSDL2 is present.
  * `matplotlib`— interactive figure window (needs a display).
  * `headless`  — keeps the last frame / optionally every frame; `save`
                  writes PNGs.  Default in this image (no SDL2, no X).

Benchmarks never touch this module — the engine is viz-free unless a
Screen is passed in (as in the reference, fenton.py:173-174).
"""

from __future__ import annotations

import ctypes
import os
import time
from typing import List, Optional

import numpy as np

from fib_tf_tpu.utils.sharedlib import SharedLibrary


def to_rgb(image: np.ndarray, cmap: Optional[str] = None) -> np.ndarray:
    """[H, W] floats in [0, 1] -> [H, W, 3] uint8 (grayscale or colormap)."""
    img = np.clip(np.asarray(image, dtype=np.float32), 0.0, 1.0)
    if cmap:
        from matplotlib import colormaps

        rgba = colormaps[cmap](img)
        return (rgba[..., :3] * 255).astype(np.uint8)
    g = (img * 255).astype(np.uint8)
    return np.stack([g, g, g], axis=-1)


# ---------------------------------------------------------------------------
# Backends
# ---------------------------------------------------------------------------

class HeadlessBackend:
    """Stores frames; save() writes a PNG of the last frame."""

    def __init__(self, height: int, width: int, title: str,
                 keep_all: bool = False):
        self.height, self.width, self.title = height, width, title
        self.keep_all = keep_all
        self.last_frame: Optional[np.ndarray] = None
        self.frames: List[np.ndarray] = []

    def present(self, rgb: np.ndarray):
        self.last_frame = rgb
        if self.keep_all:
            self.frames.append(rgb)

    def poll_quit(self) -> bool:
        return False

    def wait(self):
        pass

    def close(self):
        pass


class MatplotlibBackend:
    def __init__(self, height: int, width: int, title: str):
        import matplotlib.pyplot as plt

        self._plt = plt
        plt.ion()
        self._fig, self._ax = plt.subplots()
        self._fig.canvas.manager.set_window_title(title)
        self._im = None

    def present(self, rgb: np.ndarray):
        if self._im is None:
            self._im = self._ax.imshow(rgb)
            self._ax.axis("off")
        else:
            self._im.set_data(rgb)
        self._fig.canvas.draw_idle()
        self._plt.pause(0.001)

    def poll_quit(self) -> bool:
        return not self._plt.fignum_exists(self._fig.number)

    def wait(self):
        self._plt.ioff()
        self._plt.show()

    def close(self):
        self._plt.close(self._fig)


class SDLBackend:
    """Minimal SDL2 presentation path (init, window, streaming texture)."""

    _INIT_VIDEO = 0x00000020
    _WINDOW_SHOWN = 0x00000004
    _PIXELFORMAT_RGB24 = 0x17401803
    _TEXTUREACCESS_STREAMING = 1
    _QUIT_EVENT = 0x100

    def __init__(self, height: int, width: int, title: str):
        lib = SharedLibrary("SDL2")
        self._lib = lib
        c = ctypes
        self._init = lib.bind("SDL_Init", [c.c_uint32], c.c_int)
        self._create_window = lib.bind(
            "SDL_CreateWindow",
            [c.c_char_p, c.c_int, c.c_int, c.c_int, c.c_int, c.c_uint32],
            c.c_void_p,
        )
        self._create_renderer = lib.bind(
            "SDL_CreateRenderer", [c.c_void_p, c.c_int, c.c_uint32],
            c.c_void_p,
        )
        self._create_texture = lib.bind(
            "SDL_CreateTexture",
            [c.c_void_p, c.c_uint32, c.c_int, c.c_int, c.c_int], c.c_void_p,
        )
        self._update_texture = lib.bind(
            "SDL_UpdateTexture",
            [c.c_void_p, c.c_void_p, c.c_void_p, c.c_int], c.c_int,
        )
        self._render_copy = lib.bind(
            "SDL_RenderCopy",
            [c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p], c.c_int,
        )
        self._render_present = lib.bind(
            "SDL_RenderPresent", [c.c_void_p], None
        )
        self._poll_event = lib.bind(
            "SDL_PollEvent", [c.c_void_p], c.c_int
        )
        self._destroy_window = lib.bind(
            "SDL_DestroyWindow", [c.c_void_p], None
        )

        if self._init(self._INIT_VIDEO) != 0:
            raise OSError("SDL_Init failed")
        self._window = self._create_window(
            title.encode(), 0x2FFF0000, 0x2FFF0000, width, height,
            self._WINDOW_SHOWN,
        )
        self._renderer = self._create_renderer(self._window, -1, 0)
        self._texture = self._create_texture(
            self._renderer, self._PIXELFORMAT_RGB24,
            self._TEXTUREACCESS_STREAMING, width, height,
        )
        self.width = width

    def present(self, rgb: np.ndarray):
        buf = np.ascontiguousarray(rgb)
        self._update_texture(
            self._texture, None,
            buf.ctypes.data_as(ctypes.c_void_p), self.width * 3,
        )
        self._render_copy(self._renderer, self._texture, None, None)
        self._render_present(self._renderer)

    def poll_quit(self) -> bool:
        event = (ctypes.c_uint8 * 64)()
        while self._poll_event(ctypes.byref(event)):
            etype = int.from_bytes(bytes(event[:4]), "little")
            if etype == self._QUIT_EVENT:
                return True
        return False

    def wait(self):
        while not self.poll_quit():
            time.sleep(0.05)

    def close(self):
        if self._destroy_window and self._window:
            self._destroy_window(self._window)


# ---------------------------------------------------------------------------
# Screen
# ---------------------------------------------------------------------------

class Screen:
    """Live display of the transmembrane potential.

    Same surface as the reference's Screen (imshow / plot / draw_text /
    peek / wait / save, screen.py:255-374); backend auto-selected.
    """

    def __init__(self, height: int, width: int, title: str = "fib_tf_tpu",
                 backend: str = "auto", cmap: Optional[str] = None,
                 keep_all_frames: bool = False):
        self.height, self.width = height, width
        self.cmap = cmap
        self._annotations: List = []
        self._last_rgb: Optional[np.ndarray] = None
        if backend == "auto":
            backend = self._pick_backend()
        if backend == "sdl":
            self._backend = SDLBackend(height, width, title)
        elif backend == "matplotlib":
            self._backend = MatplotlibBackend(height, width, title)
        else:
            self._backend = HeadlessBackend(
                height, width, title, keep_all=keep_all_frames
            )
        self.backend_name = backend

    @staticmethod
    def _pick_backend() -> str:
        from fib_tf_tpu.utils.sharedlib import find_shared_library

        if find_shared_library("SDL2"):
            return "sdl"
        if os.environ.get("DISPLAY"):
            return "matplotlib"
        return "headless"

    # -- drawing -----------------------------------------------------------------

    def imshow(self, image: np.ndarray):
        """Display a [H, W] float array in [0, 1]."""
        rgb = to_rgb(image, self.cmap)
        if self._annotations:
            rgb = self._compose_annotations(rgb)
        # cache backend-independently so save() works on SDL/matplotlib too
        # (the reference reads pixels back from the renderer, screen.py:364-374)
        self._last_rgb = rgb
        self._backend.present(rgb)

    def plot(self, series: np.ndarray, color=(255, 64, 64)):
        """Overlay a line plot of a 1D series along the bottom of the
        frame (reference screen.py:299-315)."""
        self._annotations.append(("plot", np.asarray(series), color))

    def draw_text(self, text: str, xy=(4, 4), color=(255, 255, 0)):
        """Overlay text at pixel xy (reference screen.py:317-341)."""
        self._annotations.append(("text", (text, xy), color))

    def _compose_annotations(self, rgb: np.ndarray) -> np.ndarray:
        from PIL import Image, ImageDraw

        img = Image.fromarray(rgb)
        draw = ImageDraw.Draw(img)
        for kind, payload, color in self._annotations:
            if kind == "text":
                text, xy = payload
                draw.text(xy, text, fill=tuple(color))
            elif kind == "plot":
                series = payload
                if len(series) > 1:
                    lo, hi = float(series.min()), float(series.max())
                    rng = (hi - lo) or 1.0
                    h = self.height
                    pts = [
                        (
                            int(i * (self.width - 1) / (len(series) - 1)),
                            int(h - 1 - (v - lo) / rng * (h // 4)),
                        )
                        for i, v in enumerate(series)
                    ]
                    draw.line(pts, fill=tuple(color))
        self._annotations.clear()
        return np.asarray(img)

    # -- control ------------------------------------------------------------------

    def peek(self) -> bool:
        """Pump events; returns True if the user asked to close
        (reference screen.py:343-355)."""
        return self._backend.poll_quit()

    def wait(self):
        """Block until the window closes (reference screen.py:357-362)."""
        self._backend.wait()

    def save(self, path: str):
        """Write the current frame as PNG (reference screen.py:364-374)."""
        frame = self._last_rgb
        if frame is None:
            frame = getattr(self._backend, "last_frame", None)
        if frame is None:
            raise RuntimeError("no frame to save (imshow never called?)")
        from PIL import Image

        Image.fromarray(frame).save(path)

    def close(self):
        self._backend.close()


# ---------------------------------------------------------------------------
# Cube recording / replay (reference fenton.py:179-187, playcube.py:5-15)
# ---------------------------------------------------------------------------

def save_cube(path: str, cube: np.ndarray):
    """Save a [T, H, W] voltage movie."""
    np.save(path, np.asarray(cube, dtype=np.float32))


def play_cube(path_or_cube, im: Optional[Screen] = None, fps: float = 40.0):
    """Replay a saved voltage movie on a Screen at ~fps (playcube.py:5-15).

    Headless screens just accumulate frames; interactive ones animate.
    """
    cube = (
        np.load(path_or_cube)
        if isinstance(path_or_cube, (str, os.PathLike))
        else np.asarray(path_or_cube)
    )
    if im is None:
        im = Screen(cube.shape[1], cube.shape[2], "cube replay")
    delay = 1.0 / fps
    for frame in cube:
        if im.peek():
            break
        im.imshow(frame)
        if im.backend_name != "headless":
            time.sleep(delay)
    return im
