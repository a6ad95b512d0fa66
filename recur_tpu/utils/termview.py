"""Live terminal video display: 24-bit ANSI half-block rendering.

The reference's live-display path is GTK windows hosting the video pipelines
(gtk-recur.c, rnnca-player.c).  Headless boxes still have a display — the
terminal.  Each character cell shows two vertical pixels (▀ with a truecolor
foreground for the top pixel and background for the bottom), so a 144×96 CA
frame renders as 144×48 cells, updated in place with cursor-home escapes.
"""

from __future__ import annotations

import sys
import time

import numpy as np

HALF_BLOCK = "▀"
_HOME = "\x1b[H"
_CLEAR = "\x1b[2J"
_HIDE = "\x1b[?25l"
_SHOW = "\x1b[?25h"
_RESET = "\x1b[0m"


def ycbcr_to_rgb(frame: np.ndarray) -> np.ndarray:
    """[3, h, w] u8 YCbCr (BT.601 full-range-ish, as the pipelines use) →
    [h, w, 3] u8 RGB."""
    y = frame[0].astype(np.float32)
    cb = frame[1].astype(np.float32) - 128.0
    cr = frame[2].astype(np.float32) - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    rgb = np.stack([r, g, b], axis=-1)
    return np.clip(rgb, 0, 255).astype(np.uint8)


def frame_to_ansi(rgb: np.ndarray, max_width: int = 0) -> str:
    """[h, w, 3] u8 RGB → a half-block ANSI string (rows joined by \\n)."""
    h, w, _ = rgb.shape
    if max_width and w > max_width:
        step = -(-w // max_width)      # ceil division
        rgb = rgb[::step, ::step]
        h, w, _ = rgb.shape
    if h % 2:
        rgb = np.concatenate([rgb, np.zeros((1, w, 3), np.uint8)])
        h += 1
    top = rgb[0::2]
    bot = rgb[1::2]
    rows = []
    for r in range(h // 2):
        cells = []
        for c in range(w):
            tr, tg, tb = (int(x) for x in top[r, c])
            br, bg, bb = (int(x) for x in bot[r, c])
            cells.append(f"\x1b[38;2;{tr};{tg};{tb}m"
                         f"\x1b[48;2;{br};{bg};{bb}m{HALF_BLOCK}")
        rows.append("".join(cells) + _RESET)
    return "\n".join(rows)


class TermViewer:
    """In-place terminal video player (context manager restores the
    cursor)."""

    def __init__(self, fps: float = 20.0, max_width: int = 0,
                 out=None):
        self.delay = 1.0 / fps if fps > 0 else 0.0
        self.max_width = max_width
        self.out = out or sys.stdout
        self._last = 0.0

    def __enter__(self):
        self.out.write(_CLEAR + _HIDE)
        return self

    def __exit__(self, *exc):
        self.out.write(_RESET + _SHOW + "\n")
        self.out.flush()

    def show(self, frame: np.ndarray, caption: str = ""):
        """frame: [3, h, w] u8 YCbCr (pipeline format) or [h, w, 3] u8
        RGB."""
        if frame.ndim == 3 and frame.shape[0] == 3 and frame.shape[-1] != 3:
            rgb = ycbcr_to_rgb(frame)
        else:
            rgb = frame
        txt = frame_to_ansi(rgb, self.max_width)
        now = time.monotonic()
        wait = self._last + self.delay - now
        if wait > 0:
            time.sleep(wait)
        self._last = time.monotonic()
        self.out.write(_HOME + txt)
        if caption:
            self.out.write("\n" + _RESET + caption + "\x1b[K")
        self.out.flush()
