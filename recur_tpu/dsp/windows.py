"""Analysis window functions (recur_window_init, mfcc.c:267-296)."""

from __future__ import annotations

from enum import IntEnum

import numpy as np


class WindowType(IntEnum):
    NONE = 0
    HANN = 1
    VORBIS = 2
    MP3 = 3


def window_mask(length: int, wtype: WindowType | int,
                scale: float = 1.0) -> np.ndarray:
    wtype = WindowType(wtype)
    i = np.arange(length, dtype=np.float64)
    if wtype == WindowType.HANN:
        w = 0.5 - 0.5 * np.cos(2.0 * np.pi * i / length)
    elif wtype == WindowType.MP3:
        w = np.sin(np.pi * (i + 0.5) / length)
    elif wtype == WindowType.VORBIS:
        z = np.pi * (i + 0.5) / length
        w = np.sin(0.5 * np.pi * np.sin(z) ** 2)
    else:
        w = np.ones(length)
    return (w * scale).astype(np.float32)
