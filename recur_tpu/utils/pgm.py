"""Debug imaging (pgm_dump.h): PGM/PPM dumps of float arrays, signed
red/green colour maps of weights, and TemporalPPM activation timelines."""

from __future__ import annotations

from typing import Optional

import numpy as np


def pgm_dump(array: np.ndarray, path: str):
    """u8 or float [h, w] → binary PGM (P5)."""
    a = np.asarray(array)
    if a.dtype != np.uint8:
        lo, hi = float(a.min()), float(a.max())
        scale = 255.0 / (hi - lo) if hi > lo else 0.0
        a = ((a - lo) * scale).astype(np.uint8)
    h, w = a.shape
    with open(path, "wb") as f:
        f.write(b"P5\n%d %d\n255\n" % (w, h))
        f.write(a.tobytes())


def ppm_dump(rgb: np.ndarray, path: str):
    """u8 [h, w, 3] → binary PPM (P6)."""
    a = np.asarray(rgb, np.uint8)
    h, w, _ = a.shape
    with open(path, "wb") as f:
        f.write(b"P6\n%d %d\n255\n" % (w, h))
        f.write(a.tobytes())


def colour_weights(array: np.ndarray) -> np.ndarray:
    """Signed float array → red(negative)/green(positive) u8 image
    (dump_colour_weights, pgm_dump.h)."""
    a = np.asarray(array, np.float32)
    mx = float(np.abs(a).max()) or 1.0
    n = np.clip(-a / mx, 0, 1)
    p = np.clip(a / mx, 0, 1)
    img = np.zeros(a.shape + (3,), np.uint8)
    img[..., 0] = (np.sqrt(n) * 255).astype(np.uint8)
    img[..., 1] = (np.sqrt(p) * 255).astype(np.uint8)
    return img


def dump_colour_weights(array: np.ndarray, basename: str, generation: int):
    """dump_colour_weights_autoname (pgm_dump.h:214)."""
    path = f"{basename}-{generation}.ppm"
    ppm_dump(colour_weights(array), path)
    return path


class TemporalPPM:
    """Accumulates one row per timestep (activations over time) and writes
    an image every `height` rows (pgm_dump.h:227-301)."""

    def __init__(self, width: int, height: int, name: str,
                 colour: bool = True, directory: str = "."):
        self.width = width
        self.height = height
        self.name = name
        self.colour = colour
        self.directory = directory
        self.rows: list[np.ndarray] = []
        self.counter = 0

    def add_row(self, row) -> Optional[str]:
        r = np.asarray(row, np.float32).ravel()[:self.width]
        if len(r) < self.width:
            r = np.pad(r, (0, self.width - len(r)))
        self.rows.append(r)
        if len(self.rows) >= self.height:
            return self.flush()
        return None

    def flush(self) -> Optional[str]:
        if not self.rows:
            return None
        img = np.stack(self.rows)
        path = f"{self.directory}/{self.name}-{self.counter:05d}"
        if self.colour:
            path += ".ppm"
            ppm_dump(colour_weights(img), path)
        else:
            path += ".pgm"
            pgm_dump(img, path)
        self.rows = []
        self.counter += 1
        return path


def multi_pgm_dump(net, dumpees: str, basename: str = "untitled",
                   bptt=None) -> list[str]:
    """rnn_multi_pgm_dump (recur-nn-init.c:744-823): dump weight matrices by
    3-char codes — in('i','h','b') + out('h','o','i') + kind('w','m','d').
    net is a recur_tpu.nn.Net; bptt optionally provides momentum/delta."""
    out = []
    for token in dumpees.split():
        if len(token) != 3:
            continue
        src, dst, kind = token
        array = None
        if dst == "h" and src in "ih":
            if kind == "w":
                array = np.asarray(net.params.ih)
            elif bptt is not None and kind == "m":
                array = np.asarray(bptt.ih_momentum)
            elif bptt is not None and kind == "d":
                array = np.asarray(bptt.ih_delta)
            if array is not None and src == "h":
                array = array[:net.cfg.hidden_size + 1]
        elif src == "h" and dst == "o":
            if kind == "w":
                array = np.asarray(net.params.ho)
            elif bptt is not None and kind == "m":
                array = np.asarray(bptt.ho_momentum)
            elif bptt is not None and kind == "d":
                array = np.asarray(bptt.ho_delta)
        elif src == "b" and dst == "i" and net.params.bottom is not None:
            if kind == "w":
                array = np.asarray(net.params.bottom)
        if array is not None:
            out.append(dump_colour_weights(array, f"{basename}-{token}",
                                           net.generation))
    return out
