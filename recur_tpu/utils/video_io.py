"""Minimal video I/O: Y4M (YUV4MPEG2) read/write for the video pipelines —
the role of the reference's GStreamer caps / ffmpeg prep (reduce-video.sh).
Y4M is ffmpeg-compatible (`ffmpeg -i x.mp4 -pix_fmt yuv420p x.y4m`)."""

from __future__ import annotations

from typing import Iterator, Optional

import numpy as np


def write_y4m(path: str, frames, width: int, height: int, fps: int = 20):
    """frames: iterable of [3, h, w] u8 YCbCr (4:4:4 downsampled to 4:2:0)."""
    with open(path, "wb") as f:
        f.write(f"YUV4MPEG2 W{width} H{height} F{fps}:1 Ip A1:1 C420\n"
                .encode())
        for fr in frames:
            f.write(b"FRAME\n")
            y, cb, cr = fr[0], fr[1], fr[2]
            f.write(np.ascontiguousarray(y).tobytes())
            for plane in (cb, cr):
                half = plane[::2, ::2]
                f.write(np.ascontiguousarray(half).tobytes())


def _read_exact(f, n: int) -> bytes:
    """Read exactly n bytes; pipes/FIFOs deliver short reads."""
    chunks = []
    while n:
        b = f.read(n)
        if not b:
            break
        chunks.append(b)
        n -= len(b)
    return b"".join(chunks)


def read_y4m(source) -> Iterator[np.ndarray]:
    """Yield [3, h, w] u8 YCbCr frames (chroma upsampled from 4:2:0).

    `source` is a path or an open binary stream — the latter lets Y4M
    arrive over a FIFO or an `ffmpeg -f yuv4mpegpipe -` pipe (the
    input-adapter seam, utils/avio.py)."""
    f = open(source, "rb") if isinstance(source, str) else source
    try:
        header = f.readline().decode()
        parts = header.split()
        w = h = 0
        c420 = True
        for tok in parts[1:]:
            if tok.startswith("W"):
                w = int(tok[1:])
            elif tok.startswith("H"):
                h = int(tok[1:])
            elif tok.startswith("C"):
                c420 = tok.startswith("C420")
        while True:
            line = f.readline()
            if not line or not line.startswith(b"FRAME"):
                break
            raw = _read_exact(f, w * h)
            if len(raw) < w * h:
                break
            y = np.frombuffer(raw, np.uint8).reshape(h, w)
            if c420:
                cw, ch = w // 2, h // 2
                raw = _read_exact(f, 2 * cw * ch)
                if len(raw) < 2 * cw * ch:
                    break
                cb = np.frombuffer(raw[:cw * ch], np.uint8).reshape(ch, cw)
                cr = np.frombuffer(raw[cw * ch:], np.uint8).reshape(ch, cw)
                cb = cb.repeat(2, 0).repeat(2, 1)[:h, :w]
                cr = cr.repeat(2, 0).repeat(2, 1)[:h, :w]
            else:
                raw = _read_exact(f, 2 * w * h)
                if len(raw) < 2 * w * h:
                    break
                cb = np.frombuffer(raw[:w * h], np.uint8).reshape(h, w)
                cr = np.frombuffer(raw[w * h:], np.uint8).reshape(h, w)
            yield np.stack([y, cb, cr])
    finally:
        if isinstance(source, str):
            f.close()
