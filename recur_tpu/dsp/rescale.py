"""Image plane downscaling (rescale.c): exact area-average, nearest-neighbour
skipping, adaptive choice, and u8 -> [0,1) float conversion, for the video
pipelines (recur / rnnca)."""

from __future__ import annotations

import numpy as np


def exact_downscale(src: np.ndarray, factor: int) -> np.ndarray:
    """Area-average u8 downscale by an integer factor
    (recur_exact_downscale)."""
    h, w = src.shape[:2]
    h2, w2 = h // factor, w // factor
    a = src[:h2 * factor, :w2 * factor].astype(np.float32)
    a = a.reshape(h2, factor, w2, factor).mean(axis=(1, 3))
    return (a + 0.5).astype(src.dtype)


def skipping_downscale(src: np.ndarray, factor: int) -> np.ndarray:
    """Nearest (skipping) downscale (recur_skipping_downscale)."""
    return src[::factor, ::factor].copy()


def adaptive_downscale(src: np.ndarray, factor: int) -> np.ndarray:
    """recur_adaptive_downscale: exact for small factors, skipping for
    large ones (where averaging cost outweighs quality)."""
    if factor <= 4:
        return exact_downscale(src, factor)
    return skipping_downscale(src, factor)


def downscale_to_float(src: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """recur_integer_downscale_to_float (rescale.h:46-64): u8 plane ->
    [0,1) float32 plane at an integer-divisor size, area-averaged.

    Sources smaller than the target grid (which the reference never saw —
    GStreamer caps negotiation rescaled upstream) are nearest-resampled."""
    h, w = src.shape[:2]
    if h < out_h or w < out_w:
        yi = np.minimum(np.arange(out_h) * h // out_h, h - 1)
        xi = np.minimum(np.arange(out_w) * w // out_w, w - 1)
        return (src[np.ix_(yi, xi)].astype(np.float32) / 256.0)
    fy, fx = h // out_h, w // out_w
    fy, fx = max(fy, 1), max(fx, 1)
    a = src[:out_h * fy, :out_w * fx].astype(np.float32)
    a = a.reshape(out_h, fy, out_w, fx).mean(axis=(1, 3))
    return (a / 256.0).astype(np.float32)


def float_downscale(src: np.ndarray, factor: int) -> np.ndarray:
    """Float plane area-average downscale (recur_float_downscale)."""
    h, w = src.shape[:2]
    h2, w2 = h // factor, w // factor
    a = src[:h2 * factor, :w2 * factor]
    return a.reshape(h2, factor, w2, factor).mean(axis=(1, 3)).astype(
        src.dtype)


def load_pgm(path: str) -> np.ndarray:
    """recur_load_pgm_file: minimal binary PGM (P5) reader."""
    with open(path, "rb") as f:
        data = f.read()
    if not data.startswith(b"P5"):
        raise ValueError("not a binary PGM (P5) file")
    # parse header tokens, skipping comments
    tokens = []
    i = 2
    while len(tokens) < 3:
        while i < len(data) and data[i:i + 1].isspace():
            i += 1
        if data[i:i + 1] == b"#":
            while i < len(data) and data[i] != 0x0A:
                i += 1
            continue
        j = i
        while j < len(data) and not data[j:j + 1].isspace():
            j += 1
        tokens.append(int(data[i:j]))
        i = j
    w, h, maxval = tokens
    i += 1
    return np.frombuffer(data[i:i + w * h], dtype=np.uint8).reshape(h, w)


def u8_thumbnail(frame, h: int, w: int):
    """[3, H, W] u8 → [3, h, w] u8 working-size thumbnail (shared by the
    video players)."""
    import numpy as np
    out = np.empty((3, h, w), np.uint8)
    for p in range(3):
        out[p] = (downscale_to_float(frame[p], h, w) * 256).astype(np.uint8)
    return out
