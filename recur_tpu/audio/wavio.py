"""Minimal WAV ingestion for the audio harnesses (the filesrc→wavparse→
audioconvert→audioresample front half of the reference's GStreamer
pipelines, classify.py:63-96)."""

from __future__ import annotations

import wave

import numpy as np


def read_wav(path: str, target_rate: int | None = None,
             mono: bool = True) -> tuple[np.ndarray, int]:
    """Read a WAV file → (float32 samples in s16 range, rate).  Multi-channel
    files are averaged to mono unless mono=False (then [C, N]).  Linear
    resampling if target_rate differs."""
    with wave.open(path, "rb") as w:
        rate = w.getframerate()
        n = w.getnframes()
        ch = w.getnchannels()
        width = w.getsampwidth()
        raw = w.readframes(n)
    if width == 2:
        data = np.frombuffer(raw, dtype="<i2").astype(np.float32)
    elif width == 1:
        data = (np.frombuffer(raw, dtype=np.uint8).astype(np.float32)
                - 128.0) * 256.0
    elif width == 4:
        data = np.frombuffer(raw, dtype="<i4").astype(np.float32) / 65536.0
    else:
        raise ValueError(f"unsupported sample width {width} in {path}")
    if ch > 1:
        data = data.reshape(-1, ch).T
        if mono:
            data = data.mean(axis=0)
    if target_rate and rate != target_rate:
        data = resample_linear(data, rate, target_rate)
        rate = target_rate
    return data, rate


def resample_linear(x: np.ndarray, rate_in: int, rate_out: int) -> np.ndarray:
    if rate_in == rate_out:
        return x
    n_out = int(round(x.shape[-1] * rate_out / rate_in))
    t_out = np.arange(n_out) * (rate_in / rate_out)
    i = np.clip(t_out.astype(np.int64), 0, x.shape[-1] - 2)
    frac = (t_out - i).astype(np.float32)
    if x.ndim == 1:
        return (x[i] * (1 - frac) + x[i + 1] * frac).astype(np.float32)
    return (x[..., i] * (1 - frac) + x[..., i + 1] * frac).astype(np.float32)


def write_wav(path: str, data: np.ndarray, rate: int):
    """Write float (s16 range) or int16 samples; [N] or [C, N]."""
    data = np.asarray(data)
    if data.ndim == 2:
        ch = data.shape[0]
        data = data.T.reshape(-1)
    else:
        ch = 1
    pcm = np.clip(data, -32768, 32767).astype("<i2")
    with wave.open(path, "wb") as w:
        w.setnchannels(ch)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(pcm.tobytes())
