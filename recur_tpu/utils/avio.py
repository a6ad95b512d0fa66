"""Input-adapter seam: one spec grammar for every audio/video source.

The reference ingests arbitrary live sources through GStreamer caps
negotiation — a microphone into classify-gtk, a v4l2 webcam into gtk-recur
(/root/reference/classify-gtk, gtk-recur.c), any container via decodebin.
This box has no audio/video devices, so the equivalent seam is a *source
spec* that every harness accepts wherever it takes a media path:

  audio                              video
  -----                              -----
  "x.wav"        WAV file            "x.y4m"       Y4M file
  "pipe:PATH"    raw s16le stream    "pipe:PATH"   Y4M stream on a FIFO
  "pipe:-"       stdin                             (header negotiated from
  "ffmpeg:SRC"   ffmpeg decode of     "ffmpeg:SRC"  the stream itself)
                 anything ffmpeg
                 can open (file, URL, device)

`pipe:` turns live input into plumbing: `arecord -f S16_LE -r 8000 > fifo`
or `ffmpeg ... -f s16le - > fifo` on any machine with devices, while the
harness reads `pipe:fifo`.  `ffmpeg:` spawns ffmpeg directly when the
binary exists (it is not in this image — the spec fails with a clear
error, and the pipe: path covers the same ground via external plumbing,
reduce-video.sh-style: /root/reference/scripts/reduce-video.sh).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, Optional

import numpy as np

from recur_tpu.audio.wavio import read_wav
from recur_tpu.utils.video_io import read_y4m, _read_exact


def _ffmpeg_cmd(src: str, out_args: list[str]) -> list[str]:
    path = shutil.which("ffmpeg")
    if not path:
        raise RuntimeError(
            "ffmpeg: source specs need an ffmpeg binary, which this "
            "environment lacks; decode externally into a FIFO and use "
            "pipe:<path> instead (e.g. `ffmpeg -i SRC -f s16le -ar 8000 "
            "-ac 1 - > fifo` on a machine that has it)")
    return [path, "-nostdin", "-loglevel", "error", "-i", src] + out_args


def _open_stream(path: str):
    """pipe:PATH → binary stream; 'pipe:-' is stdin."""
    if path == "-" or path == "":
        import sys
        return sys.stdin.buffer
    return open(path, "rb")


def _finish_ffmpeg(proc, spec: str):
    """The decode stream ended: a nonzero ffmpeg exit must raise, not
    silently yield an empty/truncated stream."""
    rc = proc.wait()
    if rc != 0:
        raise RuntimeError(f"ffmpeg failed (exit {rc}) decoding {spec!r}")


def _reap(proc):
    if proc.poll() is None:
        proc.terminate()
    try:
        proc.wait(timeout=5)
    except subprocess.TimeoutExpired:
        proc.kill()
        proc.wait()


def _s16_blocks(f, channels: int, block_samples: int) -> Iterator[np.ndarray]:
    frame = 2 * channels
    while True:
        raw = _read_exact(f, block_samples * frame)
        n = len(raw) // frame
        if n == 0:
            return
        data = np.frombuffer(raw[:n * frame], dtype="<i2")
        yield data.astype(np.float32).reshape(n, channels).T
        if n < block_samples:
            return


def audio_blocks(spec: str, rate: int, channels: int = 1,
                 block_samples: int = 8192) -> Iterator[np.ndarray]:
    """Yield [channels, n] float32 blocks (s16 range) from any audio spec.

    WAV files resample to `rate`; raw pipe streams are trusted to already
    be s16le interleaved at `rate` (exactly the element's sink caps,
    gstclassify.c:173-177)."""
    if spec.startswith("pipe:"):
        f = _open_stream(spec[5:])
        try:
            yield from _s16_blocks(f, channels, block_samples)
        finally:
            if spec[5:] not in ("", "-"):
                f.close()
    elif spec.startswith("ffmpeg:"):
        cmd = _ffmpeg_cmd(spec[7:], ["-f", "s16le", "-ar", str(rate),
                                     "-ac", str(channels), "-"])
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        try:
            yield from _s16_blocks(proc.stdout, channels, block_samples)
            _finish_ffmpeg(proc, spec)
        finally:
            _reap(proc)
    else:
        data, _ = read_wav(spec, target_rate=rate, mono=channels == 1)
        if data.ndim == 1:
            data = data[None]
        for i in range(0, data.shape[1], block_samples):
            yield data[:, i:i + block_samples]


def read_audio(spec: str, rate: int, channels: int = 1) -> np.ndarray:
    """Read an entire audio source → [n] (mono) or [channels, n] float32."""
    blocks = list(audio_blocks(spec, rate, channels))
    out = (np.concatenate(blocks, axis=1) if blocks
           else np.zeros((channels, 0), np.float32))
    return out[0] if channels == 1 else out


def video_frames(spec: str) -> Iterator[np.ndarray]:
    """Yield [3, h, w] u8 YCbCr frames from any video spec."""
    if spec.startswith("pipe:"):
        f = _open_stream(spec[5:])
        try:
            yield from read_y4m(f)
        finally:
            if spec[5:] not in ("", "-"):
                f.close()
    elif spec.startswith("ffmpeg:"):
        cmd = _ffmpeg_cmd(spec[7:], ["-f", "yuv4mpegpipe",
                                     "-pix_fmt", "yuv420p", "-"])
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        try:
            yield from read_y4m(proc.stdout)
            _finish_ffmpeg(proc, spec)
        finally:
            _reap(proc)
    else:
        yield from read_y4m(spec)
