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
  "alsa:DEV"     live microphone                    the stream itself)
                 via ALSA userland   "v4l2:DEV"    live webcam via
  "ffmpeg:SRC"   ffmpeg decode of                   ffmpeg's v4l2 input
                 anything ffmpeg                    (gtk-recur.c's v4l2src)
                 can open (file, URL, device)

`pipe:` turns live input into plumbing: `arecord -f S16_LE -r 8000 > fifo`
or `ffmpeg ... -f s16le - > fifo` on any machine with devices, while the
harness reads `pipe:fifo`.  `alsa:` spawns that arecord itself — the
classify-gtk microphone path (classify.py:63-96 alsasrc) with no FIFO to
arrange; `v4l2:` likewise wraps ffmpeg's v4l2 grabber.  `ffmpeg:` spawns
ffmpeg directly when the binary exists.  None of the live schemes can be
exercised in this image — it has no sound/video devices at the KERNEL
level (no /dev/snd, no /proc/asound, no /dev/video*) and no capture
userland (no libasound/arecord/ffmpeg): the committed probe record is
artifacts/live_capture/probe.json, and the schemes fail with errors that
say exactly this.  The code paths themselves are end-to-end tested with a
stub arecord/ffmpeg on PATH (tests/test_avio_live.py).
"""

from __future__ import annotations

import os
import shutil
import subprocess
from typing import Iterator, Optional

import numpy as np

from recur_tpu.audio.wavio import read_wav
from recur_tpu.utils.video_io import read_y4m, _read_exact


def _ffmpeg_cmd(src: str, out_args: list[str],
                in_args: Optional[list[str]] = None) -> list[str]:
    path = shutil.which("ffmpeg")
    if not path:
        raise RuntimeError(
            "ffmpeg: source specs need an ffmpeg binary, which this "
            "environment lacks; decode externally into a FIFO and use "
            "pipe:<path> instead (e.g. `ffmpeg -i SRC -f s16le -ar 8000 "
            "-ac 1 - > fifo` on a machine that has it)")
    return ([path, "-nostdin", "-loglevel", "error"] + (in_args or [])
            + ["-i", src] + out_args)


def _arecord_cmd(device: str, rate: int, channels: int) -> list[str]:
    """Live microphone capture: the reference's classify-gtk/alsasrc path
    (classify.py:63-96) as a raw-s16 subprocess stream."""
    path = shutil.which("arecord")
    if not path:
        raise RuntimeError(
            "alsa: source specs need ALSA userland (arecord), and this "
            "environment has no audio stack at all — no /dev/snd, no "
            "/proc/asound, no libasound (committed probe: "
            "artifacts/live_capture/probe.json).  On a machine with a "
            "microphone the same spec works as-is, or pipe externally: "
            "`arecord -f S16_LE -r 8000 -t raw > fifo` + pipe:<fifo>")
    return [path, "-q", "-D", device or "default", "-f", "S16_LE",
            "-r", str(rate), "-c", str(channels), "-t", "raw", "-"]


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
    elif spec.startswith("alsa:"):
        cmd = _arecord_cmd(spec[5:], rate, channels)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        try:
            yield from _s16_blocks(proc.stdout, channels, block_samples)
            # live capture normally ends by the CONSUMER closing the
            # generator (finally → _reap); reaching EOF means arecord
            # itself stopped — surface a failure exit
            rc = proc.wait()
            if rc != 0:
                raise RuntimeError(
                    f"arecord failed (exit {rc}) capturing {spec!r}")
        finally:
            _reap(proc)
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
    elif spec.startswith(("ffmpeg:", "v4l2:")):
        # v4l2:/dev/video0 = gtk-recur.c's v4l2src webcam path, via
        # ffmpeg's v4l2 grabber (needs the input format BEFORE -i)
        live = spec.startswith("v4l2:")
        src = spec.split(":", 1)[1]
        cmd = _ffmpeg_cmd(src or "/dev/video0",
                          ["-f", "yuv4mpegpipe", "-pix_fmt", "yuv420p",
                           "-"],
                          in_args=["-f", "v4l2"] if live else None)
        proc = subprocess.Popen(cmd, stdout=subprocess.PIPE)
        try:
            yield from read_y4m(proc.stdout)
            _finish_ffmpeg(proc, spec)
        finally:
            _reap(proc)
    else:
        yield from read_y4m(spec)
