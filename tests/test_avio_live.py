"""Live-capture avio schemes (alsa:, v4l2:) driven end-to-end with stub
capture binaries on PATH — the strongest demonstration an image with no
kernel sound/video support allows (artifacts/live_capture/probe.json).

The stubs speak the real wire formats: raw interleaved s16le for arecord,
YUV4MPEG2 for ffmpeg's v4l2 grab — so everything downstream of the
subprocess boundary (block framing, channel deinterleave, y4m parse) is
the production path.
"""

import os
import stat

import numpy as np
import pytest

from recur_tpu.utils import avio


def _stub(tmp_path, monkeypatch, name, script):
    d = tmp_path / "bin"
    d.mkdir(exist_ok=True)
    p = d / name
    p.write_text(script)
    p.chmod(p.stat().st_mode | stat.S_IEXEC)
    monkeypatch.setenv("PATH", f"{d}:{os.environ['PATH']}")
    return p


def test_alsa_scheme_streams_s16(tmp_path, monkeypatch):
    # a deterministic "microphone": 2-channel interleaved ramp
    n = 5000
    inter = np.arange(2 * n, dtype="<i2") % 3000
    raw = tmp_path / "mic.raw"
    raw.write_bytes(inter.tobytes())
    _stub(tmp_path, monkeypatch, "arecord",
          f"#!/bin/sh\n"
          f'[ "$1" = "-q" ] || exit 9\n'
          f"cat {raw}\n")
    blocks = list(avio.audio_blocks("alsa:default", rate=8000, channels=2,
                                    block_samples=1024))
    got = np.concatenate(blocks, axis=1)
    assert got.shape == (2, n)
    want = inter.astype(np.float32).reshape(n, 2).T
    np.testing.assert_array_equal(got, want)


def test_alsa_scheme_device_and_rate_in_cmd(tmp_path, monkeypatch):
    # the stub checks the exact arecord invocation the seam promises
    _stub(tmp_path, monkeypatch, "arecord",
          '#!/bin/sh\n'
          'test "$*" = "-q -D hw:1,0 -f S16_LE -r 16000 -c 1 -t raw -" '
          '|| exit 7\n'
          'printf "\\001\\000\\002\\000"\n')
    blocks = list(avio.audio_blocks("alsa:hw:1,0", rate=16000, channels=1,
                                    block_samples=4))
    assert np.concatenate(blocks, axis=1).tolist() == [[1.0, 2.0]]


def test_alsa_scheme_failure_exit_raises(tmp_path, monkeypatch):
    _stub(tmp_path, monkeypatch, "arecord", "#!/bin/sh\nexit 3\n")
    with pytest.raises(RuntimeError, match="arecord failed"):
        list(avio.audio_blocks("alsa:default", rate=8000, channels=1))


def test_alsa_scheme_missing_userland_message(tmp_path, monkeypatch):
    monkeypatch.setenv("PATH", str(tmp_path / "empty"))
    with pytest.raises(RuntimeError, match="probe.json"):
        list(avio.audio_blocks("alsa:default", rate=8000, channels=1))


def test_v4l2_scheme_streams_y4m(tmp_path, monkeypatch):
    w, h = 8, 6
    y = bytes(range(48))
    cb = bytes(12)
    cr = bytes([255] * 12)
    y4m = (b"YUV4MPEG2 W8 H6 F25:1 Ip A1:1 C420\n"
           + b"FRAME\n" + y + cb + cr
           + b"FRAME\n" + y + cb + cr)
    raw = tmp_path / "cam.y4m"
    raw.write_bytes(y4m)
    _stub(tmp_path, monkeypatch, "ffmpeg",
          f"#!/bin/sh\n"
          f'echo "$*" > {tmp_path}/argv\n'
          f"cat {raw}\n")
    frames = list(avio.video_frames("v4l2:/dev/video0"))
    assert len(frames) == 2
    assert frames[0].shape[1:] == (h, w)
    assert frames[0][0].flatten().tolist() == list(range(48))
    argv = (tmp_path / "argv").read_text()
    # the v4l2 input format must precede -i (ffmpeg input option order)
    assert "-f v4l2 -i /dev/video0" in argv
