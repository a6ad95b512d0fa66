"""Terminal video rendering (utils/termview.py): colour conversion and
half-block ANSI generation."""

import io

import numpy as np

from recur_tpu.utils.termview import (TermViewer, frame_to_ansi,
                                      ycbcr_to_rgb)


def test_ycbcr_roundtrip_grey():
    f = np.zeros((3, 4, 6), np.uint8)
    f[0] = 128
    f[1] = 128
    f[2] = 128
    rgb = ycbcr_to_rgb(f)
    assert rgb.shape == (4, 6, 3)
    assert np.all(np.abs(rgb.astype(int) - 128) <= 1)


def test_ycbcr_red():
    # pure red in BT.601: Y=76, Cb=84, Cr=255
    f = np.zeros((3, 2, 2), np.uint8)
    f[0] = 76
    f[1] = 84
    f[2] = 255
    rgb = ycbcr_to_rgb(f)
    r, g, b = rgb[0, 0]
    assert r > 220 and g < 40 and b < 40, rgb[0, 0]


def test_frame_to_ansi_shape():
    rgb = np.zeros((4, 3, 3), np.uint8)
    rgb[0, :, 0] = 255            # top row red
    s = frame_to_ansi(rgb)
    rows = s.split("\n")
    assert len(rows) == 2                      # 4 pixel rows -> 2 cell rows
    assert rows[0].count("▀") == 3
    assert "\x1b[38;2;255;0;0m" in rows[0]     # red foreground (top pixel)
    assert "\x1b[48;2;0;0;0m" in rows[0]       # black background (bottom)


def test_frame_to_ansi_downscale():
    rgb = np.zeros((8, 10, 3), np.uint8)
    s = frame_to_ansi(rgb, max_width=5)
    assert s.split("\n")[0].count("▀") == 5


def test_viewer_writes_frames():
    buf = io.StringIO()
    frame = np.zeros((3, 4, 4), np.uint8)
    frame[0] = 200
    with TermViewer(fps=0, out=buf) as tv:
        tv.show(frame, caption="gen 1")
        tv.show(frame)
    out = buf.getvalue()
    assert out.count("\x1b[H") == 2            # two in-place updates
    assert "gen 1" in out
    assert out.endswith("\x1b[?25h\n")         # cursor restored
