"""dsp/rescale: the video-pipeline plane downscalers (rescale.c/.h)."""

import numpy as np
import pytest

from recur_tpu.dsp.rescale import (
    adaptive_downscale,
    downscale_to_float,
    exact_downscale,
    float_downscale,
    load_pgm,
    skipping_downscale,
)


def checker(h, w, period=2):
    y, x = np.mgrid[:h, :w]
    return (((y // period + x // period) % 2) * 255).astype(np.uint8)


class TestDownscale:
    def test_exact_is_area_average(self):
        src = np.arange(16, dtype=np.uint8).reshape(4, 4)
        out = exact_downscale(src, 2)
        # each 2x2 block's mean, +0.5 rounding
        expect = np.array([[3, 5], [11, 13]], np.uint8)  # means 2.5/4.5/… +0.5
        np.testing.assert_array_equal(out, expect)

    def test_exact_constant_plane_is_identity(self):
        src = np.full((12, 8), 77, np.uint8)
        np.testing.assert_array_equal(exact_downscale(src, 4),
                                      np.full((3, 2), 77, np.uint8))

    def test_exact_truncates_ragged_edges(self):
        src = checker(13, 9)
        out = exact_downscale(src, 4)
        assert out.shape == (3, 2)

    def test_skipping_picks_corners(self):
        src = np.arange(36, dtype=np.uint8).reshape(6, 6)
        out = skipping_downscale(src, 3)
        np.testing.assert_array_equal(out, src[::3, ::3])
        assert out.base is None  # a copy, not a view

    def test_adaptive_switches_strategy(self):
        src = checker(32, 32)
        np.testing.assert_array_equal(adaptive_downscale(src, 2),
                                      exact_downscale(src, 2))
        np.testing.assert_array_equal(adaptive_downscale(src, 8),
                                      skipping_downscale(src, 8))

    def test_downscale_to_float_range(self):
        src = checker(24, 24, period=1)
        out = downscale_to_float(src, 6, 6)
        assert out.shape == (6, 6)
        assert out.dtype == np.float32
        assert 0.0 <= out.min() and out.max() < 1.0
        # period-1 checkerboard averages to 127.5/256 everywhere
        np.testing.assert_allclose(out, 127.5 / 256.0, atol=1e-6)

    def test_downscale_to_float_upscale_guard(self):
        # out size larger than src: factors clamp to 1 (crop semantics)
        src = np.full((4, 4), 128, np.uint8)
        out = downscale_to_float(src, 4, 4)
        np.testing.assert_allclose(out, 0.5)

    def test_float_downscale_preserves_mean(self):
        rng = np.random.default_rng(0)
        src = rng.random((16, 16)).astype(np.float32)
        out = float_downscale(src, 4)
        assert out.shape == (4, 4)
        np.testing.assert_allclose(out.mean(), src.mean(), rtol=1e-5)


class TestLoadPgm:
    def test_round_trip(self, tmp_path):
        src = checker(10, 7)
        p = tmp_path / "t.pgm"
        p.write_bytes(b"P5\n# a comment\n7 10\n255\n" + src.tobytes())
        out = load_pgm(str(p))
        np.testing.assert_array_equal(out, src)

    def test_rejects_ascii_pgm(self, tmp_path):
        p = tmp_path / "t.pgm"
        p.write_bytes(b"P2\n2 2\n255\n0 1 2 3\n")
        with pytest.raises(ValueError):
            load_pgm(str(p))


def test_downscale_to_float_small_source_resamples():
    # sources smaller than the target grid are nearest-resampled, not cropped
    from recur_tpu.dsp.rescale import downscale_to_float
    src = np.arange(12, dtype=np.uint8).reshape(3, 4) * 20
    out = downscale_to_float(src, 6, 8)
    assert out.shape == (6, 8)
    assert abs(out[0, 0] - src[0, 0] / 256.0) < 1e-6
    assert abs(out[-1, -1] - src[-1, -1] / 256.0) < 1e-6
