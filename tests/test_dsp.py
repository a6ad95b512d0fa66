"""DSP golden-property tests, following the reference's test intent:
test_dct.c (DCT/IDCT identity), test_mdct.c (perfect reconstruction),
test_window_functions.c (window identities), test_mfcc_bins.c (bin
coverage)."""

import numpy as np
import pytest

import jax.numpy as jnp

from recur_tpu.dsp.windows import WindowType, window_mask
from recur_tpu.dsp.mfcc import (
    AudioBinner, bin_slopes, dct_matrix, filterbank_matrix, hz_to_mel,
    idct_matrix, mel_to_hz)
from recur_tpu.dsp.mdct import MDCT, frame_pcm


class TestWindows:
    def test_princen_bradley(self):
        """MP3/Vorbis windows satisfy w[i]^2 + w[i+N/2]^2 == 1 (the TDAC
        condition MDCT reconstruction relies on)."""
        for wt in (WindowType.MP3, WindowType.VORBIS):
            w = window_mask(256, wt).astype(np.float64)
            s = w[:128] ** 2 + w[128:] ** 2
            np.testing.assert_allclose(s, 1.0, atol=1e-6)

    def test_hann_endpoints(self):
        w = window_mask(64, WindowType.HANN)
        assert w[0] == 0.0
        assert abs(w[32] - 1.0) < 1e-6

    def test_none_scale(self):
        w = window_mask(16, WindowType.NONE, scale=2.5)
        np.testing.assert_allclose(w, 2.5)


class TestDct:
    def test_dct_idct_roundtrip(self):
        rng = np.random.default_rng(0)
        x = rng.normal(size=32).astype(np.float32)
        D = dct_matrix(32)
        I = idct_matrix(32)
        y = x @ D
        x2 = y @ I
        np.testing.assert_allclose(x2, x, atol=1e-4)

    def test_dct_matches_naive(self):
        """Matrix DCT == the reference formula evaluated directly."""
        rng = np.random.default_rng(1)
        n = 20
        x = rng.normal(size=n)
        want = np.zeros(n)
        for j in range(n):
            want[j] = sum(x[k] * np.cos(np.pi / n * j * (k + 0.5))
                          for k in range(n))
        want[0] *= 0.7071067811865476
        got = x.astype(np.float32) @ dct_matrix(n)
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


class TestMelScale:
    def test_mel_roundtrip(self):
        for focus in (0.0, 1000.0):
            for hz in (100.0, 440.0, 3000.0):
                mel = hz_to_mel(hz, 700.0, focus)
                hz2 = mel_to_hz(mel, 700.0, focus)
                assert abs(hz2 - hz) / hz < 1e-2, (hz, hz2, focus)

    def test_slopes_monotonic(self):
        slopes = bin_slopes(20, 128, 100.0, 4000.0, 700.0, 0.0, 8000.0)
        rights = [s.right + s.right_fraction for s in slopes]
        assert all(b > a for a, b in zip(rights, rights[1:]))


class TestFilterbank:
    def test_unit_coverage(self):
        """Interior FFT bins are shared between adjacent triangles with total
        weight 1 (the dump check in mfcc.c:204-264)."""
        n_bins, fft_len = 20, 128
        W = filterbank_matrix(n_bins, fft_len, 100.0, 3900.0, 700.0, 0.0,
                              8000.0)
        slopes = bin_slopes(n_bins, fft_len, 100.0, 3900.0, 700.0, 0.0,
                            8000.0)
        lo = slopes[0].right + 1
        hi = slopes[-1].left - 1
        cover = W.sum(axis=1)[lo:hi]
        np.testing.assert_allclose(cover, 1.0, atol=1e-3)

    def test_binner_shapes_and_finite(self):
        ab = AudioBinner(256, WindowType.HANN, 20, 20.0, 3900.0, 700.0, 0.0,
                         8000.0, value_size=2)
        pcm = jnp.asarray(np.random.default_rng(3).normal(
            size=(5, 256)).astype(np.float32))
        bins = ab.log_freq_bins(pcm)
        assert bins.shape == (5, 20)
        assert np.isfinite(np.asarray(bins)).all()
        mf = ab.mfccs(pcm)
        assert mf.shape == (5, 20)
        # pure tone peaks in the right place
        t = np.arange(256) / 8000.0
        tone = np.sin(2 * np.pi * 1000.0 * t).astype(np.float32)
        b1 = np.asarray(ab.log_freq_bins(jnp.asarray(tone[None])))[0]
        tone2 = np.sin(2 * np.pi * 3000.0 * t).astype(np.float32)
        b2 = np.asarray(ab.log_freq_bins(jnp.asarray(tone2[None])))[0]
        assert np.argmax(b1) < np.argmax(b2)


class TestMdct:
    def test_perfect_reconstruction(self):
        """50% overlap-add of inverse(forward(x)) reproduces the interior of
        x (test_mdct.c's TDAC check)."""
        m = MDCT(64, WindowType.VORBIS)
        rng = np.random.default_rng(5)
        pcm = rng.normal(size=64 * 10).astype(np.float32)
        frames = jnp.asarray(frame_pcm(pcm, 64))
        coeffs = m.forward(frames)
        recon_frames = m.backward(coeffs)
        out = np.asarray(m.overlap_add(np.asarray(recon_frames)))
        # interior (skip the first/last half-window transients)
        a = pcm[32:-64]
        b = out[32:len(a) + 32]
        np.testing.assert_allclose(b, a, atol=2e-4)

    def test_frame_pcm(self):
        pcm = np.arange(128, dtype=np.float32)
        f = frame_pcm(pcm, 64)
        assert f.shape == (3, 64)
        assert f[1, 0] == 32.0
