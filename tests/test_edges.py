"""Edge coverage: parrot streaming continuity, wav formats, audio window
normalisation, cdb error paths."""

import numpy as np
import pytest

from recur_tpu.audio.parrot import Parrot
from recur_tpu.audio.wavio import read_wav, write_wav
from recur_tpu.utils import cdb
from recur_tpu.video.recur_ctx import RecurContext


class TestParrotStreaming:
    def test_chunked_equals_training_continuity(self):
        """Feeding one long buffer vs many small chunks must produce the
        same number of trained frames (tail/coeff carry)."""
        p1 = Parrot(n_channels=1, hidden_size=17, window_size=64, rng_seed=5)
        p2 = Parrot(n_channels=1, hidden_size=17, window_size=64, rng_seed=5)
        rng = np.random.default_rng(0)
        pcm = rng.normal(0, 5000, 64 * 40).astype(np.float32)
        p1.train(pcm[None])
        i = 0
        for size in (100, 700, 333, 1000, 64 * 40):
            seg = pcm[i:i + size]
            if len(seg) == 0:
                break
            p2.train(seg[None])
            i += size
        # generations only differ by boundary frames (at most a window's
        # worth per chunk boundary)
        assert abs(p1.generation - p2.generation) <= 8, \
            (p1.generation, p2.generation)

    def test_tiny_feed_returns_nan(self):
        p = Parrot(n_channels=1, hidden_size=9, window_size=64)
        assert np.isnan(p.train(np.zeros((1, 30), np.float32)))


class TestWavFormats:
    def test_8bit_and_stereo(self, tmp_path):
        import wave
        path = str(tmp_path / "w8.wav")
        with wave.open(path, "wb") as w:
            w.setnchannels(2)
            w.setsampwidth(1)
            w.setframerate(8000)
            data = (np.sin(np.arange(2000) * 0.05) * 100 + 128).astype(np.uint8)
            inter = np.repeat(data, 2)
            w.writeframes(inter.tobytes())
        mono, rate = read_wav(path)
        assert rate == 8000 and len(mono) == 2000
        both, _ = read_wav(path, mono=False)
        assert both.shape == (2, 2000)

    def test_stereo_write(self, tmp_path):
        path = str(tmp_path / "st.wav")
        pcm = np.stack([np.ones(100) * 1000, -np.ones(100) * 1000])
        write_wav(path, pcm, 8000)
        back, _ = read_wav(path, mono=False)
        assert back.shape == (2, 100)
        assert back[0, 0] == 1000 and back[1, 0] == -1000


class TestRecurAudio:
    def test_audio_window_normalisation(self):
        ctx = RecurContext(rng_seed=1)
        loud = (np.sin(np.arange(1024) * 0.3) * 20000).astype(np.float32)
        ctx.set_audio_window(loud)
        a_loud = ctx.current_audio.copy()
        ctx.set_audio_window(loud * 0.01)
        a_quiet = ctx.current_audio.copy()
        assert np.isfinite(a_loud).all() and np.isfinite(a_quiet).all()
        # short windows are padded, not crashed
        ctx.set_audio_window(loud[:100])
        assert np.isfinite(ctx.current_audio).all()


class TestCdbEdges:
    def test_write_failure_cleans_tmp(self, tmp_path):
        w = cdb.Writer()
        w.add(b"k", b"v")
        bad = tmp_path / "nodir" / "x.cdb"
        with pytest.raises(FileNotFoundError):
            w.write(str(bad))
        # no stray tmp files in the (existing) parent
        assert not [p for p in tmp_path.iterdir()
                    if p.name.startswith("tmp_net_")]

    def test_reader_rejects_short(self):
        with pytest.raises(ValueError):
            cdb.Reader(b"too short")
