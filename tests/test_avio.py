"""The input-adapter seam (utils/avio.py): one source-spec grammar for
audio/video — WAV/Y4M files, raw FIFO pipes, gated ffmpeg decode.  The
live-input answer to classify-gtk's microphone and gtk-recur's webcam
(SURVEY §2.7): external plumbing writes a pipe, the harness reads it."""

import os
import threading

import numpy as np
import pytest

from recur_tpu.utils import avio
from recur_tpu.audio.wavio import write_wav
from recur_tpu.utils.video_io import write_y4m


def tone(rate, secs, hz, amp=8000.0):
    t = np.arange(int(rate * secs)) / rate
    return (np.sin(2 * np.pi * hz * t) * amp).astype(np.float32)


class TestAudioSpecs:
    def test_wav_file_spec(self, tmp_path):
        p = str(tmp_path / "t.wav")
        pcm = tone(8000, 0.5, 440)
        write_wav(p, pcm, 8000)
        out = avio.read_audio(p, 8000)
        assert out.shape == pcm.shape
        np.testing.assert_allclose(out, np.round(pcm), atol=1.0)

    def test_pipe_fifo_streams_s16(self, tmp_path):
        fifo = str(tmp_path / "a.fifo")
        os.mkfifo(fifo)
        pcm = np.round(tone(8000, 0.3, 300)).astype(np.int16)

        def writer():
            with open(fifo, "wb") as f:
                # dribble in odd-sized chunks to exercise short reads
                b = pcm.tobytes()
                for i in range(0, len(b), 1111):
                    f.write(b[i:i + 1111])

        th = threading.Thread(target=writer)
        th.start()
        blocks = list(avio.audio_blocks(f"pipe:{fifo}", 8000, channels=1,
                                        block_samples=1000))
        th.join()
        out = np.concatenate(blocks, axis=1)[0]
        np.testing.assert_array_equal(out, pcm.astype(np.float32))
        assert all(b.shape[0] == 1 for b in blocks)

    def test_pipe_multichannel_deinterleave(self, tmp_path):
        fifo = str(tmp_path / "b.fifo")
        os.mkfifo(fifo)
        # channel 0 = 1,2,3..., channel 1 = negatives, interleaved
        c0 = np.arange(1, 501, dtype=np.int16)
        inter = np.empty(1000, np.int16)
        inter[0::2] = c0
        inter[1::2] = -c0
        th = threading.Thread(
            target=lambda: open(fifo, "wb").write(inter.tobytes()))
        th.start()
        out = avio.read_audio(f"pipe:{fifo}", 8000, channels=2)
        th.join()
        assert out.shape == (2, 500)
        np.testing.assert_array_equal(out[0], c0.astype(np.float32))
        np.testing.assert_array_equal(out[1], -c0.astype(np.float32))

    def test_ffmpeg_spec_fails_clearly_without_binary(self):
        import shutil
        if shutil.which("ffmpeg"):
            pytest.skip("ffmpeg present")
        with pytest.raises(RuntimeError, match="pipe:"):
            list(avio.audio_blocks("ffmpeg:x.mp3", 8000))


class TestVideoSpecs:
    def _frames(self, n=5, h=16, w=32):
        rng = np.random.RandomState(0)
        return [rng.randint(0, 255, (3, h, w), dtype=np.uint8)
                for _ in range(n)]

    def test_y4m_file_spec(self, tmp_path):
        p = str(tmp_path / "v.y4m")
        frames = self._frames()
        write_y4m(p, frames, 32, 16)
        out = list(avio.video_frames(p))
        assert len(out) == 5
        np.testing.assert_array_equal(out[0][0], frames[0][0])  # Y exact

    def test_y4m_over_fifo(self, tmp_path):
        frames = self._frames()
        ref = str(tmp_path / "v.y4m")
        write_y4m(ref, frames, 32, 16)
        fifo = str(tmp_path / "v.fifo")
        os.mkfifo(fifo)

        def writer():
            data = open(ref, "rb").read()
            with open(fifo, "wb") as f:
                for i in range(0, len(data), 777):   # short writes
                    f.write(data[i:i + 777])

        th = threading.Thread(target=writer)
        th.start()
        out = list(avio.video_frames(f"pipe:{fifo}"))
        th.join()
        assert len(out) == 5
        for a, b in zip(out, list(avio.video_frames(ref))):
            np.testing.assert_array_equal(a, b)


class TestEndToEndOverFifo:
    def test_classify_monitor_reads_live_fifo(self, tmp_path, capsys,
                                              monkeypatch):
        """The round-3 'live input' requirement: classify-monitor driven
        end-to-end by a synthetic FIFO (VERDICT missing #3)."""
        monkeypatch.chdir(tmp_path)
        from recur_tpu.audio.classify import AudioClassifier
        from recur_tpu.cli import classify_monitor
        net_path = str(tmp_path / "m.net")
        AudioClassifier(classes="ab", n_channels=1, hidden_size=9,
                        net_filename=net_path).save()
        fifo = str(tmp_path / "live.fifo")
        os.mkfifo(fifo)
        pcm = np.round(tone(8000, 2.0, 500)).astype(np.int16)
        th = threading.Thread(
            target=lambda: open(fifo, "wb").write(pcm.tobytes()))
        th.start()
        rc = classify_monitor.main([f"pipe:{fifo}", "-f", net_path,
                                    "-c", "ab"])
        th.join()
        assert rc == 0
        lines = capsys.readouterr().out.splitlines()
        assert len(lines) >= 3           # header + live rows
        assert any("a" in ln or "b" in ln for ln in lines[1:])

    def test_rnnca_player_trains_from_fifo(self, tmp_path, monkeypatch):
        monkeypatch.chdir(tmp_path)
        from recur_tpu.cli import rnnca_player
        frames = [np.full((3, 24, 36), v, np.uint8)
                  for v in (40, 80, 120, 160)]
        ref = str(tmp_path / "in.y4m")
        write_y4m(ref, frames, 36, 24)
        fifo = str(tmp_path / "video.fifo")
        os.mkfifo(fifo)
        th = threading.Thread(
            target=lambda: open(fifo, "wb").write(open(ref, "rb").read()))
        th.start()
        rc = rnnca_player.main(["--train-video", f"pipe:{fifo}",
                                "--hidden-size", "19", "--frames", "2",
                                "--out", str(tmp_path / "out.y4m"),
                                "--net-filename", str(tmp_path / "ca.net"),
                                "-q"])
        th.join()
        assert rc == 0
        assert os.path.exists(tmp_path / "out.y4m")
