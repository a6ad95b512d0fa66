"""End-to-end classify-train flow on synthetic WAVs (the `make classify`
integration test of the reference, without GStreamer)."""

import os

import numpy as np
import pytest

from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.trainer import LabelledFile, Trainer, class_from_filename
from recur_tpu.audio.wavio import read_wav, write_wav

RATE = 8000


def make_wavs(d, n_per_class=6, seconds=2):
    rng = np.random.default_rng(0)
    files = []
    for i in range(n_per_class):
        for cls, freqs in (("M", (400, 700)), ("x", (1800, 3100))):
            t = np.arange(RATE * seconds) / RATE
            f = rng.uniform(*freqs)
            pcm = (4000 * np.sin(2 * np.pi * f * t)
                   + rng.normal(0, 500, len(t)))
            path = os.path.join(d, f"{cls}-{i}.wav")
            write_wav(path, pcm, RATE)
            files.append(LabelledFile(path, cls))
    return files


def test_wav_roundtrip(tmp_path):
    pcm = (np.sin(np.arange(4000) * 0.1) * 10000).astype(np.float32)
    p = str(tmp_path / "t.wav")
    write_wav(p, pcm, RATE)
    back, rate = read_wav(p)
    assert rate == RATE
    np.testing.assert_allclose(back, np.round(pcm), atol=1.0)
    # resampling path
    back2, rate2 = read_wav(p, target_rate=16000)
    assert rate2 == 16000
    assert abs(len(back2) - 8000) <= 2


def test_class_from_filename():
    assert class_from_filename("/a/b/Mfoo.wav") == "M"


def test_trainer_end_to_end(tmp_path):
    files = make_wavs(str(tmp_path))
    train = files[:8]
    test = files[8:]
    clf = AudioClassifier(classes="Mx", n_channels=2, window_size=256,
                          hidden_size=39, learn_rate=0.0001, rng_seed=7,
                          net_filename=str(tmp_path / "net.net"),
                          log_file=str(tmp_path / "c.log"))
    tr = Trainer(clf, train, test, seed=2, verbose=False)
    r0 = tr.test_epoch()
    r = tr.run(cycles=3)
    assert r["windows"] > 100
    assert r["auc"] > max(r0.get("auc", 0.5), 0.8), (r0, r)
    # record nets were saved
    best = [f for f in os.listdir(tmp_path) if "best-" in f]
    assert best, os.listdir(tmp_path)
