"""End-to-end classify-train flow on synthetic WAVs (the `make classify`
integration test of the reference, without GStreamer)."""

import os

import numpy as np
import pytest

from recur_tpu.audio.classify import AudioClassifier
from recur_tpu.audio.trainer import (LabelledFile, Trainer,
                                     class_from_filename,
                                     estimate_feature_normalisation)
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
    tr = Trainer(clf, train, test, seed=2, verbose=False,
                 files_per_epoch=len(train))
    r = tr.run(cycles=3)
    assert r["windows"] > 100
    assert r["auc"] > 0.8, r
    assert r["accuracy"] > 0.8, r
    # true mean XE (Welford of -log2 p_target): finite, and a learnable
    # 2-class task must beat the 1-bit prior
    assert 0.0 < r["xe_bits"] < 1.0, r["xe_bits"]
    # record nets were saved
    best = [f for f in os.listdir(tmp_path) if "best-" in f]
    assert best, os.listdir(tmp_path)


def make_group_wavs(d, n_per_class=4, seconds=1.5):
    """3-class x 2-group corpus with orthogonal cues: group 0 = base tone
    band (M/k/w), group 1 = presence of a 3.6kHz marker tone (A/b)."""
    rng = np.random.default_rng(1)
    bands = {"M": (300, 500), "k": (900, 1300), "w": (2200, 3200)}
    markers = {"A": 1500.0, "b": 0.0}
    files = []
    for i in range(n_per_class):
        for c0, band in bands.items():
            for c1, amp in markers.items():
                t = np.arange(int(RATE * seconds)) / RATE
                f = rng.uniform(*band)
                pcm = (3000 * np.sin(2 * np.pi * f * t)
                       + amp * np.sin(2 * np.pi * 3600.0 * t)
                       + rng.normal(0, 300, len(t)))
                path = os.path.join(d, f"{c0}{c1}-{i}.wav")
                write_wav(path, pcm, RATE)
                files.append(LabelledFile(path, c0 + c1))
    return files


def test_trainer_multigroup(tmp_path):
    """3-class + 2-class independent groups: per-group AUC/accuracy must
    both be learnable and reported (VERDICT round-1 item 4)."""
    files = make_group_wavs(str(tmp_path))
    rng = np.random.default_rng(3)
    rng.shuffle(files)
    train, test = files[:18], files[18:]
    clf = AudioClassifier(classes="Mkw,Ab", n_channels=3, window_size=256,
                          hidden_size=63, learn_rate=0.0001, rng_seed=5,
                          net_filename=str(tmp_path / "net.net"))
    estimate_feature_normalisation(clf, train[:6])
    tr = Trainer(clf, train, test, seed=4, verbose=False,
                 files_per_epoch=len(train), lr_decay=0.95)
    r = tr.run(cycles=4)
    assert len(r["groups"]) == 2
    g0, g1 = r["groups"]
    # group 0 is 3-class: per-class AUC lists exist for all three
    assert set(g0["classes"]) == {"M", "k", "w"}
    assert set(g1["classes"]) == {"A", "b"}
    assert g0["auc"] > 0.75, r
    assert g1["auc"] > 0.75, r
    for cls in ("M", "k", "w"):
        assert "auc" in g0["classes"][cls]
    # the aggregate d' covers every group, not just group 0
    assert r["dprime"] == pytest.approx(
        (g0["dprime"] + g1["dprime"]) / 2)


def test_trainer_full_length_unequal_files(tmp_path):
    """Unequal-length files must train to their full lengths (the round-1
    loader truncated each batch to its shortest file)."""
    rng = np.random.default_rng(0)
    files = []
    secs = [0.5, 2.0, 1.0, 3.0]
    for i, s in enumerate(secs):
        t = np.arange(int(RATE * s)) / RATE
        cls = "Mx"[i % 2]
        f = (400, 2000)[i % 2]
        pcm = 4000 * np.sin(2 * np.pi * f * t) + rng.normal(0, 300, len(t))
        path = os.path.join(str(tmp_path), f"{cls}-{i}.wav")
        write_wav(path, pcm, RATE)
        files.append(LabelledFile(path, cls))
    clf = AudioClassifier(classes="Mx", n_channels=2, window_size=256,
                          hidden_size=15, learn_rate=0.0001, rng_seed=1,
                          net_filename=str(tmp_path / "net.net"))
    tr = Trainer(clf, files, files, seed=1, verbose=False,
                 files_per_epoch=len(files))
    gen0 = clf.generation
    tr.train_epoch()
    half = clf.window_size // 2
    total_samples = sum(int(RATE * s) for s in secs)
    # windows actually trained (generation counts every scanned window,
    # including block padding; trained windows come from the stats log) —
    # at minimum, the full audio must have been *scanned*: the per-channel
    # plans cover every sample, so windows >= total_samples / half
    scanned = (clf.generation - gen0) * clf.n_channels
    assert scanned * half >= total_samples, (scanned, total_samples)
    # and much more than the truncating loader would have seen:
    # old behaviour = 2 batches x min-length -> (0.5s + 1.0s) x 2 channels
    truncated_windows = int((0.5 + 1.0) * RATE / half) * 2
    assert scanned > truncated_windows * 1.5, (scanned, truncated_windows)


def test_activity_bias_stream_duplication(tmp_path):
    """--activity-bias adds streams of only the timed-active files, biasing
    the eternal shuffler toward them (classify-train:127-134)."""
    clf = AudioClassifier(classes="Mx", n_channels=2, window_size=256,
                          hidden_size=9, net_filename=str(tmp_path / "n.net"))
    files = [LabelledFile(f"/nowhere/{c}-{i}.wav", c)
             for i in range(10) for c in "Mx"]
    # two files have >1 timed events ("active"); the rest have none
    timings = {files[0].path: [(0, "M", 0.0, "c%dt0:M"),
                               (0, "x", 3.0, "c%dt3:x")],
               files[1].path: [(0, "x", 0.0, "c%dt0:x"),
                               (0, "M", 2.0, "c%dt2:M")]}
    active = {files[0].path, files[1].path}

    base = Trainer(clf, files, [], seed=3, verbose=False)
    draws = [next(base.trainers).path for _ in range(600)]
    frac_plain = sum(d in active for d in draws) / len(draws)

    biased = Trainer(clf, files, [], seed=3, verbose=False,
                     timings=timings, activity_bias=2)
    draws = [next(biased.trainers).path for _ in range(600)]
    frac_biased = sum(d in active for d in draws) / len(draws)

    assert abs(frac_plain - 0.1) < 0.06, frac_plain
    # 3 streams, 2 of them all-active: expectation ~ (0.1 + 1 + 1) / 3 = 0.7
    assert frac_biased > 0.5, frac_biased


def test_loader_thread_propagates_errors(tmp_path):
    """IO errors in the background loader surface in the caller, not as a
    silent dead thread."""
    clf = AudioClassifier(classes="Mx", n_channels=1, window_size=256,
                          hidden_size=9, net_filename=str(tmp_path / "n.net"))
    tr = Trainer(clf, [LabelledFile("/nowhere/missing.wav", "M")], [],
                 seed=1, verbose=False)
    with pytest.raises(FileNotFoundError):
        tr.train_epoch()


def test_eternal_alternator_round_robin():
    """eternal_alternator cycles streams in order (classify.py:165-171 —
    the reference applies it to its test-set cycles)."""
    from recur_tpu.audio.trainer import eternal_alternator
    a = [LabelledFile("a1", "M"), LabelledFile("a2", "M")]
    b = [LabelledFile("b1", "x")]
    it = eternal_alternator([a, b, []])
    got = [next(it).path for _ in range(6)]
    assert got == ["a1", "b1", "a2", "b1", "a1", "b1"]


def test_prefetch_consumer_abort_releases_producer(tmp_path):
    """If the consumer stops mid-stream, the producer thread must exit
    rather than block forever in q.put holding PCM blocks."""
    import threading
    import time as _time
    from recur_tpu.audio.trainer import _prefetch

    started = threading.Event()

    def gen():
        for i in range(1000):
            started.set()
            yield i

    it = _prefetch(gen(), depth=2)
    assert next(it) == 0
    started.wait(5)
    n0 = threading.active_count()
    it.close()                     # consumer aborts
    deadline = _time.time() + 5
    while threading.active_count() > n0 - 1 and _time.time() < deadline:
        _time.sleep(0.05)
    assert threading.active_count() <= n0 - 1, "producer thread leaked"


def test_feature_normalisation_idempotent_and_empty(tmp_path):
    """Re-estimation must measure RAW features (not compound with the
    previously installed normalisation), and an unusable sample must raise
    a clear error instead of np.concatenate's."""
    files = make_wavs(str(tmp_path), n_per_class=2, seconds=1)
    clf = AudioClassifier(classes="Mx", n_channels=2, window_size=256,
                          hidden_size=9, net_filename=str(tmp_path / "n.net"))
    mu1, sc1 = estimate_feature_normalisation(clf, files[:3])
    mu2, sc2 = estimate_feature_normalisation(clf, files[:3])
    np.testing.assert_allclose(mu1, mu2, rtol=1e-5)
    np.testing.assert_allclose(sc1, sc2, rtol=1e-5)
    # too-short sample -> explicit error
    short = str(tmp_path / "Mshort.wav")
    write_wav(short, np.zeros(8, np.float32), RATE)
    with pytest.raises(ValueError, match="no usable audio"):
        estimate_feature_normalisation(clf, [LabelledFile(short, "M")])
