"""Audio classification harness: target parsing, streaming, learning, stats."""

import numpy as np
import pytest

from recur_tpu.audio.classify import (
    AudioClassifier, ClassEvent, parse_classes_string, parse_target_string,
    targets_for_windows)
from recur_tpu.audio import stats

RATE = 8000


class TestParsing:
    def test_groups(self):
        gs = parse_classes_string("Mm,Kk,Wx")
        assert [g.classes for g in gs] == ["Mm", "Kk", "Wx"]
        assert [g.offset for g in gs] == [0, 2, 4]

    def test_target_string(self):
        gs = parse_classes_string("Mm,Kk,Wx")
        evs = parse_target_string("c0t2.3:mkW c0t4.1:m-x c1t0:Mkx",
                                  gs, 2, 256)
        # c0t4.1:m-x → m (group 0), '-' (group 1 → -1), x (group 2)
        assert ClassEvent(window_no=int(4.1 * RATE * 2 / 256 + 0.5),
                          channel=0, group=1, target=-1) in evs
        assert all(0 <= e.channel < 2 for e in evs)
        # '=' entries produce no event
        evs2 = parse_target_string("c1t0:=K=", gs, 2, 256)
        assert len(evs2) == 1 and evs2[0].group == 1 and evs2[0].target == 0

    def test_target_string_errors(self):
        gs = parse_classes_string("Mm")
        with pytest.raises(ValueError):
            parse_target_string("c5t0:M", gs, 2, 256)   # bad channel
        with pytest.raises(ValueError):
            parse_target_string("c0t0:Z", gs, 2, 256)   # unknown class
        with pytest.raises(ValueError):
            parse_target_string("whatever", gs, 2, 256)

    def test_targets_for_windows(self):
        gs = parse_classes_string("ab")
        evs = parse_target_string("c0t0:a c0t1:b", gs, 1, 256)
        cur = np.full((1, 1), -1, np.int32)
        t = targets_for_windows(evs, 0, 80, 1, 1, cur)
        assert t[0, 0, 0] == 0
        w1 = int(1.0 * RATE * 2 / 256 + 0.5)
        assert t[w1 - 1, 0, 0] == 0
        assert t[w1, 0, 0] == 1


def tone_pcm(freq, n, amp=3000.0, noise=300.0, seed=0):
    rng = np.random.default_rng(seed)
    t = np.arange(n) / RATE
    return (amp * np.sin(2 * np.pi * freq * t)
            + rng.normal(0, noise, n)).astype(np.float32)


class TestAudioClassifier:
    def make(self, **kw):
        kw.setdefault("classes", "ab")
        kw.setdefault("n_channels", 2)
        kw.setdefault("window_size", 256)
        kw.setdefault("hidden_size", 31)
        kw.setdefault("learn_rate", 0.0001)
        kw.setdefault("rng_seed", 5)
        return AudioClassifier(**kw)

    def test_learns_tone_classes(self):
        clf = self.make()
        # channel 0 hears class 'a' (500Hz), channel 1 class 'b' (2500Hz)
        clf.set_target_string("c0t0:a c1t0:b")
        n = RATE * 10
        pcm = np.stack([tone_pcm(500, n, seed=1), tone_pcm(2500, n, seed=2)])
        clf.training = True
        clf.feed(pcm)
        clf.flush()
        assert clf.generation > 200
        # inference on swapped tones: winners should swap too
        clf.training = False
        clf.reset_state()
        clf.set_target_string("c0t0:b c1t0:a")
        pcm2 = np.stack([tone_pcm(2500, RATE, seed=3),
                         tone_pcm(500, RATE, seed=4)])
        msgs = clf.feed(pcm2) + clf.flush()
        assert len(msgs) > 50
        # skip the first few windows (state warm-up)
        wins0 = [m["channel 0, group 0 winner"] for m in msgs[10:]]
        wins1 = [m["channel 1, group 0 winner"] for m in msgs[10:]]
        assert wins0.count("b") > len(wins0) * 0.7, wins0[:20]
        assert wins1.count("a") > len(wins1) * 0.7, wins1[:20]
        # messages carry per-class scores + correctness
        m = msgs[20]
        assert "channel 0, group 0 a" in m and "error" in m
        assert 0.0 <= m["channel 0, group 0 a"] <= 1.0

    def test_pipeline_depth_equivalence(self):
        """pipeline_depth only changes WHEN stats are read back, never the
        training arithmetic or the logged values (deferred-readback mode for
        high-latency device links; delta features exercise the
        device-resident carry)."""
        import io

        def run(depth):
            clf = self.make(delta_features=1, pipeline_depth=depth)
            clf.log.f = io.StringIO()        # capture the kv log
            clf.set_target_string("c0t0:a c1t0:b")
            pcm = np.stack([tone_pcm(500, RATE * 6, seed=1),
                            tone_pcm(2500, RATE * 6, seed=2)])
            clf.feed(pcm)
            clf.flush()
            assert not clf._pending_stats    # flush drained everything
            # inference path: deferred emission returns the same messages
            clf.training = False
            pcm2 = np.stack([tone_pcm(500, RATE * 3, seed=3),
                             tone_pcm(2500, RATE * 3, seed=4)])
            msgs = clf.feed(pcm2) + clf.flush()
            assert not clf._pending_opinions
            return (clf.log.f.getvalue(), clf.seen_counts.copy(),
                    np.asarray(clf.params.ih), msgs)

        log1, seen1, w1, msgs1 = run(1)
        log4, seen4, w4, msgs4 = run(4)
        assert log1 == log4
        np.testing.assert_array_equal(seen1, seen4)
        np.testing.assert_array_equal(w1, w4)
        assert msgs1 == msgs4

    def test_padded_tail_block_equivalence(self):
        """flush() pads a short tail up to BLOCK_WINDOWS (one compiled
        shape for every device call); the padding windows must be perfect
        no-ops.  Oracle: a classifier whose BLOCK_WINDOWS exactly matches
        the tail length (no padding at all) — same audio, same seeds —
        must produce identical weights, logs and messages.  (Valid because
        jax.random.split(key, T) is prefix-invariant in T.)"""
        import io

        def run(block_windows):
            clf = self.make(delta_features=1)
            clf.BLOCK_WINDOWS = block_windows
            clf.log.f = io.StringIO()
            clf.set_target_string("c0t0:a c1t0:b")
            half = clf.window_size // 2
            n = 96 * half        # 96 windows: exact for 96, padded for 128
            pcm = np.stack([tone_pcm(500, n, seed=1),
                            tone_pcm(2500, n, seed=2)])
            clf.feed(pcm)
            clf.flush()
            clf.training = False
            pcm2 = np.stack([tone_pcm(2500, n, seed=3),
                             tone_pcm(500, n, seed=4)])
            msgs = clf.feed(pcm2) + clf.flush()
            return (clf.log.f.getvalue(), np.asarray(clf.params.ih),
                    np.asarray(clf.state.hidden), msgs, clf.window_no)

        log_e, w_e, h_e, msgs_e, n_e = run(96)    # exact blocks, no padding
        log_p, w_p, h_p, msgs_p, n_p = run(128)   # tail padded 96 -> 128
        assert n_e == n_p == 192
        np.testing.assert_array_equal(w_e, w_p)
        np.testing.assert_array_equal(h_e, h_p)
        assert msgs_e == msgs_p
        assert log_e == log_p

    def test_balanced_training_counts(self):
        clf = self.make(balanced_training_bias=1.0)
        clf.set_target_string("c0t0:a c1t0:a")   # only class a seen
        pcm = np.stack([tone_pcm(500, RATE), tone_pcm(500, RATE)])
        clf.feed(pcm)
        clf.flush()
        assert clf.seen_counts[0] > 0
        assert clf.seen_counts[1] == 0
        assert clf.used_counts[0] <= clf.seen_counts[0]
        # the keep-probabilities refresh per WINDOW from the carried counts
        # (gstclassify.c:2205-2215): with only class a seen, p_a collapses
        # like 1/(seen_a+1) within the very first block, so most windows
        # must already be skipped — a per-chunk implementation would have
        # trained all of them (train_p starts at 1 with zero counts)
        assert clf.used_counts[0] < clf.seen_counts[0] * 0.2

    def test_unroll_equivalence(self):
        """AudioClassifier(unroll=2) is pure scan inlining — identical
        weights to unroll=1."""
        def run(u):
            clf = self.make(unroll=u)
            clf.set_target_string("c0t0:a c1t0:b")
            clf.feed(np.stack([tone_pcm(500, RATE * 2, seed=1),
                               tone_pcm(2500, RATE * 2, seed=2)]))
            clf.flush()
            return np.asarray(clf.params.ih)

        np.testing.assert_array_equal(run(1), run(2))

    def test_balanced_training_huge_counts(self):
        """Counts past f32's exact-integer range must not collapse the
        keep-probabilities to exact 0 (or NaN under a fractional bias):
        the host seed is rescaled so ratios survive in f32."""
        clf = self.make(balanced_training_bias=1.5)
        clf.seen_counts[:2] = [3e8, 1e4]    # class a utterly dominant
        clf.set_target_string("c0t0:a c1t0:b")
        pcm = np.stack([tone_pcm(500, RATE), tone_pcm(2500, RATE)])
        clf.feed(pcm)
        clf.flush()
        assert np.isfinite(np.asarray(clf.params.ih)).all()
        # the rare class must still train (its keep-probability ~ 1)
        assert clf.used_counts[1] > 0
        # the dominant class is throttled but not hard-zeroed by rounding
        assert clf.used_counts[0] < clf.seen_counts[0]

    def test_save_reload(self, tmp_path):
        clf = self.make(net_filename=str(tmp_path / "c.net"))
        clf.set_target_string("c0t0:a c1t0:b")
        clf.feed(np.stack([tone_pcm(500, RATE), tone_pcm(2500, RATE)]))
        clf.flush()
        clf.save()
        clf2 = self.make(net_filename=str(tmp_path / "c.net"),
                         force_load=True)
        assert clf2.generation == clf.generation
        np.testing.assert_array_equal(np.asarray(clf2.params.ih),
                                      np.asarray(clf.params.ih))


class TestStats:
    def test_auc_perfect_and_chance(self):
        truth = np.array([1, 1, 1, 0, 0, 0], bool)
        assert stats.calc_auc([0.9, 0.8, 0.7, 0.3, 0.2, 0.1], truth) == 1.0
        auc = stats.calc_auc([0.9, 0.3, 0.7, 0.8, 0.2, 0.1], truth)
        assert 0.0 < auc < 1.0

    def test_core_stats(self):
        rng = np.random.default_rng(0)
        truth = rng.random(500) < 0.3
        scores = truth * 0.5 + rng.random(500) * 0.5
        s = stats.calc_core_stats(scores, truth)
        assert s["auc"] > 0.85
        assert s["accuracy"] > 0.8
        assert s["dprime"] > 1.0
        assert 0 <= s["briar"] <= 1

    def test_presence(self):
        scores = np.zeros(600)
        truth = np.zeros(600, bool)
        scores[100:110] = 0.9
        truth[100:110] = True
        assert stats.presence_roc(scores, truth, window=60) == 1.0

    def test_welford(self):
        w = stats.Welford()
        xs = [1.0, 2.0, 3.0, 4.0]
        for x in xs:
            w.add(x)
        assert abs(w.mean - 2.5) < 1e-9
        assert abs(w.variance - np.var(xs, ddof=0) * 4 / 4) < 1e-6


def test_mfcc_features_feed():
    """mfccs>0 configurations must produce mfccs(+intensity) features per
    window — the binner always computes CLASSIFY_N_FFT_BINS bins and mfccs
    selects DCT coefficients (gstclassify.c:962-968, pcm_to_features)."""
    import numpy as np
    from recur_tpu.audio.classify import AudioClassifier

    rng = np.random.default_rng(0)
    for intensity in (0, 1):
        clf = AudioClassifier(classes="ab", n_channels=2, window_size=256,
                              hidden_size=15, mfccs=13,
                              intensity_feature=intensity,
                              net_filename="/tmp/mfcc_test.net")
        assert clf.n_raw_features == 13 + intensity
        pcm = rng.normal(0, 1000, (2, 256 * 130)).astype(np.float32)
        msgs = clf.feed(pcm)            # must not crash
        assert clf.window_no > 0
