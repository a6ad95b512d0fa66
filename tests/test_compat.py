"""Tests of the charmodel / rnnumpy compat APIs, mirroring the reference's
test/charmodel.py (fixture load) and test/rnnumpy.py (stripe learning)."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, "/root/repo")

from recur_tpu.compat.charmodel import Alphabet, Net as CharNet
from recur_tpu.compat.rnnumpy import Net as NumpyNet

FIXTURE = "/root/reference/test/multi-text-6c34c563i73-h99-o3650.net"


class TestAlphabet:
    def test_from_chars(self):
        a = Alphabet(alphabet_chars="8 abc", collapse_chars="xyz")
        assert a.alphabet == "8 abc"
        assert a.collapsed_chars == "xyz"
        assert len(a) == 5

    def test_find_and_encode(self):
        text = b"hello world, hello again " * 50
        a = Alphabet(text, threshold=1e-3, collapse_space=True)
        enc = a.encode_text(b"hello")
        assert len(enc) == 5
        assert a.decode_text(enc) == "hello"

    def test_get_codepoint(self):
        a = Alphabet(alphabet_chars="8 abc")
        assert a.get_codepoint("a") == 2
        assert a.get_codepoint("Z") == -1


class TestCharNet:
    def make(self, **kw):
        a = Alphabet(alphabet_chars=" abcdefgh")
        kw.setdefault("log_file", None)
        kw.setdefault("presynaptic_noise", 0.0)
        return a, CharNet(a, ["one", "two"], 15, bptt_depth=8,
                          rng_seed=4, **kw)

    def test_ctor_surface(self):
        a, net = self.make()
        assert net.n_classes == 2
        assert net.class_name_lut == {"one": 0, "two": 1}
        assert net.net.cfg.output_size == 2 * len(a)
        assert net.learn_rate > 0
        net.learn_rate = 0.5
        assert abs(net.learn_rate - 0.5) < 1e-6

    @pytest.mark.slow
    def test_train_and_test_separates_classes(self):
        a, net = self.make(learn_rate=0.01)
        text1 = a.encode_text(b"abab cdcd " * 40)
        text2 = a.encode_text(b"efef ghgh " * 40)
        for _ in range(10):
            net.train(text1, "one", leakage=0.05)
            net.train(text2, "two", leakage=0.05)
        t1 = net.test(text1)
        t2 = net.test(text2)
        assert t1["one"] < t1["two"], t1
        assert t2["two"] < t2["one"], t2

    def test_pipeline_depth_equivalence(self):
        """pipeline_depth (TPU extension) only defers log readback; the
        training arithmetic and the logged values are identical."""
        import io

        def run(depth):
            a, net = self.make(learn_rate=0.01, pipeline_depth=depth)
            net.log.f = io.StringIO()
            t1 = a.encode_text(b"abab cdcd " * 20)
            t2 = a.encode_text(b"efef ghgh " * 20)
            for _ in range(4):
                net.train(t1, "one", leakage=0.05)
                net.train(t2, "two", leakage=0.05)
            net.drain_logs()
            assert not net._pending_logs
            import numpy as np
            return net.log.f.getvalue(), np.asarray(net._params.ih)

        log1, w1 = run(1)
        log3, w3 = run(3)
        assert log1 == log3
        import numpy as np
        np.testing.assert_array_equal(w1, w3)

    def test_train_batch_length_one_doc(self):
        """A batch whose shortest document has a single symbol trains
        nothing (zero transitions) but must not poison the deferred log
        queue (float(None) regression)."""
        a, net = self.make(pipeline_depth=3)
        net.train_batch([a.encode_text(b"x"), a.encode_text(b"abcd")],
                        ["one", "two"])
        net.drain_logs()     # must not raise

    def test_train_unknown_class(self):
        a, net = self.make()
        with pytest.raises(KeyError):
            net.train(a.encode_text(b"abcabc"), "nope")

    def test_short_text(self):
        a, net = self.make()
        with pytest.raises(ValueError):
            net.train(b"\x01", "one")

    def test_confabulate(self):
        a, net = self.make()
        lines = net.confabulate(10)
        assert len(lines) == 2
        assert all(len(s) == 10 for s in lines)

    def test_confabulate_statefulness_and_bias(self):
        # fast in-graph path (no caps_marker): high bias => deterministic
        # argmax sampling; start_confab state must advance between calls
        a, net = self.make()
        net.start_confab(40, 100)
        l1 = net.confabulate(8, bias=1000.0)
        l2 = net.confabulate(8, bias=1000.0)
        assert all(len(s) == 8 for s in l1 + l2)
        a2, net2 = self.make()
        net2.start_confab(40, 100)
        m1 = net2.confabulate(8, bias=1000.0)
        assert m1 == l1  # argmax from same init state is reproducible

    def test_confabulate_caps_marker_slow_path(self):
        a, net = self.make()
        lines = net.confabulate(6, caps_marker=a.alphabet[1])
        assert len(lines) == 2
        assert all(len(s) == 6 for s in lines)

    def test_save_load_roundtrip(self, tmp_path):
        a, net = self.make()
        md = {"version": 1, "alphabet": a.alphabet, "collapse_chars": "",
              "case_insensitive": 0, "utf8": 0, "collapse_space": 0,
              "classnames": ["one", "two"], "batch_size": 1, "verbose": 0,
              "momentum": 0.95, "learning_method": 4,
              "temporal_pgm_dump": 0, "periodic_pgm_dump": "",
              "periodic_pgm_period": 0, "basename": "t"}
        net.net.metadata = json.dumps(md)
        p = tmp_path / "t.net"
        net.save(str(p))
        net2 = CharNet.load(str(p), json.loads)
        assert net2.class_names == ["one", "two"]
        assert net2.net.cfg.hidden_size == 15
        np.testing.assert_array_equal(np.asarray(net2._params.ih),
                                      np.asarray(net._params.ih))

    @pytest.mark.skipif(not os.path.exists(FIXTURE), reason="fixture missing")
    def test_load_reference_fixture(self):
        """The shipped caravel net loads through the same path the reference
        Python module uses (json metadata, 50 classes, h=99)."""
        net = CharNet.load(FIXTURE, json.loads)
        assert net.n_classes == 50
        assert net.net.cfg.hidden_size == 99
        assert len(net.alphabet) == 73
        # scoring some text yields finite per-class entropies
        enc = net.alphabet.encode_text(b"the war in the desert was long")
        scores = net.test(enc)
        assert len(scores) == 50
        assert all(np.isfinite(v) for v in scores.values())


class TestNumpyNet:
    def test_stripe_learning(self):
        """test/rnnumpy.py's diagonal-stripe task: predict a rotating one-hot
        pattern; must beat the degenerate 1/width baseline clearly."""
        width = 6
        T = 600
        idx = np.arange(T) % width
        feats = np.eye(width, dtype=np.float32)[idx]
        targs = np.eye(width, dtype=np.float32)[(idx + 1) % width]
        net = NumpyNet(width, 23, width, rng_seed=3, bptt_depth=10,
                       learn_rate=0.05, batch_size=1)
        net.train(feats, targs, n_epochs=8)
        probs = net.classify(feats[:120])
        acc = float(np.mean(np.argmax(probs, axis=1) == (idx[:120] + 1) % width))
        assert acc > 0.8, f"stripe accuracy {acc}"

    def test_stripe_123_vs_degenerate_baselines(self):
        """test/rnnumpy.py:14-101's pair_123 task: inputs carry a 3-wide
        diagonal stripe (1 at t, lag-1 echo, lag-2 echo) among decoy 1s;
        the target fires only after a complete stripe, so the net must
        integrate 3 steps of history.  The learned classifier must beat
        both stuck-at-constant degenerate baselines AND the random
        predictor on squared error, and get >95% of rows right."""
        rng = np.random.default_rng(42)

        def pair_123(n):
            inputs = np.zeros((n, 3), np.float32)
            targets = np.zeros((n, 2), np.float32)
            choices = rng.integers(0, 10, size=n)
            choices[:3] = 9
            inputs[choices < 3, 0] = 1.0
            inputs[1:, 1] = inputs[:-1, 0]
            inputs[2:, 2] = inputs[:-2, 0]
            for i in range(2):       # decoy 1s in the echo columns
                inputs[choices == 3 + i, i] = 1.0
            targets[3:, 1] = (inputs[:-3, 0] * inputs[1:-2, 1]
                              * inputs[2:-1, 2])
            targets[:, 0] = 1.0 - targets[:, 1]
            return inputs, targets

        inputs, targets = pair_123(6000)
        test, answers = pair_123(1500)
        net = NumpyNet(3, 15, 2, rng_seed=1, bptt_depth=5, learn_rate=0.1,
                       batch_size=1)
        net.train(inputs, targets, n_epochs=3)
        results = net.classify(test)
        diff = np.abs(answers - results)
        wrong = int(np.sum(diff > 0.5) // 2)
        mse = float((diff ** 2).mean())
        stuck1 = np.zeros_like(answers); stuck1[:, 0] = 1.0
        stuck2 = np.zeros_like(answers); stuck2[:, 1] = 1.0
        rand = rng.random(answers.shape)
        for base in (stuck1, stuck2, rand):
            assert mse < ((answers - base) ** 2).mean(), (
                f"mse {mse} does not beat a degenerate baseline")
        assert wrong < 0.05 * len(test), f"{wrong}/{len(test)} rows wrong"

    def test_mask_and_balance(self):
        width = 4
        feats = np.eye(width, dtype=np.float32)[np.arange(40) % width]
        targs = feats.copy()
        net = NumpyNet(width, 9, width, rng_seed=3)
        mask = np.ones(40, bool)
        mask[::2] = False
        net.train(feats, targs, n_epochs=1, mask=mask, balance=1.0)
        assert net.seen_sum == 20  # masked rows don't count
        assert 0 < net.used_sum <= 20

    def test_bad_shapes(self):
        net = NumpyNet(4, 9, 4)
        with pytest.raises(ValueError):
            net.train(np.zeros((10, 5), np.float32),
                      np.zeros((10, 4), np.float32), 1)
        with pytest.raises(ValueError):
            net.train(np.zeros((10, 4), np.float32),
                      np.zeros((9, 4), np.float32), 1)

    def test_save_load(self, tmp_path):
        net = NumpyNet(4, 9, 4, rng_seed=7)
        p = tmp_path / "n.net"
        net.save(str(p))
        net2 = NumpyNet.load(str(p))
        np.testing.assert_array_equal(np.asarray(net2._params.ih),
                                      np.asarray(net._params.ih))

    def test_bptt_scale_properties(self):
        """py-recur-numpy.c getset surface: ho_scale / momentum_weight are
        live; ih_scale reads 1.0 (per-step internal here)."""
        net = NumpyNet(4, 9, 4, rng_seed=7)
        assert net.ih_scale == 1.0
        net.ho_scale = 0.5
        net.momentum_weight = 0.25
        assert abs(net.ho_scale - 0.5) < 1e-6
        assert abs(net.momentum_weight - 0.25) < 1e-6
        feats = np.eye(4, dtype=np.float32)[np.arange(20) % 4]
        net.train(feats, feats, n_epochs=1)
        assert net.generation == 20


def test_ih_scale_live_under_explosion():
    """bptt->ih_scale is a live training-health signal: with an absurd learn
    rate the BPTT error explodes and the emergency scale must drop below 1
    (recur-nn.c:393-402; round-1 weak #9 returned a constant 1.0)."""
    import numpy as np
    import rnnumpy

    rng = np.random.default_rng(0)
    net = rnnumpy.Net(8, 15, 4, learn_rate=50.0, rng_seed=3,
                      learning_method=6)
    assert net.ih_scale == 1.0
    feats = rng.standard_normal((200, 8)).astype(np.float32) * 3
    targets = np.zeros((200, 4), np.float32)
    targets[np.arange(200), rng.integers(0, 4, 200)] = 1
    seen = []
    for _ in range(5):
        net.train(feats, targets, n_epochs=1)
        seen.append(net.ih_scale)
    assert min(seen) < 1.0, seen


def test_caravel_golden_scores():
    """Forward-pass numerics pinned on the reference's shipped trained net:
    per-class XE of a fixed sentence must match the stored golden vector to
    float32 tolerance (py-recur-text.c:823-871 semantics)."""
    import json
    import os
    from recur_tpu.compat import charmodel

    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               "caravel_scores.json")
    with open(golden_path) as f:
        golden = json.load(f)
    net = charmodel.Net.load(FIXTURE, json.loads)
    enc = net.alphabet.encode_text(golden["sentence"].encode())
    scores = net.test(enc)
    assert set(scores) == set(golden["scores"])
    for k, v in golden["scores"].items():
        assert abs(scores[k] - v) < 1e-4 * max(1.0, abs(v)), (k, scores[k], v)
    # ranking sanity: the golden best class stays the best
    best = min(golden["scores"], key=golden["scores"].get)
    assert min(scores, key=scores.get) == best
