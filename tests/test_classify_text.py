"""Text classification (charmodel-classify.c semantics)."""

import numpy as np

from recur_tpu import nn
from recur_tpu.models.alphabet import Alphabet
from recur_tpu.models.classify_text import (
    NO_CLASS, TextClassifier, adjust_text_lag, alloc_classified_text)
from recur_tpu.nn import Flag
from recur_tpu.ops import init as winit


def test_adjust_text_lag():
    c = np.array([0, 1, 2, 3, 4], np.uint8)
    out = adjust_text_lag(c, 2)
    assert list(out) == [NO_CLASS, NO_CLASS, 0, 1, 2]
    out = adjust_text_lag(c, -2)
    assert list(out) == [2, 3, 4, NO_CLASS, NO_CLASS]
    assert list(adjust_text_lag(c, 0)) == list(c)


def test_alloc_classified_text():
    a = Alphabet.from_chars(" abcd")
    syms, cls, names = alloc_classified_text(
        [("en", b"abab"), ("fr", b"cdcd")], a, ignore_start=1)
    assert names == ["en", "fr"]
    assert len(syms) == 8
    assert cls[0] == NO_CLASS and cls[1] == 0
    assert cls[4] == NO_CLASS and cls[5] == 1


def test_classifier_learns():
    a = Alphabet.from_chars(" abcdefgh")
    blocks = []
    rng = np.random.default_rng(0)
    for _ in range(20):
        blocks.append(("one",
                       rng.choice(list(b"abcd "), 40).astype(np.uint8)
                       .tobytes()))
        blocks.append(("two",
                       rng.choice(list(b"efgh "), 40).astype(np.uint8)
                       .tobytes()))
    syms, cls, names = alloc_classified_text(blocks, a, ignore_start=5)
    net = nn.new_net(len(a), 23, 2,
                     flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=3, depth=10, learn_rate=0.02, momentum=0.9)
    winit.randomise_weights(net)
    clf = TextClassifier(net, a, names, n_streams=2, report_interval=400)
    r = {}
    # 5 epochs at lr 0.02 reaches ~0.9 (more epochs eventually destabilise
    # this deliberately hot learn rate)
    for _ in range(5):
        r = clf.epoch(syms, cls, validation=(syms[:300], cls[:300]),
                      quietness=2)
    assert r, "no report emitted"
    assert r["accuracy"] > 0.8, r
    # per-char probabilities discriminate held-out text
    p1 = clf.classify_text(a.encode(b"abcd abcd abcd abcd"))
    p2 = clf.classify_text(a.encode(b"efgh efgh efgh efgh"))
    assert p1[8:, 0].mean() > 0.6
    assert p2[8:, 1].mean() > 0.6
