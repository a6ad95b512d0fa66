"""text-classify: train a per-character document classifier from a
`filename class` list (text-classify.c)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.alphabet import Alphabet, Metadata
from recur_tpu.models.classify_text import (
    TextClassifier, adjust_text_lag, alloc_classified_text)
from recur_tpu.nn import Flag, LearningMethod
from recur_tpu.ops import init as winit
from recur_tpu.utils.colour import bar_chart
from recur_tpu.utils.kvlog import KvLog


def read_file_list(path: str) -> list[tuple[str, str]]:
    """Lines of `filename class`."""
    out = []
    with open(path) as f:
        for line in f:
            parts = line.split()
            if len(parts) >= 2:
                out.append((parts[0], parts[1]))
    return out


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-classify", description=__doc__)
    a = p.add_argument
    a("--file-list", required=True, help="lines of `filename class`")
    a("--validation-file-list", default=None)
    a("--hidden-size", "-H", type=int, default=199)
    a("--depth", type=int, default=30)
    a("--learn-rate", "-l", type=float, default=0.001)
    a("--momentum", "-m", type=float, default=0.95)
    a("--learning-style", type=int, default=0)
    a("--multi-tap", type=int, default=8)
    a("--lag", type=int, default=0)
    a("--ignore-start", type=int, default=0)
    a("--epochs", "-e", type=int, default=10)
    a("--find-alphabet-threshold", type=float, default=1e-5)
    a("--case-sensitive", action="store_true")
    a("--utf8", action="store_true")
    a("--filename", "-f", default="text-classify.net")
    a("--log-file", default="text-classify.log")
    a("--report-interval", type=int, default=1024)
    a("--rng-seed", type=int, default=1)
    a("--quiet", "-q", action="count", default=0)
    opt = p.parse_args(argv)

    file_classes = read_file_list(opt.file_list)
    corpus = b""
    blocks = []
    for path, cls in file_classes:
        with open(path, "rb") as f:
            text = f.read()
        corpus += text
        blocks.append((cls, text))
    alphabet = Alphabet.find(corpus, threshold=opt.find_alphabet_threshold,
                             case_insensitive=not opt.case_sensitive,
                             utf8=opt.utf8, collapse_space=True)
    syms, cls, names = alloc_classified_text(blocks, alphabet,
                                             ignore_start=opt.ignore_start)
    if opt.lag:
        cls = adjust_text_lag(cls, opt.lag)
    validation = None
    if opt.validation_file_list:
        vblocks = []
        lut = {n: i for i, n in enumerate(names)}
        for path, c in read_file_list(opt.validation_file_list):
            with open(path, "rb") as f:
                vblocks.append((c, f.read()))
        vs, vc, _ = alloc_classified_text(vblocks, alphabet,
                                          class_lut=lut)
        validation = (vs, vc)

    net = nn.new_net(len(alphabet), opt.hidden_size, len(names),
                     flags=Flag.STANDARD | Flag.BPTT_ADAPTIVE_MIN_ERROR,
                     rng_seed=opt.rng_seed, depth=opt.depth,
                     learn_rate=opt.learn_rate, momentum=opt.momentum)
    net.metadata = Metadata.from_alphabet(alphabet).construct()
    winit.randomise_weights(net)
    clf = TextClassifier(net, alphabet, names, n_streams=opt.multi_tap,
                         learning_style=LearningMethod(opt.learning_style),
                         report_interval=opt.report_interval,
                         filename=opt.filename, log=KvLog(opt.log_file),
                         seed=opt.rng_seed)
    if opt.quiet < 1:
        print(f"classes: {names}; alphabet ({len(alphabet)}): "
              f"»{alphabet.points_string()}«", file=sys.stderr)
    for e in range(opt.epochs):
        r = clf.epoch(syms, cls, validation=validation, quietness=opt.quiet)
        if opt.quiet < 1 and r:
            probs = clf.classify_text(syms[:200])
            print(f"epoch {e}: {bar_chart(probs.mean(axis=0))}",
                  file=sys.stderr)
    clf.save(opt.filename)
    return 0


if __name__ == "__main__":
    sys.exit(main())
