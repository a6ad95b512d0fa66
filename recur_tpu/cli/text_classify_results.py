"""text-classify-results: emit per-file class probabilities from a trained
classifier net (text-classify-results.c)."""

from __future__ import annotations

import argparse
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.alphabet import Metadata
from recur_tpu.models.classify_text import TextClassifier


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="text-classify-results",
                                description=__doc__)
    p.add_argument("--filename", "-f", required=True, help="net file")
    p.add_argument("--classes", default=None,
                   help="comma-separated class names (default: indices)")
    p.add_argument("files", nargs="+")
    p.add_argument("--skip", type=int, default=20,
                   help="ignore the first N chars (state warm-up)")
    opt = p.parse_args(argv)

    net = nn.load_net(opt.filename)
    alphabet = Metadata.parse(net.metadata).to_alphabet()
    n = net.cfg.output_size
    names = (opt.classes.split(",") if opt.classes
             else [str(i) for i in range(n)])
    clf = TextClassifier(net, alphabet, names, n_streams=1, save_net=False)
    for path in opt.files:
        with open(path, "rb") as f:
            syms = alphabet.encode(f.read())
        probs = clf.classify_text(syms)
        mean = probs[opt.skip:].mean(axis=0)
        cols = " ".join(f"{names[i]}:{mean[i]:.4f}" for i in range(n))
        print(f"{path} {cols}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
