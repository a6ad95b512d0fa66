#!/usr/bin/env python
"""Score a seed ensemble on the char-LM validation protocol.

Scores the last --validate-chars encoded symbols of the corpus (skip 5 —
Ventropy, charmodel-predict.c:216-257) for each net alone and for the
per-char mixture of all nets' predictive distributions.  By default each
net's hidden state is warmed with one full pass over the validation tail
first, reproducing Ventropy's carried hidden (the training logs' v_entropy
always scores with a hidden warmed by earlier validation passes), so per-net
numbers are directly comparable to logged best_v_entropy values; pass
--warm-laps 0 for a cold start.  Members must share an alphabet.

Independent seed runs of the same operating point disagree usefully: five
~8-minute h=199 EMA runs that each validate at ~2.13-2.16 bits/char score
~1.95 as a mixture — below the reference's "≈2" headline, which its own
binary never reaches (best 2.3185, artifacts/ref_longrun/).

    PYTHONPATH=/root/repo python scripts/ensemble_eval.py \
        --text /root/reference/test-images/erewhon.txt \
        --validate-chars 10000 --out artifacts/sweep/ensemble.json \
        artifacts/sweep/h199-n10-ema*.net.ema
"""

import argparse
import json
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.charmodel import (
    combine_probs, ensemble_alphabet, member_probs)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("nets", nargs="+", help="net files (e.g. the .net.ema "
                   "Polyak-averaged saves of independent seed runs)")
    p.add_argument("--text", required=True, help="corpus file; the "
                   "validation tail is taken from it exactly as "
                   "text-predict --validate-chars does")
    p.add_argument("--validate-chars", type=int, default=10000)
    p.add_argument("--skip", type=int, default=5,
                   help="chars to ignore at segment start (Ventropy)")
    p.add_argument("--warm-laps", type=int, default=1,
                   help="full passes over the tail to warm each hidden "
                        "state before scoring (1 = Ventropy's carried "
                        "hidden; 0 = cold start)")
    p.add_argument("--out", default=None, help="write a JSON record here")
    p.add_argument("--prefer-best", action="store_true",
                   help="swap each member for its <net>.best validation-"
                        "record snapshot when that file exists (final .ema "
                        "saves are typically 0.02-0.05 worse than the "
                        "run's best — the trend schedule decays past the "
                        "optimum)")
    opt = p.parse_args(argv)

    if opt.prefer_best:
        import os

        def best_of(f):
            # text-predict saves the record snapshot as <filename>.best
            # (EMA weights when --ema-weight is on), next to <filename>.ema
            stem = f[:-4] if f.endswith(".ema") else f
            return stem + ".best" if os.path.exists(stem + ".best") else f
        opt.nets = [best_of(f) for f in opt.nets]
    nets = [nn.load_net(f) for f in opt.nets]
    try:
        alpha = ensemble_alphabet(nets, opt.nets)
    except ValueError as e:
        p.error(str(e))
    with open(opt.text, "rb") as f:
        text = alpha.encode(f.read())
    v = np.asarray(text[-opt.validate_chars:], dtype=np.int32)
    y = v[1:]

    def xe(q):
        picked = q[np.arange(len(y)), y]
        return float(-np.log2(picked + 1e-30)[opt.skip:].mean())

    per_net, all_p = {}, []
    for path, net in zip(opt.nets, nets):
        prob = member_probs(net, v, warm_laps=opt.warm_laps)
        all_p.append(prob)
        per_net[path] = xe(prob)
        print(f"{path}: {per_net[path]:.4f} bits/char", flush=True)

    mix = xe(combine_probs(np.stack(all_p)))
    print(f"ensemble mixture of {len(nets)}: {mix:.4f} bits/char")
    record = {"text": opt.text, "validate_chars": opt.validate_chars,
              "warm_laps": opt.warm_laps,
              "per_net": per_net, "ensemble_mixture": mix}
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
