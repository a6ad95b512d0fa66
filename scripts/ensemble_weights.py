#!/usr/bin/env python
"""Fit ensemble mixture weights on a held-out dev segment, score on the
validation tail.

The uniform per-char mixture of independent seed runs already beats any
single net (scripts/ensemble_eval.py).  This fits non-uniform simplex
weights w (sum 1, w >= 0) by exponentiated-gradient descent on the dev
segment's cross-entropy — the dev segment (by default the 10k chars
IMMEDIATELY BEFORE the validation tail) is disjoint from the scored tail,
so the weights are honest hyperparameters, not test-set fitting.  Also
reports greedy forward subset selection (uniform weights over the best
subset), which is how to pick a small teacher set for distillation.

    PYTHONPATH=/root/repo python scripts/ensemble_weights.py \
        --text /root/reference/test-images/erewhon.txt \
        artifacts/sweep/h199-n10-ema*.net.ema
"""

import argparse
import json
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.charmodel import (
    combine_probs, ensemble_alphabet, member_probs)


def xe_bits(q, y, skip):
    picked = q[np.arange(len(y)), y]
    return float(-np.log2(picked + 1e-30)[skip:].mean())


def fit_simplex_weights(probs, y, skip, iters=500, lr=2.0):
    """Exponentiated-gradient on mean -log2(sum_k w_k p_k[y]): multiplicative
    updates keep w on the simplex without projection."""
    n = probs.shape[0]
    picked = probs[:, np.arange(len(y)), y][:, skip:]   # [n, T']
    w = np.full(n, 1.0 / n)
    for _ in range(iters):
        mix = w @ picked                                # [T']
        grad = -(picked / (mix + 1e-30)).mean(axis=1)   # d(mean -ln mix)/dw
        w = w * np.exp(-lr * grad / np.abs(grad).max())
        w /= w.sum()
    return w


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("nets", nargs="+")
    p.add_argument("--text", required=True)
    p.add_argument("--validate-chars", type=int, default=10000)
    p.add_argument("--dev-chars", type=int, default=10000)
    p.add_argument("--skip", type=int, default=5)
    p.add_argument("--warm-laps", type=int, default=1)
    p.add_argument("--out", default=None)
    opt = p.parse_args(argv)

    nets = [nn.load_net(f) for f in opt.nets]
    try:
        alpha = ensemble_alphabet(nets, opt.nets)
    except ValueError as e:
        p.error(str(e))
    with open(opt.text, "rb") as f:
        text = alpha.encode(f.read())
    dev = np.asarray(text[-(opt.validate_chars + opt.dev_chars):
                          -opt.validate_chars], np.int32)
    val = np.asarray(text[-opt.validate_chars:], np.int32)

    dev_p, val_p = [], []
    for path, net in zip(opt.nets, nets):
        dev_p.append(member_probs(net, dev, warm_laps=opt.warm_laps))
        val_p.append(member_probs(net, val, warm_laps=opt.warm_laps))
        print(f"{path}: dev {xe_bits(dev_p[-1], dev[1:], opt.skip):.4f} "
              f"val {xe_bits(val_p[-1], val[1:], opt.skip):.4f}", flush=True)
    dev_p, val_p = np.stack(dev_p), np.stack(val_p)
    y_dev, y_val = dev[1:], val[1:]

    uni_val = xe_bits(combine_probs(val_p), y_val, opt.skip)
    print(f"uniform mixture of {len(nets)}: val {uni_val:.4f}")

    w = fit_simplex_weights(dev_p, y_dev, opt.skip)
    wq = np.einsum("k,ktv->tv", w, val_p)
    w_val = xe_bits(wq, y_val, opt.skip)
    print("dev-fitted weights:",
          " ".join(f"{x:.3f}" for x in w))
    print(f"weighted mixture: val {w_val:.4f}")

    # greedy forward selection on dev (uniform weights over the subset)
    chosen, best_dev = [], np.inf
    remaining = list(range(len(nets)))
    while remaining:
        scored = [(xe_bits(dev_p[chosen + [i]].mean(axis=0), y_dev, opt.skip),
                   i) for i in remaining]
        s, i = min(scored)
        if s >= best_dev:
            break
        best_dev = s
        chosen.append(i)
        remaining.remove(i)
    sub_val = xe_bits(val_p[chosen].mean(axis=0), y_val, opt.skip)
    print(f"greedy subset ({len(chosen)} members, dev {best_dev:.4f}): "
          f"val {sub_val:.4f}")
    for i in chosen:
        print(f"  {opt.nets[i]}")

    record = {
        "text": opt.text, "validate_chars": opt.validate_chars,
        "dev_chars": opt.dev_chars, "warm_laps": opt.warm_laps,
        "members": opt.nets,
        "uniform_val": uni_val,
        "weights": [float(x) for x in w], "weighted_val": w_val,
        "greedy_subset": [opt.nets[i] for i in chosen],
        "greedy_val": sub_val,
    }
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
