#!/usr/bin/env python
"""Confirm the ensemble headline on data that played no role in curation.

The curated 35-member mixture (artifacts/sweep/ensemble_best35.json,
1.9003 bits/char) was selected by its score on the SAME 10k-char erewhon
validation tail it reports — a selection optimum could in principle be a
segment-overfit artifact (VERDICT r3, missing #4).  No second never-trained
segment exists (text-predict holds out exactly the last --validate-chars;
everything earlier was training data, charmodel-predict.c:216-257 has the
same split), so the confirmation uses a split-half protocol on the tail:

  * half A = tail[:5000], half B = tail[5000:].  Both are unseen by
    training; each can serve as a curation set for the other.
  * Every candidate snapshot's per-char probabilities are computed ONCE
    over the full tail with the standard warm lap, then each half is
    scored from its slice (half B's hidden state is additionally warmed
    by half A in-sequence, as in any contiguous protocol).
  * Report (1) the curated 35 and the best single net on A, B and full;
    (2) greedy forward selection from the FULL snapshot pool done on A
    alone, evaluated on B (and vice versa) — if segment-specific greedy
    selection transfers no better than the curated 35, the 1.9003 is a
    property of the ensemble, not of fitting the reporting segment.

    PYTHONPATH=/root/repo python scripts/ensemble_confirm.py \
        --out artifacts/sweep/ensemble_confirm.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax                                           # noqa: E402
# scoring is tiny; run on the host so the chip stays free for training
# (JAX_PLATFORMS=cpu alone is not enough — the axon hook wins, CLAUDE.md)
jax.config.update("jax_platforms", "cpu")

from recur_tpu import nn
from recur_tpu.models.charmodel import (
    combine_probs, ensemble_alphabet, member_probs)


def xe(q, y, lo, hi, skip=0):
    """bits/char of distributions q[t] against targets y[t] on [lo, hi)."""
    picked = q[np.arange(len(y)), y]
    return float(-np.log2(picked + 1e-30)[lo + skip:hi].mean())


def greedy_select(probs, y, lo, hi, skip, max_members=40):
    """Forward selection minimising mixture XE on [lo, hi) only."""
    names = sorted(probs)
    chosen, cur = [], None
    best_score = float("inf")
    while len(chosen) < max_members:
        cand_best, cand_name = None, None
        for n in names:
            if n in chosen:
                continue
            mix = probs[n] if cur is None else (
                (cur * len(chosen) + probs[n]) / (len(chosen) + 1))
            s = xe(mix, y, lo, hi, skip)
            if cand_best is None or s < cand_best:
                cand_best, cand_name = s, n
        if cand_best >= best_score:       # adding anything makes it worse
            break
        best_score, cand_name_probs = cand_best, probs[cand_name]
        cur = cand_name_probs if cur is None else (
            (cur * len(chosen) + cand_name_probs) / (len(chosen) + 1))
        chosen.append(cand_name)
    return chosen, best_score


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--curated", default="artifacts/sweep/ensemble_best35.json")
    p.add_argument("--text", default="/root/reference/test-images/erewhon.txt")
    p.add_argument("--pool-glob", default="artifacts/sweep/*.net.best",
                   help="extra snapshot pool for the greedy transfer check")
    p.add_argument("--validate-chars", type=int, default=10000)
    p.add_argument("--skip", type=int, default=5)
    p.add_argument("--out", default="artifacts/sweep/ensemble_confirm.json")
    opt = p.parse_args(argv)

    curated = json.load(open(os.path.join(REPO, opt.curated)))
    members = sorted(curated["per_net"])  # repo-relative paths
    pool = sorted(set(members) | {os.path.relpath(f, REPO) for f in
                                  glob.glob(os.path.join(REPO,
                                                         opt.pool_glob))})

    nets, names = [], []
    for f in pool:
        try:
            nets.append(nn.load_net(os.path.join(REPO, f)))
            names.append(f)
        except Exception as e:
            print(f"skip {f}: {e}", file=sys.stderr)
    alpha = ensemble_alphabet(nets, names)
    with open(opt.text, "rb") as f:
        text = alpha.encode(f.read())
    v = np.asarray(text[-opt.validate_chars:], dtype=np.int32)
    y = v[1:]
    half = (len(y)) // 2
    segs = {"full": (0, len(y), opt.skip),
            "half_a": (0, half, opt.skip),
            "half_b": (half, len(y), 0)}   # B's hidden warmed by A in-seq

    probs = {}
    for name, net in zip(names, nets):
        probs[name] = member_probs(net, v, warm_laps=curated["warm_laps"])
        print(f"{name}: " + " ".join(
            f"{k}={xe(probs[name], y, *s):.4f}" for k, s in segs.items()),
            flush=True)

    curated_in_pool = [m for m in members if m in probs]
    if len(curated_in_pool) != len(members):
        print(f"note: only {len(curated_in_pool)}/{len(members)} curated "
              "members loadable", file=sys.stderr)
    mix35 = combine_probs(np.stack([probs[m] for m in curated_in_pool]))
    best_single = min(probs, key=lambda n: xe(probs[n], y, *segs["full"]))

    record = {"text": opt.text, "validate_chars": opt.validate_chars,
              "warm_laps": curated["warm_laps"],
              "curated_members": len(curated_in_pool),
              "pool_size": len(probs),
              "curated_mixture": {k: xe(mix35, y, *s)
                                  for k, s in segs.items()},
              "best_single": {"name": best_single,
                              **{k: xe(probs[best_single], y, *s)
                                 for k, s in segs.items()}}}

    # greedy selection on one half, evaluation on the other
    for sel, ev in (("half_a", "half_b"), ("half_b", "half_a")):
        chosen, sel_score = greedy_select(probs, y, *segs[sel])
        mix = combine_probs(np.stack([probs[n] for n in chosen]))
        record[f"greedy_on_{sel}"] = {
            "members": len(chosen), "score_on_" + sel: sel_score,
            "score_on_" + ev: xe(mix, y, *segs[ev]),
            "chosen": chosen}
    # and the all-pool mixture as the no-selection control
    mix_all = combine_probs(np.stack(list(probs.values())))
    record["all_pool_mixture"] = {k: xe(mix_all, y, *s)
                                  for k, s in segs.items()}

    print(json.dumps({k: v for k, v in record.items()
                      if not (isinstance(v, dict) and "chosen" in v)},
                     indent=1))
    for sel in ("half_a", "half_b"):
        g = record[f"greedy_on_{sel}"]
        print(f"greedy on {sel}: {g['members']} members, "
              + ", ".join(f"{k}={v:.4f}" for k, v in g.items()
                          if isinstance(v, float)))
    if opt.out:
        with open(os.path.join(REPO, opt.out), "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
