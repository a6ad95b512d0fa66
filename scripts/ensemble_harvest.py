#!/usr/bin/env python
"""Harvest every usable net snapshot in a sweep directory into one mixture.

Collects `<tag>.net.best`, `<tag>.net.ema` and the periodic
`<tag>.net.g<GEN>` snapshots (--snapshot-every), scores each member alone
on the validation protocol (identical to scripts/ensemble_eval.py: last
--validate-chars encoded symbols, skip 5, one warm lap = Ventropy's
carried hidden), drops members whose solo score exceeds --max-solo
(weak members dilute a uniform mixture — the partial t64-s2 snapshot at
2.32 was measurably worse in than out), then reports the per-char uniform
mixture of the survivors.

    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python scripts/ensemble_harvest.py \
        --text /root/reference/test-images/erewhon.txt \
        --workdir artifacts/sweep --out artifacts/sweep/ensemble_final.json
"""

import argparse
import glob
import json
import os
import sys

import numpy as np

from recur_tpu import nn
from recur_tpu.models.charmodel import (
    combine_probs, ensemble_alphabet, member_probs)


def collect(workdir: str):
    cands = (glob.glob(os.path.join(workdir, "*.net.best"))
             + glob.glob(os.path.join(workdir, "*.net.ema"))
             + glob.glob(os.path.join(workdir, "*.net.g[0-9]*")))
    return sorted(p for p in cands if not p.endswith(".json"))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="artifacts/sweep")
    p.add_argument("--text", required=True)
    p.add_argument("--validate-chars", type=int, default=10000)
    p.add_argument("--skip", type=int, default=5)
    p.add_argument("--warm-laps", type=int, default=1)
    p.add_argument("--max-solo", type=float, default=2.2,
                   help="drop members scoring worse than this alone")
    p.add_argument("--exclude", action="append", default=[],
                   help="basename substring(s) to leave out — e.g. "
                        "'distill' keeps students out of a mixture that "
                        "already contains their teachers (member "
                        "diversity beats member strength, PERF.md)")
    p.add_argument("--out", default=None)
    opt = p.parse_args(argv)

    paths = [f for f in collect(opt.workdir)
             if not any(s in os.path.basename(f) for s in opt.exclude)]
    if not paths:
        p.error(f"no net snapshots under {opt.workdir}")
    nets, kept_paths = [], []
    for f in paths:
        try:
            nets.append(nn.load_net(f))
            kept_paths.append(f)
        except Exception as e:            # partial write from a live run
            print(f"skip {f}: {e}", file=sys.stderr)
    try:
        alpha = ensemble_alphabet(nets, kept_paths)
    except ValueError as e:
        p.error(str(e))
    with open(opt.text, "rb") as f:
        text = alpha.encode(f.read())
    v = np.asarray(text[-opt.validate_chars:], dtype=np.int32)
    y = v[1:]

    def xe(q):
        picked = q[np.arange(len(y)), y]
        return float(-np.log2(picked + 1e-30)[opt.skip:].mean())

    per_net, probs = {}, {}
    for path, net in zip(kept_paths, nets):
        prob = member_probs(net, v, warm_laps=opt.warm_laps)
        score = xe(prob)
        per_net[path] = score
        keep = score <= opt.max_solo
        if keep:
            probs[path] = prob
        print(f"{path}: {score:.4f} bits/char"
              f"{'' if keep else '  [dropped > max-solo]'}", flush=True)

    if not probs:
        p.error("every member scored worse than --max-solo")
    mix = xe(combine_probs(np.stack(list(probs.values()))))
    print(f"harvest mixture of {len(probs)}/{len(kept_paths)}: "
          f"{mix:.4f} bits/char")
    if opt.out:
        with open(opt.out, "w") as f:
            json.dump({"text": opt.text,
                       "validate_chars": opt.validate_chars,
                       "warm_laps": opt.warm_laps,
                       "max_solo": opt.max_solo,
                       "per_net": per_net,
                       "members": sorted(probs),
                       "ensemble_mixture": mix}, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
