#!/usr/bin/env python
"""Capacity × regularisation sweep for the erewhon char-LM quality headline.

Round-2 established the h=199 operating point (presynaptic noise 0.1,
multi-tap 256: validation 2.147 bits/char) and diagnosed it as
capacity-limited.  Round-3's first h=399 probe showed the other side:
capacity without matching regularisation overfits (training entropy falls
to 1.45 while validation climbs past 2.5).  This driver runs short probes
over (hidden size × presynaptic noise × weight noise) so the
capacity/regularisation frontier is measured rather than guessed, then the
winner gets a long run.

    PYTHONPATH=/root/repo:/root/.axon_site python scripts/quality_sweep.py \
        --workdir artifacts/sweep --generations 1200000

Each probe is a text-predict subprocess (crash = that probe is marked
failed, the sweep continues — same resilience stance as endurance.py).
Results land in <workdir>/sweep.json.
"""

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from watchdog import STALLED, run_watched

# (tag, extra text-predict args)
PROBES = [
    ("h399-n30", ["--hidden-size", "399", "--presynaptic-noise", "0.3"]),
    ("h199-n20", ["--hidden-size", "199", "--presynaptic-noise", "0.2"]),
    ("h399-n20-w", ["--hidden-size", "399", "--presynaptic-noise", "0.2",
                    "--periodic-weight-noise", "0.002"]),
    ("h799-n40", ["--hidden-size", "799", "--presynaptic-noise", "0.4"]),
    # bottom-layer arms (RNN_NET_FLAG_BOTTOM_LAYER, recur-nn.h:211-227):
    # a 20-wide feed-forward bottleneck below the recurrent layer
    ("h199-b20-n10", ["--hidden-size", "199", "--bottom-layer", "20",
                      "--presynaptic-noise", "0.1"]),
    ("h399-b20-n20", ["--hidden-size", "399", "--bottom-layer", "20",
                      "--presynaptic-noise", "0.2"]),
    # the best operating point with Polyak averaging from scratch
    ("h199-n10-ema", ["--hidden-size", "199", "--presynaptic-noise", "0.1",
                      "--ema-weight", "0.99995"]),
    # seed spread of the headline configuration
    ("h199-n10-ema-s2", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--rng-seed", "2"]),
    ("h199-n10-ema-s3", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--rng-seed", "3"]),
    ("h199-n10-ema-s4", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--rng-seed", "4"]),
    ("h199-n10-ema-s5", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--rng-seed", "5"]),
    # untried levers around the h=199 operating point (round-3 continuation):
    # deeper temporal credit assignment
    ("h199-n10-ema-d60", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.1", "--ema-weight", "0.99995",
                          "--depth", "60"]),
    # slower Polyak horizon (timescale 100k gens) over a longer run
    ("h199-n10-ema-slow", ["--hidden-size", "199", "--presynaptic-noise",
                           "0.1", "--ema-weight", "0.99999",
                           "--stop-after", "3000000",
      "--snapshot-every", "500000"]),
    # noise between the 0.1 and 0.2 arms
    ("h199-n15-ema", ["--hidden-size", "199", "--presynaptic-noise",
                      "0.15", "--ema-weight", "0.99995"]),
    # intermediate capacity between the h=199 floor and the h=399 overfit
    ("h299-n15-ema", ["--hidden-size", "299", "--presynaptic-noise",
                      "0.15", "--ema-weight", "0.99995"]),
    # fewer taps = noisier gradient (learn rate rescaled ~1/S)
    ("h199-n10-ema-t128", ["--hidden-size", "199", "--presynaptic-noise",
                           "0.1", "--ema-weight", "0.99995",
                           "--multi-tap", "128", "--learn-rate", "1e-5"]),
    # more seeds of the headline config: each ~8-minute run adds an
    # ensemble member (the seed-ensemble mixture is the record holder,
    # artifacts/sweep/ensemble.json — 1.94 bits/char with 6 members)
    *[(f"h199-n10-ema-s{s}", ["--hidden-size", "199",
                              "--presynaptic-noise", "0.1",
                              "--ema-weight", "0.99995",
                              "--rng-seed", str(s)])
      for s in range(6, 11)],
    # round-3c: the 128-tap arm beat every 256-tap run (2.1085 vs the
    # 2.1166 record) — fewer taps = noisier summed gradient, which at
    # this capacity generalises better.  Push the lever further (64
    # taps), spread t128 seeds (ensemble members), and give t128 the
    # slow-EMA long-run treatment.
    ("h199-n10-ema-t64", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.1", "--ema-weight", "0.99995",
                          "--multi-tap", "64", "--learn-rate", "2e-5"]),
    *[(f"h199-n10-ema-t128-s{s}", ["--hidden-size", "199",
                                   "--presynaptic-noise", "0.1",
                                   "--ema-weight", "0.99995",
                                   "--multi-tap", "128",
                                   "--learn-rate", "1e-5",
                                   "--rng-seed", str(s)])
      for s in (2, 3, 4)],
    ("h199-n10-ema-t128-slow", ["--hidden-size", "199",
                                "--presynaptic-noise", "0.1",
                                "--ema-weight", "0.99999",
                                "--multi-tap", "128",
                                "--learn-rate", "1e-5",
                                "--stop-after", "3000000",
      "--snapshot-every", "500000"]),
    # ---- round-3g (this session): the tunnel outage killed the previous
    # driver before any of the round-3d/e/f arms ran; re-queued here in
    # PRIORITY order (the done-set skips everything recorded above).
    #
    # The tap lever is monotone so far (256→2.1166, 128→2.1085, 64→2.0675
    # — fewer taps sum a noisier gradient that generalises better).
    # Probe the remaining halvings first: cheap, and they locate the
    # lever's bottom.  LR keeps the ~1/S scaling (5e-6 × 256/S).
    ("h199-n10-ema-t32", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.1", "--ema-weight", "0.99995",
                          "--multi-tap", "32", "--learn-rate", "4e-5"]),
    ("h199-n10-ema-t16", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.1", "--ema-weight", "0.99995",
                          "--multi-tap", "16", "--learn-rate", "8e-5"]),
    ("h199-n10-ema-t8", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--multi-tap", "8", "--learn-rate", "1.6e-4"]),
    # ---- round-3h: t8 set a NEW single-net record (2.0562, still falling
    # at its 1.2M cutoff) and the lever is non-monotone (64 beats 32/16
    # but 8 beats all).  Chase it: the slow-EMA long-run treatment, seeds
    # (is 2.0562 the class mean or a lucky draw?), and the remaining
    # halvings (t4/t2; LR keeps the ~1/S scaling, EMA damps the noise).
    ("h199-n10-ema-t8-slow", ["--hidden-size", "199",
                              "--presynaptic-noise", "0.1",
                              "--ema-weight", "0.99999",
                              "--multi-tap", "8",
                              "--learn-rate", "1.6e-4",
                              "--stop-after", "3000000",
      "--snapshot-every", "500000"]),
    *[(f"h199-n10-ema-t8-s{s}", ["--hidden-size", "199",
                                 "--presynaptic-noise", "0.1",
                                 "--ema-weight", "0.99995",
                                 "--multi-tap", "8",
                                 "--learn-rate", "1.6e-4",
                                 "--rng-seed", str(s)])
      for s in (2, 3)],
    ("h199-n10-ema-t4", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--multi-tap", "4", "--learn-rate", "3.2e-4"]),
    ("h199-n10-ema-t2", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--multi-tap", "2", "--learn-rate", "6.4e-4"]),
    # PRIORITY (round-3i): distill from the 7 strongest .best snapshots
    # into a student at the record operating point — the teacher mixture
    # itself scores ~1.90, so a student that tracks it is the best shot
    # at a single net under 2.0.  Early results let a follow-up arm run
    # within the round.
    ("h199-distill-strong-t8",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "1.0",
      "--stop-after", "3000000",
      "--snapshot-every", "500000"]
     + [x for t in ("t8-slow", "t8", "t64", "t32", "t16",
                    "t128-s3", "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
    ("h199-distill-strong-t8-a50",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000",
      "--snapshot-every", "500000"]
     + [x for t in ("t8-slow", "t8", "t64", "t32", "t16",
                    "t128-s3", "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
    # ---- round-3j: the alpha=1.0 strong-teacher distill set the record
    # (2.0356) with a MONOTONE descent ending at its 3M cutoff — continue
    # the same run (reload; the later --filename overrides the driver's
    # tag-derived one).  EMA restarts from the reloaded raw weights and
    # re-equilibrates in ~300k gens; .best is guarded by its sidecar.
    # a50 descends FASTER (2.0298 at 1.4M vs alpha-1.0's 2.0599 at 1.6M —
    # the hard-label half keeps the gradient grounded): continue IT first
    ("h199-distill-strong-t8-a50-cont",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "6000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h199-distill-strong-t8-a50.net"]
     + [x for t in ("t8-slow", "t8", "t64", "t32", "t16",
                    "t128-s3", "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
    # ---- round-3k: a50 BROKE THE 2.0 WALL — 1.9894 at 2.95M gens,
    # still falling at the cutoff (the -cont arm above extends it).
    # Seed-spread the record recipe: each ~35-min run is another
    # sub-2.0 candidate AND a decorrelated ensemble member (different
    # init + different data order under the same teachers).
    *[(f"h199-distill-strong-t8-a50-s{s}",
       ["--hidden-size", "199", "--presynaptic-noise", "0.1",
        "--ema-weight", "0.99999", "--multi-tap", "8",
        "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
        "--stop-after", "3000000", "--snapshot-every", "500000",
        "--rng-seed", str(s)]
       + [x for t in ("t8-slow", "t8", "t64", "t32", "t16",
                      "t128-s3", "t128-s4")
          for x in ("--distill-from",
                    f"artifacts/sweep/h199-n10-ema-{t}.net.best")])
      for s in (2, 3)],
    # generation-2 self-distillation: the gen-1 a50 student (now the
    # strongest single net, 1.9894) joins the teacher set with the best
    # 8-tap seeds — the classic born-again ratchet, at the winning
    # alpha=0.5 blend
    ("h199-distill-gen2",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--distill-from",
      "artifacts/sweep/h199-distill-strong-t8-a50.net.best",
      "--distill-from", "artifacts/sweep/h199-distill-strong-t8.net.best"]
     + [x for t in ("t8-slow", "t8", "t8-s2", "t8-s3", "t64",
                    "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
    # the alpha=1.0 continuation, demoted behind the a50-class arms
    # (a50 descends faster and lands lower at every checkpoint)
    ("h199-distill-strong-t8-cont",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "1.0",
      "--stop-after", "6000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h199-distill-strong-t8.net"]
     + [x for t in ("t8-slow", "t8", "t64", "t32", "t16",
                    "t128-s3", "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
    # interactions at the t8 record class: noise and BPTT depth
    ("h199-n15-ema-t8", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.15", "--ema-weight", "0.99995",
                         "--multi-tap", "8", "--learn-rate", "1.6e-4"]),
    ("h199-n10-ema-t8-d60", ["--hidden-size", "199",
                             "--presynaptic-noise", "0.1",
                             "--ema-weight", "0.99995",
                             "--multi-tap", "8", "--learn-rate", "1.6e-4",
                             "--depth", "60"]),
    # ---- round-3i: t8-slow set the single-net record (2.0423 at 1.88M
    # gens, slow EMA 0.99999 over 3M).  Chase THAT class directly:
    # seed-spread it (record chance + top-tier ensemble members), probe
    # the unmeasured interactions at 8 taps (lower noise — the 8-tap
    # gradient is itself noisy, maybe 0.1 presynaptic is now too much;
    # capacity — h=299 overfit at 256 taps but the noisier gradient may
    # regularise it), and distill from the 7 strongest .best snapshots
    # into a student at the record operating point.
    *[(f"h199-n10-ema-t8-slow-s{s}", ["--hidden-size", "199",
                                      "--presynaptic-noise", "0.1",
                                      "--ema-weight", "0.99999",
                                      "--multi-tap", "8",
                                      "--learn-rate", "1.6e-4",
                                      "--stop-after", "3000000",
                                      "--snapshot-every", "500000",
                                      "--rng-seed", str(s)])
      for s in (2, 3)],
    ("h199-n05-ema-t8", ["--hidden-size", "199", "--presynaptic-noise",
                         "0.05", "--ema-weight", "0.99995",
                         "--multi-tap", "8", "--learn-rate", "1.6e-4"]),
    ("h299-n10-ema-t8", ["--hidden-size", "299", "--presynaptic-noise",
                         "0.1", "--ema-weight", "0.99995",
                         "--multi-tap", "8", "--learn-rate", "1.6e-4"]),
    # t64 is the single-net record class (2.0675): seed-spread it (record
    # chances + ensemble members at the strongest operating point)
    *[(f"h199-n10-ema-t64-s{s}", ["--hidden-size", "199",
                                  "--presynaptic-noise", "0.1",
                                  "--ema-weight", "0.99995",
                                  "--multi-tap", "64",
                                  "--learn-rate", "2e-5",
                                  "--rng-seed", str(s)])
      for s in (2, 3, 4, 5)],
    # t64's best was still falling at its 1M-gen cutoff — the slow-EMA
    # long-run treatment (t128-slow improved its class the same way)
    ("h199-n10-ema-t64-slow", ["--hidden-size", "199",
                               "--presynaptic-noise", "0.1",
                               "--ema-weight", "0.99999",
                               "--multi-tap", "64",
                               "--learn-rate", "2e-5",
                               "--stop-after", "3000000",
      "--snapshot-every", "500000"]),
    # ensemble distillation: a fresh student against 6 diverse seed-
    # ensemble members as in-graph teachers.  The short a50 arm hit
    # 2.0716 with its best still falling at the 1.2M cutoff (result from
    # the pre-outage session; its artifacts were lost) — the long
    # slow-EMA version is the priority distill arm.
    ("h199-distill-a50-long",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--distill-alpha", "0.5",
      "--stop-after", "4000000",
      "--snapshot-every", "500000"]
     + [x for t in ("t128", "s3", "s7", "s9", "d60", "slow")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.ema")]),
    # distill from the 6 BEST members (t64's .best record snapshot
    # replaces s7), student at the record-holding 64-tap operating point
    ("h199-distill-best-t64-a100",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99995", "--multi-tap", "64",
      "--learn-rate", "2e-5", "--distill-alpha", "1.0",
      "--distill-from", "artifacts/sweep/h199-n10-ema-t64.net.best"]
     + [x for t in ("t128", "s3", "s9", "d60", "slow")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.ema")]),
    # the student at the 128-tap operating point, and a softened-teacher
    # arm (temp 2 spreads the mixture's tails, the classic Hinton setting)
    ("h199-distill-t128-a50",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99995", "--multi-tap", "128",
      "--learn-rate", "1e-5", "--distill-alpha", "0.5"]
     + [x for t in ("t128", "s3", "s7", "s9", "d60", "slow")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.ema")]),
    ("h199-distill-a100-temp2",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99995", "--distill-alpha", "1.0",
      "--distill-temp", "2.0"]
     + [x for t in ("t128", "s3", "s7", "s9", "d60", "slow")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.ema")]),
    # re-runs of the short arms whose artifacts the outage ate (lowest
    # priority: each adds an ensemble member)
    *[(f"h199-distill-a{int(a * 100)}",
       ["--hidden-size", "199", "--presynaptic-noise", "0.1",
        "--ema-weight", "0.99995", "--distill-alpha", str(a)]
       + [x for t in ("t128", "s3", "s7", "s9", "d60", "slow")
          for x in ("--distill-from",
                    f"artifacts/sweep/h199-n10-ema-{t}.net.ema")])
      for a in (0.5, 1.0)],
    # ---- round-3g follow-ups: the tap lever bottoms at 64 (t32 ties at
    # 2.0706) — explore the cells AROUND the record class instead of
    # halving further.  Noise × taps and capacity × taps are unmeasured
    # interactions (all noise/capacity arms so far ran at 256 taps).
    ("h199-n15-ema-t64", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.15", "--ema-weight", "0.99995",
                          "--multi-tap", "64", "--learn-rate", "2e-5"]),
    ("h199-n05-ema-t64", ["--hidden-size", "199", "--presynaptic-noise",
                          "0.05", "--ema-weight", "0.99995",
                          "--multi-tap", "64", "--learn-rate", "2e-5"]),
    # h=299 overfits at 256 taps (2.1646); the noisier 64-tap gradient may
    # be the regulariser that lets extra capacity pay
    ("h299-n15-ema-t64", ["--hidden-size", "299", "--presynaptic-noise",
                          "0.15", "--ema-weight", "0.99995",
                          "--multi-tap", "64", "--learn-rate", "2e-5"]),
    # distill from the strongest, most diverse teacher set available
    # after the round-3g arms: the record-class .best snapshots (t64 +
    # its seeds + the t32/t16 lever probes + the two best t128 seeds),
    # student at the record operating point with the slow-EMA long-run
    # treatment
    ("h199-distill-strong-t64",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "64",
      "--learn-rate", "2e-5", "--distill-alpha", "1.0",
      "--stop-after", "3000000",
      "--snapshot-every", "500000"]
     + [x for t in ("t64", "t64-s2", "t64-s3", "t32", "t16",
                    "t128-s3", "t128-s4")
        for x in ("--distill-from",
                  f"artifacts/sweep/h199-n10-ema-{t}.net.best")]),
]


def _curated_teachers(artifact="ensemble_best35.json"):
    """The exact members of a committed mixture record as
    --distill-from args.

    Raises instead of returning [] on a missing/corrupt artifact
    (ADVICE r4: a silent [] made distill-tagged arms train PLAIN nets
    and record them under a distill tag).  The queue is built at import
    time, so a missing teacher mixture fails the driver launch loudly —
    which is the desired behaviour: every artifact named here is a
    committed record."""
    path = os.path.join(REPO, "artifacts/sweep", artifact)
    try:
        members = sorted(json.load(open(path))["per_net"])
    except (OSError, ValueError, KeyError) as e:
        raise RuntimeError(
            f"distill teacher mixture {artifact} missing/unreadable "
            f"({e!r}) — refusing to build a distill arm with no teachers")
    missing = [m for m in members
               if not os.path.exists(os.path.join(REPO, m))]
    if missing:
        raise RuntimeError(
            f"distill teacher mixture {artifact} names missing nets: "
            f"{missing}")
    return [x for m in members for x in ("--distill-from", m)]


_curated_35_teachers = _curated_teachers


# ---- round-4 arms (VERDICT r3 next-steps #3): chase a single
# reference-format net <= 1.95.  The gen-1 a50 student (7 .best teachers)
# reached 1.9778 at its 6M cutoff with the descent nearly flat; the
# teachers' own mixture scores ~2.0, so the student is close to exhausting
# that target.  The CURATED 35 mixture scores 1.9003 — distill from IT
# (all 35 in-graph; ~2x step cost, still ~70 min per 3M gens).
# PREPENDED (round-4 session 2): these are the highest-value open arms —
# run them before the leftover exploration queue (the done-set skips
# completed tags, so reordering is safe).
PROBES[:0] = [
    # ---- round-4g: the h=1599 student of the 41-member mixture tracked
    # BELOW the record h=799 student at every checkpoint of its fresh
    # leg (1.9205 vs 1.9366 at 600k, 1.9033 vs ~1.92 at 680k) — the
    # capacity ladder under soft targets is still monotone.  Continue it
    # (reload; the trend schedule exhausts a continuation ~2M gens after
    # reload, so stop at 4M), and give the 1.8418 big-3 teacher a
    # student at this capacity too.  A second h=799 big-3 seed feeds the
    # strong-member mixture pool.
    ("h1599-distill-best41-a50-cont",
     ["--hidden-size", "1599", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "4000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h1599-distill-best41-a50.net"]
     + _curated_teachers("ensemble_best41.json")),
    ("h1599-distill-big3-a50",
     ["--hidden-size", "1599", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "2000000", "--snapshot-every", "500000",
      "--rng-seed", "3"]
     + _curated_teachers("ensemble_big3.json")),
    ("h799-distill-big3-a50-s4",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "4"]
     + _curated_teachers("ensemble_big3.json")),
    # ---- round-4f: gen-2 distillation from the BIG-3 mixture.  The three
    # h>199 students mix to 1.8418 (ensemble_big3.json) — a better teacher
    # than the 41-member set (1.8973) at ~1/13th the in-graph teacher
    # cost.  Students of a better mixture landed lower at every teacher
    # upgrade so far (7-strong 1.9783 -> 35-curated 1.9645 -> 41 1.9160/
    # 1.8778 at h399/h799).
    ("h799-distill-big3-a50",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "3"]
     + _curated_teachers("ensemble_big3.json")),
    ("h399-distill-big3-a50",
     ["--hidden-size", "399", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "3"]
     + _curated_teachers("ensemble_big3.json")),
    ("h399-distill-best41-a50-s2-cont",
     ["--hidden-size", "399", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "6000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h399-distill-best41-a50-s2.net"]
     + _curated_teachers("ensemble_best41.json")),
    # ---- round-4e: the capacity ladder under the 41-teacher soft-target
    # mixture is monotone — 1.9645 (h=199) -> 1.9160 (h=399) -> 1.8778
    # (h=799) — while DIRECT training at these sizes overfits (2.22 /
    # 2.30).  Take the next rung.  h=1599 pays ~4x the h=799 recurrent
    # matmul; stop at 2M gens (every bigger student's .best landed in
    # the first half of its leg: h=399 at 2.6M/3M, h=799 at 1.37M/3M).
    ("h1599-distill-best41-a50",
     ["--hidden-size", "1599", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "2000000", "--snapshot-every", "500000"]
     + _curated_teachers("ensemble_best41.json")),
    # seed spread of the record h=799 recipe: recipe-vs-draw evidence and
    # a strong decorrelated ensemble member in one run
    ("h799-distill-best41-a50-s2",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "2"]
     + _curated_teachers("ensemble_best41.json")),
    # ---- round-4d: capacity FLIPS under distillation (h=399 student
    # 1.9160 vs the best h=199 student's 1.9645, both from the 41-member
    # mixture).  Push the lever to h=799 (direct training overfits to
    # 2.30; the soft-target regulariser is the different regime), spread
    # the h=399 recipe's seed, and pre-queue their reload continuations
    # (stop 6M: the trend schedule exhausts a continuation ~2M gens
    # after reload — the h399-cont's LR hit its 1e-7 floor by 4.8M).
    ("h799-distill-best41-a50",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000"]
     + _curated_teachers("ensemble_best41.json")),
    ("h399-distill-best41-a50-s2",
     ["--hidden-size", "399", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "2"]
     + _curated_teachers("ensemble_best41.json")),
    ("h799-distill-best41-a50-cont",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "6000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h799-distill-best41-a50.net"]
     + _curated_teachers("ensemble_best41.json")),
    # round-4c: the h=399 student descends steeply through its 3M cutoff
    # (1.9182@2.36M, already below the mixture-of-teachers' half-way
    # point): continue to 9M
    ("h399-distill-best41-a50-cont",
     ["--hidden-size", "399", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "9000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h399-distill-best41-a50.net"]
     + _curated_teachers("ensemble_best41.json")),
    # round-4b: a BIGGER student for the record 41-member mixture.
    # Direct h=399 training overfits (2.19+ at every tried noise), but
    # distillation's soft-target regularisation is a different regime —
    # the h=199 student landed 0.97x its teachers' own mixture score;
    # h=399 has the capacity to get closer to the mixture's 1.8973.
    ("h399-distill-best41-a50",
     ["--hidden-size", "399", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000"]
     + _curated_teachers("ensemble_best41.json")),
    # the 35-teacher a50 student kept descending through its 6M cutoff
    # (1.9905@3M -> 1.9656@5.83M, the single-net record): continue to 9M
    ("h199-distill-best35-a50-cont2",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "9000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h199-distill-best35-a50.net"]
     + _curated_35_teachers()),
    ("h199-distill-best35-a50",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000"]
     + _curated_35_teachers()),
    # pure-KL arm at the same teacher set: the richer 35-teacher mixture
    # target may not need the hard-label grounding that won at 7 teachers
    ("h199-distill-best35-a100",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "1.0",
      "--stop-after", "3000000", "--snapshot-every", "500000"]
     + _curated_35_teachers()),
    # continue the 35-teacher a50 student if it is still falling at 3M
    ("h199-distill-best35-a50-cont",
     ["--hidden-size", "199", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "6000000", "--snapshot-every", "500000",
      "--reload",
      "--filename", "artifacts/sweep/h199-distill-best35-a50.net"]
     + _curated_35_teachers()),
]


# ---- round-5 arms (VERDICT r4 next-steps #1/#6/#7).
#
# #1 second-corpus replication: corpus/pycorpus.txt (deterministic Python-
# stdlib text, 471,659 bytes — scale-matched to erewhon) with the erewhon-
# FROZEN record recipe (h=199, noise 0.1, slow EMA 0.99999, 8 taps,
# lr 1.6e-4, 3M gens) — no retuning; the only corpus-specific flags are the
# corpus path and alphabet discovery (--find-alphabet-threshold 1e-4, the
# reference's own machinery for a new corpus, run identically on the
# reference-binary control).  Four seeds = plain baseline + mixture
# members; then the distill ladder (h199 -> h399 -> h799 students of the
# 4-member mixture) checks the ordering student < ensemble-member <
# reference control transfers.
#
# #6 schedule-limit test: reload the h=799 record (1.8778 at 1.37M, LR
# floor-pinned by 2.95M) with a 10x lower trend floor AND slower decay —
# either a new record (schedule-limited) or a committed flat negative
# (data-limited).
_PYC = ["--text", "corpus/pycorpus.txt", "--find-alphabet-threshold",
        "1e-4"]
_FROZEN = ["--hidden-size", "199", "--presynaptic-noise", "0.1",
           "--ema-weight", "0.99999", "--multi-tap", "8",
           "--learn-rate", "1.6e-4", "--stop-after", "3000000",
           "--snapshot-every", "500000"]
# dynamic: the queue re-executes at every leg boundary, so this picks up
# whichever seed .bests exist by the time a student arm launches (the
# wanted-order guarantees at least the base seed does; a cut s4 must not
# become a missing --distill-from crash)
_PYC_TEACHERS = [
    x for s in ("", "-s2", "-s3", "-s4")
    if os.path.exists(os.path.join(
        REPO, f"artifacts/sweep/pyc-h199-t8-slow{s}.net.best"))
    for x in ("--distill-from",
              f"artifacts/sweep/pyc-h199-t8-slow{s}.net.best")]
PROBES[:0] = [
    ("pyc-h199-t8-slow", _PYC + _FROZEN),
    # VERDICT #7: the big-3 mixture (1.8418) distilled into one h=799 net
    # (same args as the round-4g entry below; re-specified here to run
    # early — first duplicate tag wins, the done-set keeps them single)
    ("h799-distill-big3-a50",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "3000000", "--snapshot-every", "500000",
      "--rng-seed", "3"]
     + _curated_teachers("ensemble_big3.json")),
    ("pyc-h199-t8-slow-s2", _PYC + _FROZEN + ["--rng-seed", "2"]),
    ("pyc-h199-t8-slow-s3", _PYC + _FROZEN + ["--rng-seed", "3"]),
    # pycorpus distill ladder: students of the pyc seed mixture at the
    # erewhon-frozen recipe (alpha 0.5 / 8 taps / slow EMA).  Ordered
    # BEFORE the floor arm and the 4th seed: with ~6.5h of round left at
    # 01:00, the ladder (VERDICT #1's "Done=") must land; the floor arm
    # (#6) and s4 are the first cuts if the clock wins.
    ("pyc-h199-distill-a50",
     _PYC + _FROZEN + ["--distill-alpha", "0.5"] + _PYC_TEACHERS),
    ("pyc-h399-distill-a50",
     _PYC + _FROZEN[2:] + ["--hidden-size", "399",
                           "--distill-alpha", "0.5"] + _PYC_TEACHERS),
    ("pyc-h799-distill-a50",
     _PYC + _FROZEN[2:] + ["--hidden-size", "799",
                           "--distill-alpha", "0.5"] + _PYC_TEACHERS),
    # VERDICT #6: is 1.8778 schedule-limited?  Continue the record from
    # its .best with floor 1e-8 (10x lower) and decay 0.8 (vs 0.5)
    ("h799-distill-best41-a50-floor",
     ["--hidden-size", "799", "--presynaptic-noise", "0.1",
      "--ema-weight", "0.99999", "--multi-tap", "8",
      "--learn-rate", "1.6e-4", "--distill-alpha", "0.5",
      "--stop-after", "4500000", "--snapshot-every", "500000",
      "--learn-rate-min", "1e-8", "--learn-rate-scale", "0.8",
      "--reload",
      "--filename", "artifacts/sweep/h799-distill-best41-a50.net"]
     + _curated_teachers("ensemble_best41.json")),
    # round-5 slack: the pyc h=799 student descends through 1.7608 at
    # 1.77M — continue past its 3M cutoff exactly as the erewhon
    # students were (reload + fresh LR runway; the trend schedule
    # exhausts ~2M gens after reload, so 6M is ample budget)
    ("pyc-h799-distill-a50-cont",
     _PYC + _FROZEN[2:] + ["--hidden-size", "799",
                           "--distill-alpha", "0.5",
                           "--stop-after", "6000000", "--reload",
                           "--filename",
                           "artifacts/sweep/pyc-h799-distill-a50.net"]
     + _PYC_TEACHERS),
    ("pyc-h199-t8-slow-s4", _PYC + _FROZEN + ["--rng-seed", "4"]),
    # round-5 slack #2: the pyc ladder's 4th rung.  The erewhon ladder
    # flattened at h=1599 (1.8754 vs h799's 1.8778); the pyc rungs are
    # BIGGER (1.9280 -> 1.7990 -> 1.7507), so the flatten point is an
    # open question there.  Frozen recipe, same 3-seed teachers; 2.5M
    # cutoff sized to land inside the round (snapshots every 500k make
    # even a clock-kill recordable)
    ("pyc-h1599-distill-a50",
     _PYC + _FROZEN[2:] + ["--hidden-size", "1599",
                           "--distill-alpha", "0.5",
                           "--stop-after", "2500000"] + _PYC_TEACHERS),
]

# ---- round-5 endgame gate: everything below the round-5 arms is round-4
# leftover exploration (2h+ legs at this point in the round).  Truncate
# the queue to the must-land arms so the driver EXITS at the next leg
# boundary instead of starting a leftover leg — the surgery window
# (stabilised classify_hard run, pyc/big-4 ensemble evals, reference-
# binary cross-check, test-suite refresh) needs the TPU and the one CPU.
# s4 is the first clock cut (3 plain seeds already feed the mixture and
# the replication table).  To run an endgame filler leg afterwards,
# relaunch with --probes <tag> after widening this keep-set.
_R5_KEEP = {
    "pyc-h799-distill-a50",
    "h799-distill-best41-a50-floor",
    "pyc-h799-distill-a50-cont",
    "pyc-h1599-distill-a50",
}
PROBES[:] = [(t, a) for t, a in PROBES if t in _R5_KEEP]



def wait_for_tpu(probe_timeout: float = 300.0, interval: float = 120.0,
                 max_wait: float = 14400.0) -> bool:
    """Block until a trivial axon computation succeeds in a fresh process.

    The tunnel has two failure modes (CLAUDE.md): a wedge, where the first
    compile RPC hangs forever (the probe times out), and an outage, where
    backend init fails fast with UNAVAILABLE (the probe exits nonzero).
    Gating each leg launch on this probe turns futile 25-minute watchdog
    cycles against a dead endpoint into cheap 2-minute polls that resume
    training the moment the device returns."""
    probe = [sys.executable, "-c",
             "import jax, jax.numpy as jnp; "
             "assert jax.default_backend() != 'cpu', 'fell back to CPU'; "
             "print(float(jnp.ones(3).sum()))"]
    t0 = time.time()
    while time.time() - t0 < max_wait:
        try:
            r = subprocess.run(probe, timeout=probe_timeout,
                               capture_output=True, cwd=REPO)
            if r.returncode == 0:
                return True
            msg = (r.stderr or b"").decode(errors="replace").strip()
            print(f"tpu probe failed ({msg.splitlines()[-1][:120] if msg else 'rc=%d' % r.returncode}); "
                  f"retrying in {int(interval)}s", flush=True)
        except subprocess.TimeoutExpired:
            print(f"tpu probe hung {int(probe_timeout)}s (wedged tunnel); "
                  f"retrying in {int(interval)}s", flush=True)
        time.sleep(interval)
    return False


def maybe_resume(cmd, repo=REPO):
    """Continue a previous attempt of this tag instead of restarting at
    generation 0 (round-5: a watchdog-killed pyc leg restarted fresh and
    threw away 1.8M generations; only the .best sidecar survived because
    the fresh net overwrote the .net).

    For arms without --reload: if the tag's net file (or its committed
    .best snapshot) exists, append --reload (copying .best in if needed).
    A completed tag never reaches here (the done-set skips it), so an
    existing artifact always means an interrupted attempt.  Arms that
    already carry --reload keep the seed_reload_target behaviour.
    Returns a description of the resume source, or None."""
    idxs = [i for i, a in enumerate(cmd) if a == "--filename"]
    if not idxs or idxs[-1] + 1 >= len(cmd):
        return None
    target = cmd[idxs[-1] + 1]
    tpath = os.path.join(repo, target)
    if "--reload" in cmd:
        return seed_reload_target(cmd, repo)
    if os.path.exists(tpath):
        cmd.append("--reload")
        return target
    if os.path.exists(tpath + ".best"):
        import shutil
        shutil.copyfile(tpath + ".best", tpath)
        cmd.append("--reload")
        return target + ".best"
    return None


def seed_reload_target(cmd, repo=REPO):
    """If a --reload arm's target net is missing but its .best snapshot
    exists, copy the snapshot in so the leg continues from the committed
    record instead of restarting at generation 0.  (Plain .net files are
    gitignored; a fresh session only has the .best/.ema snapshots.)

    Scans the FULLY ASSEMBLED command (driver defaults + probe extras +
    opt.extra) and honours argparse's last-wins rule for repeated
    --filename, so arms that rely on the driver-default filename or get
    --reload via opt.extra are seeded too.  Returns the seed path used,
    or None."""
    if "--reload" not in cmd:
        return None
    idxs = [i for i, a in enumerate(cmd) if a == "--filename"]
    if not idxs or idxs[-1] + 1 >= len(cmd):
        return None
    target = cmd[idxs[-1] + 1]
    tpath = os.path.join(repo, target)
    if os.path.exists(tpath) or not os.path.exists(tpath + ".best"):
        return None
    import shutil
    shutil.copyfile(tpath + ".best", tpath)
    return target + ".best"


def best_v_entropy(log_path: str):
    best, best_gen, gen = None, 0, 0
    try:
        with open(log_path) as f:
            for line in f:
                if line.startswith("generation "):
                    gen = int(float(line.split()[1]))
                elif line.startswith("v_entropy "):
                    v = float(line.split()[1])
                    if best is None or v < best:
                        best, best_gen = v, gen
    except OSError:
        return None, 0
    return best, best_gen


def load_probes():
    """Re-read the probe queue from this file on disk.

    Round-4's driver24 skipped freshly queued arms because PROBES was
    loaded once at launch (CLAUDE.md round-4 learnings); re-executing
    the file at every leg boundary makes committed queue edits take
    effect without driver surgery."""
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "_quality_sweep_queue", os.path.abspath(__file__))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod.PROBES


def _read_results(record_path):
    if os.path.exists(record_path):
        return json.load(open(record_path)).get("probes", [])
    return []


def _write_results(record_path, opt, results):
    import tempfile
    fd, tmp = tempfile.mkstemp(dir=os.path.dirname(record_path) or ".")
    with os.fdopen(fd, "w") as f:
        json.dump({"generations": opt.generations,
                   "multi_tap": opt.multi_tap,
                   "learn_rate": opt.learn_rate,
                   "probes": results}, f, indent=1)
    os.replace(tmp, record_path)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--workdir", default="artifacts/sweep")
    p.add_argument("--generations", type=int, default=1_200_000)
    p.add_argument("--multi-tap", type=int, default=256)
    p.add_argument("--learn-rate", type=float, default=5e-6)
    p.add_argument("--probes", default=None,
                   help="comma-separated probe tags to run (default: all)")
    p.add_argument("extra", nargs="*", help="extra args for every probe")
    opt = p.parse_args(argv)

    os.makedirs(opt.workdir, exist_ok=True)
    record_path = os.path.join(opt.workdir, "sweep.json")
    wanted = set(opt.probes.split(",")) if opt.probes else None
    with open("/tmp/sweep.pid", "w") as f:
        f.write(str(os.getpid()))

    while True:
        # re-read queue AND done-set at every leg boundary: queue edits
        # and out-of-band sweep_record.py appends both take effect
        try:
            probes = load_probes()
        except Exception as e:
            print(f"queue reload failed ({e!r}); keeping the last good "
                  "queue", flush=True)
            probes = PROBES
        results = _read_results(record_path)
        done = {r["tag"] for r in results if r.get("best_v_entropy")}
        todo = [(t, x) for t, x in probes
                if t not in done and (wanted is None or t in wanted)]
        if not todo:
            break
        tag, extra = todo[0]
        log = os.path.join(opt.workdir, f"{tag}.log")
        cmd = [sys.executable, "-m", "recur_tpu.cli.text_predict",
               "--multi-tap", str(opt.multi_tap),
               "--learn-rate", str(opt.learn_rate),
               "--history-dtype", "bfloat16", "--unroll", "4",
               "--validate-chars", "10000",
               "--learn-rate-inertia", "120",
               "--learn-rate-schedule", "trend",
               "--learn-rate-min", "1e-7",
               "--stop-after", str(opt.generations),
               "--filename", os.path.join(opt.workdir, f"{tag}.net"),
               "--log-file", log, "--quiet"] + extra + opt.extra
        t0 = time.time()
        print(f"sweep probe {tag}: {' '.join(extra)}", flush=True)
        # stall watchdog: a wedged tunnel hangs a fresh process forever
        # (no log output, no CPU); kill + retry.  A dropped tunnel instead
        # crashes the leg fast (UNAVAILABLE/FAILED_PRECONDITION, rc!=0).
        # Every attempt is gated on a cheap health probe so a dead endpoint
        # costs 2-minute polls, not 25-minute watchdog cycles.
        rc = STALLED
        for attempt in range(6):
            if not wait_for_tpu():
                print(f"sweep probe {tag}: tpu never came back; giving up",
                      flush=True)
                break
            # per-attempt resume: attempt 0 may continue an interrupted
            # previous session's artifact; later attempts continue this
            # leg's own saves instead of restarting at generation 0
            attempt_cmd = list(cmd)
            src = maybe_resume(attempt_cmd)
            if src:
                print(f"sweep probe {tag}: resuming from {src}",
                      flush=True)
            rc = run_watched(attempt_cmd, log, cwd=REPO)
            if rc == 0:
                break
            kind = "stalled" if rc == STALLED else f"died rc={rc}"
            print(f"sweep probe {tag}: {kind} (attempt {attempt + 1}); "
                  "waiting for the tunnel to heal then retrying",
                  flush=True)
            time.sleep(120)
        best, best_gen = best_v_entropy(log)
        # re-read before appending: the leg ran for up to an hour and an
        # out-of-band recorder (sweep_record.py) may have written meanwhile
        results = _read_results(record_path)
        results.append({"tag": tag, "rc": rc,
                        "best_v_entropy": best, "best_at_gen": best_gen,
                        "seconds": round(time.time() - t0, 1)})
        print(f"sweep probe {tag}: best v_entropy {best} "
              f"at gen {best_gen}", flush=True)
        _write_results(record_path, opt, results)
    print(json.dumps(_read_results(record_path)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
