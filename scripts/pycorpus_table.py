#!/usr/bin/env python
"""Assemble the second-corpus replication table (VERDICT r4 next-step #1).

Collects, for corpus/pycorpus.txt with the erewhon-FROZEN recipe:
  * the reference-binary controls (artifacts/ref_pycorpus/SUMMARY*.txt)
  * the plain frozen-recipe seeds (sweep.json pyc-h199-t8-slow*)
  * the seed-mixture score (artifacts/sweep/ensemble_pyc.json)
  * the distill-ladder students (sweep.json pyc-h*-distill-a50)
and writes artifacts/ref_pycorpus/replication.json with the ordering
check: student < mixture < plain members < reference control.

    PYTHONPATH=/root/repo python scripts/pycorpus_table.py
"""

import json
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def ref_controls():
    out = {}
    for name, key in (("SUMMARY.txt", "defaults"),
                      ("SUMMARY_lr1e-4.txt", "lr1e-4")):
        path = os.path.join(REPO, "artifacts/ref_pycorpus", name)
        if not os.path.exists(path):
            continue
        text = open(path).read()
        m = re.search(r"best v_entropy: ([0-9.]+) at generation (\d+)",
                      text)
        if m:
            out[key] = {"best": float(m.group(1)),
                        "at_gen": int(m.group(2))}
    return out


def sweep_rows(prefix="pyc-"):
    path = os.path.join(REPO, "artifacts/sweep/sweep.json")
    rows = json.load(open(path))["probes"]
    return {r["tag"]: {"best": r["best_v_entropy"],
                       "at_gen": r["best_at_gen"]}
            for r in rows
            if r["tag"].startswith(prefix) and r.get("best_v_entropy")}


def main():
    table = {"corpus": "corpus/pycorpus.txt (deterministic Python-stdlib "
                       "text, 471659 bytes; scripts/make_pycorpus.py)",
             "protocol": "erewhon-frozen recipe, no retuning: h=199 "
                         "noise 0.1, EMA 0.99999, 8 taps, lr 1.6e-4, 3M "
                         "gens; students alpha=0.5 from the 3-seed "
                         "mixture; --find-alphabet-threshold 1e-4 both "
                         "sides; validation = last 10k chars",
             "reference_control": ref_controls(),
             "runs": sweep_rows()}
    ens = os.path.join(REPO, "artifacts/sweep/ensemble_pyc.json")
    if os.path.exists(ens):
        e = json.load(open(ens))
        table["mixture"] = {"score": e.get("ensemble_mixture"),
                            "members": len(e.get("per_net", {}))}
    # the erewhon big-3 analog: the students alone vs the wide mixture
    # (round-4 learning: when members are unequal, wide dilutes)
    for name, key in (("ensemble_students3.json", "students_mixture"),
                      ("ensemble_wide6.json", "wide_mixture")):
        path = os.path.join(REPO, "artifacts/ref_pycorpus", name)
        if os.path.exists(path):
            e = json.load(open(path))
            table[key] = {"score": e.get("ensemble_mixture"),
                          "members": len(e.get("per_net", {}))}
    ctl = table["reference_control"]
    ref_likeforlike = (ctl.get("defaults") or {}).get("best")
    ref_generous = min((v["best"] for v in ctl.values()), default=None)
    plain = [v["best"] for k, v in table["runs"].items()
             if "distill" not in k]
    students = {k: v["best"] for k, v in table["runs"].items()
                if "distill" in k}
    mix = (table.get("mixture") or {}).get("score")
    # the erewhon ordering to replicate: student < mixture < plain
    # members < the like-for-like control (reference at its own defaults,
    # the erewhon-control protocol).  The generous lr1e-4 control is the
    # harder bar, reported separately.
    table["ordering"] = {
        "reference_defaults_control": ref_likeforlike,
        "reference_generous_control": ref_generous,
        "plain_members": sorted(plain),
        "mixture": mix,
        "students": students,
        "holds_vs_defaults_control": bool(
            students and plain and ref_likeforlike
            and min(students.values()) < (mix if mix else min(plain))
            and (mix is None or mix < min(plain))
            and min(plain) < ref_likeforlike),
        "students_beat_generous_control": bool(
            students and ref_generous
            and min(students.values()) < ref_generous),
    }
    smix = (table.get("students_mixture") or {}).get("score")
    wmix = (table.get("wide_mixture") or {}).get("score")
    if smix and students:
        table["ordering"]["students_mixture_beats_best_solo"] = \
            smix < min(students.values())
    if smix and wmix:
        table["ordering"]["wide_mixture_dilutes"] = wmix > smix
    out = os.path.join(REPO, "artifacts/ref_pycorpus/replication.json")
    with open(out, "w") as f:
        json.dump(table, f, indent=1)
    print(json.dumps(table, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
