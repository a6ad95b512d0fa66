"""scripts/pycorpus_table.py — the second-corpus replication assembly.

Round-5 regression: the mixture row read the wrong key from
ensemble_eval's JSON ("ensemble" vs "ensemble_mixture") and silently
reported null.  These tests pin the assembly — controls parsed from the
reference SUMMARY files, runs from sweep.json, the mixture score, and
the ordering booleans — against a synthetic artifacts tree.
"""

import importlib.util
import json
import os

import pytest


@pytest.fixture
def table(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "pycorpus_table", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "pycorpus_table.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    sweep = tmp_path / "artifacts" / "sweep"
    sweep.mkdir(parents=True)
    ref = tmp_path / "artifacts" / "ref_pycorpus"
    ref.mkdir(parents=True)
    (ref / "SUMMARY.txt").write_text(
        "reference binary at defaults\n"
        "best v_entropy: 2.2045 at generation 1080320\n")
    (ref / "SUMMARY_lr1e-4.txt").write_text(
        "best v_entropy: 1.9674 at generation 10838016\n")
    (sweep / "sweep.json").write_text(json.dumps({"probes": [
        # erewhon rows must not leak into the pyc table
        {"tag": "h199-n10-ema", "best_v_entropy": 2.1296,
         "best_at_gen": 1025024},
        {"tag": "pyc-h199-t8-slow", "best_v_entropy": 2.0629,
         "best_at_gen": 1357824},
        {"tag": "pyc-h199-t8-slow-s2", "best_v_entropy": 2.0261,
         "best_at_gen": 1628160},
        {"tag": "pyc-h199-distill-a50", "best_v_entropy": 1.928,
         "best_at_gen": 2891776},
        {"tag": "pyc-h399-distill-a50", "best_v_entropy": 1.799,
         "best_at_gen": 2937856},
        # a failed retry row (no best) must be dropped, not crash
        {"tag": "pyc-h799-distill-a50", "best_v_entropy": None,
         "best_at_gen": 0},
    ]}))
    (sweep / "ensemble_pyc.json").write_text(json.dumps(
        {"ensemble_mixture": 1.9044, "per_net": {"a": 1, "b": 2, "c": 3}}))
    (ref / "ensemble_students3.json").write_text(json.dumps(
        {"ensemble_mixture": 1.7193, "per_net": {"a": 1, "b": 2, "c": 3}}))
    (ref / "ensemble_wide6.json").write_text(json.dumps(
        {"ensemble_mixture": 1.7713,
         "per_net": {k: 1 for k in "abcdef"}}))
    return mod


def test_assembly_and_ordering(table, tmp_path):
    assert table.main() == 0
    out = json.load(open(
        tmp_path / "artifacts" / "ref_pycorpus" / "replication.json"))
    assert out["reference_control"]["defaults"]["best"] == 2.2045
    assert out["reference_control"]["lr1e-4"]["best"] == 1.9674
    assert set(out["runs"]) == {"pyc-h199-t8-slow", "pyc-h199-t8-slow-s2",
                                "pyc-h199-distill-a50",
                                "pyc-h399-distill-a50"}
    # the round-5 regression: the mixture score must come through
    assert out["mixture"] == {"score": 1.9044, "members": 3}
    o = out["ordering"]
    assert o["plain_members"] == [2.0261, 2.0629]
    assert o["students"]["pyc-h399-distill-a50"] == 1.799
    assert o["mixture"] == 1.9044
    # 1.799 < 1.9044 < 2.0261 < 2.2045
    assert o["holds_vs_defaults_control"] is True
    assert o["students_beat_generous_control"] is True  # 1.799 < 1.9674
    # round-5 big-3 analog rows: students-only mixture beats the best
    # solo, and widening with the plain seeds dilutes
    assert out["students_mixture"] == {"score": 1.7193, "members": 3}
    assert out["wide_mixture"] == {"score": 1.7713, "members": 6}
    assert o["students_mixture_beats_best_solo"] is True  # 1.7193 < 1.799
    assert o["wide_mixture_dilutes"] is True  # 1.7713 > 1.7193


def test_ordering_fails_when_student_above_mixture(table, tmp_path):
    sweep = tmp_path / "artifacts" / "sweep"
    rows = json.load(open(sweep / "sweep.json"))
    rows["probes"] = [r for r in rows["probes"]
                      if r["tag"] != "pyc-h399-distill-a50"]
    (sweep / "sweep.json").write_text(json.dumps(rows))
    # only the h199 student (1.928) remains: above the mixture (1.9044),
    # so the strict student < mixture ordering must report False
    assert table.main() == 0
    out = json.load(open(
        tmp_path / "artifacts" / "ref_pycorpus" / "replication.json"))
    assert out["ordering"]["holds_vs_defaults_control"] is False
    assert out["ordering"]["students_beat_generous_control"] is True


def test_no_mixture_artifact(table, tmp_path):
    os.remove(tmp_path / "artifacts" / "sweep" / "ensemble_pyc.json")
    assert table.main() == 0
    out = json.load(open(
        tmp_path / "artifacts" / "ref_pycorpus" / "replication.json"))
    assert "mixture" not in out or out.get("mixture") is None
    # the ordering then compares students against the plain floor
    assert out["ordering"]["mixture"] is None
    assert out["ordering"]["holds_vs_defaults_control"] is True
