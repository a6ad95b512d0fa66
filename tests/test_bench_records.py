"""bench.quality_records — static record assembly for the round headline.

Round-5 regression: the pyc-* sidecars score a DIFFERENT corpus (the
second-corpus replication); a plain *.best.json glob would report e.g.
the pyc h=399 student's 1.799 as an erewhon single-net record.  These
tests pin the corpus separation and the second-corpus block's shape
against a synthetic artifacts tree.
"""

import importlib.util
import json
import os

import pytest


@pytest.fixture
def bench(tmp_path, monkeypatch):
    spec = importlib.util.spec_from_file_location(
        "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    monkeypatch.setattr(mod, "REPO", str(tmp_path))
    sweep = tmp_path / "artifacts" / "sweep"
    sweep.mkdir(parents=True)
    (sweep / "a.net.best.json").write_text(
        json.dumps({"v_entropy": 2.01, "generation": 7}))
    (sweep / "b.net.best.json").write_text(
        json.dumps({"v_entropy": 1.93, "generation": 9}))
    # a second-corpus student BELOW every erewhon record must not leak in
    (sweep / "pyc-h399.net.best.json").write_text(
        json.dumps({"v_entropy": 1.50, "generation": 5}))
    (sweep / "ensemble_big3.json").write_text(
        json.dumps({"ensemble_mixture": 1.88, "per_net": {}}))
    (sweep / "ensemble_pyc.json").write_text(
        json.dumps({"ensemble_mixture": 1.40, "per_net": {}}))
    return mod


def test_erewhon_records_exclude_second_corpus(bench):
    q = bench.quality_records()
    assert q["best_single_net_v_entropy"] == 1.93
    assert q["best_single_net_artifact"] == "b.net.best.json"
    assert q["best_ensemble_v_entropy"] == 1.88
    assert q["best_ensemble_artifact"] == "ensemble_big3.json"


def test_second_corpus_block(bench, tmp_path):
    rep = tmp_path / "artifacts" / "ref_pycorpus"
    rep.mkdir(parents=True)
    (rep / "replication.json").write_text(json.dumps({"ordering": {
        "students": {"pyc-h199-distill-a50": 1.928,
                     "pyc-h399-distill-a50": 1.799},
        "reference_defaults_control": 2.2045,
        "reference_generous_control": 1.9674,
        "holds_vs_defaults_control": True,
    }}))
    q = bench.quality_records()
    s = q["second_corpus"]
    assert s["best_student"] == 1.799
    assert s["ordering_holds"] is True
    assert s["reference_defaults_control"] == 2.2045


def test_second_corpus_absent_is_none(bench):
    assert bench.quality_records()["second_corpus"] is None
