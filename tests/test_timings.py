"""Timing-file parsers feed the classifier's target-event grammar."""

from recur_tpu.audio.classify import parse_classes_string, parse_target_string
from recur_tpu.audio.timings import (
    load_binary_timings, load_multiclass_timings, target_string_for_channel)


def test_toggle_timings(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("fileA 1.5 3.0\nfileB\n")
    t = load_binary_timings(str(p), ["Mm"])
    assert set(t) == {"fileA", "fileB"}
    a = t["fileA"]
    # starts in state 0 at t=0, toggles at 1.5 and 3.0
    assert [(c, s) for _, c, s, _ in a] == [("M", 0.0), ("m", 1.5), ("M", 3.0)]
    s = target_string_for_channel(a, 3)
    groups = parse_classes_string("Mm")
    evs = parse_target_string(s, groups, 4, 256)
    assert all(e.channel == 3 for e in evs)


def test_json_call_timings(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text('["fileC", [2.0, 2.5, 9.0], [4.0, 4.1, 0.1]]\n')
    t = load_binary_timings(str(p), ["Mm"], threshold=1.0)
    ev = t["fileC"]
    # initial state, loud call on/off, quiet call as no-train then off
    chars = [c for _, c, _, _ in ev]
    assert chars == ["M", "m", "M", "-", "M"]


def test_group_switching(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("fileA 1.0\ngroup: Kk\nfileB 2.0\n")
    t = load_binary_timings(str(p), ["Mm", "Kk"])
    assert t["fileA"][0][3].endswith(":M=")
    assert t["fileB"][0][3].endswith(":=K")


def test_multiclass_timings(tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("a.wav,c%dt0.00:A c%dt50.23:B\n")
    t = load_multiclass_timings(str(p))
    ev = t["a.wav"]
    assert [(c, s) for _, c, s, _ in ev] == [("A", 0.0), ("B", 50.23)]
    assert target_string_for_channel(ev, 0) == "c0t0.00:A c0t50.23:B"
