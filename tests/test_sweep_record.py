"""sweep_record.py — recording an orphaned sweep leg into sweep.json.

The driver-surgery pattern (CLAUDE.md) leaves a finished leg's result
only in its log; these tests pin the recorder's parse (identical to
quality_sweep.best_v_entropy), its double-record refusal, and its
live-pid guard, all on a temp workdir.
"""

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
import sweep_record  # noqa: E402

LOG = """\
generation 1000
v_entropy 2.5
generation 2000
v_entropy 2.1
generation 3000
v_entropy 2.3
"""


def dead_pid() -> int:
    p = subprocess.Popen(["true"])
    p.wait()
    return p.pid


def record(args, workdir):
    """Run sweep_record.main isolated from the real /tmp/sweep.pid (a
    live driver on the box must not fail the suite)."""
    return sweep_record.main(
        args + ["--sweep-pid-file", str(workdir / "no-driver.pid")])


@pytest.fixture
def workdir(tmp_path):
    (tmp_path / "sweep.json").write_text(json.dumps(
        {"generations": 1, "probes": [
            {"tag": "old-arm", "rc": 0, "best_v_entropy": 2.0,
             "best_at_gen": 500, "seconds": 1.0}]}))
    (tmp_path / "fresh-arm.log").write_text(LOG)
    return tmp_path


def test_records_best_from_log(workdir):
    rc = record(["fresh-arm", "--workdir", str(workdir),
                 "--pid", str(dead_pid()),
                 "--note", "test"], workdir)
    assert rc == 0
    probes = json.load(open(workdir / "sweep.json"))["probes"]
    rec = probes[-1]
    assert rec["tag"] == "fresh-arm"
    assert rec["best_v_entropy"] == 2.1
    assert rec["best_at_gen"] == 2000
    assert rec["note"] == "test"
    assert len(probes) == 2


def test_refuses_double_record(workdir):
    pid = str(dead_pid())
    assert record(
        ["fresh-arm", "--workdir", str(workdir), "--pid", pid],
        workdir) == 0
    assert record(
        ["fresh-arm", "--workdir", str(workdir), "--pid", pid],
        workdir) == 1
    probes = json.load(open(workdir / "sweep.json"))["probes"]
    assert sum(r["tag"] == "fresh-arm" for r in probes) == 1
    # --force appends anyway
    assert record(["fresh-arm", "--workdir", str(workdir),
                   "--pid", pid, "--force"], workdir) == 0
    probes = json.load(open(workdir / "sweep.json"))["probes"]
    assert sum(r["tag"] == "fresh-arm" for r in probes) == 2


def test_refuses_while_leg_alive(workdir):
    assert record(["fresh-arm", "--workdir", str(workdir),
                   "--pid", str(os.getpid())], workdir) == 1
    probes = json.load(open(workdir / "sweep.json"))["probes"]
    assert all(r["tag"] != "fresh-arm" for r in probes)


def test_refuses_while_driver_alive(workdir):
    pidfile = workdir / "driver.pid"
    pidfile.write_text(str(os.getpid()))
    assert sweep_record.main(
        ["fresh-arm", "--workdir", str(workdir),
         "--pid", str(dead_pid()),
         "--sweep-pid-file", str(pidfile)]) == 1
    # a dead driver pid unblocks recording
    pidfile.write_text(str(dead_pid()))
    assert sweep_record.main(
        ["fresh-arm", "--workdir", str(workdir),
         "--pid", str(dead_pid()),
         "--sweep-pid-file", str(pidfile)]) == 0


def test_missing_log_is_an_error(workdir):
    assert record(["no-such-arm", "--workdir", str(workdir),
                   "--pid", str(dead_pid())], workdir) == 1
