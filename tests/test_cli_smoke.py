"""CLI regression smoke: the flagship text-predict path runs end-to-end in a
subprocess (guards argument parsing, wiring, logging, save)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EREWHON = "/root/reference/test-images/erewhon.txt"


def run_cli(module, args, timeout=300):
    env = dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu")
    return subprocess.run(
        [sys.executable, "-m", module] + args, capture_output=True,
        text=True, timeout=timeout, env=env, cwd=REPO)


@pytest.mark.skipif(not os.path.exists(EREWHON), reason="corpus missing")
def test_text_predict_then_confab_and_xe(tmp_path):
    net = str(tmp_path / "t.net")
    r = run_cli("recur_tpu.cli.text_predict",
                ["--stop-after", "600", "--multi-tap", "4",
                 "--learn-rate", "1e-4", "--report-interval", "300",
                 "--filename", net, "--log-file", str(tmp_path / "t.log"),
                 "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(net)
    log = (tmp_path / "t.log").read_text()
    assert "t_entropy" in log

    r = run_cli("recur_tpu.cli.text_confabulate",
                ["-f", net, "-n", "40", "-b", "1.0"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert len(r.stdout.strip()) >= 30

    sample = str(tmp_path / "s.txt")
    with open(EREWHON, "rb") as f, open(sample, "wb") as g:
        g.write(f.read(1500))
    r = run_cli("recur_tpu.cli.text_cross_entropy", ["-f", net, sample])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "bits/char" in r.stdout

    r = run_cli("recur_tpu.cli.convert_saved_net",
                [net, str(tmp_path / "c.net")])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(tmp_path / "c.net")
