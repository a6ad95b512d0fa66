"""CLI regression smoke: the flagship text-predict path runs end-to-end in a
subprocess (guards argument parsing, wiring, logging, save)."""

import json
import os
import shutil
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
@pytest.mark.slow
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


def _write_tone_wavs(d, classes="ab", rate=8000, secs=1.2):
    """Two-class toy corpus: class a = 500Hz tone, class b = white noise."""
    import numpy as np
    from recur_tpu.audio.wavio import write_wav
    rng = np.random.default_rng(0)
    paths = {}
    t = np.arange(int(rate * secs)) / rate
    for i, c in enumerate(classes):
        for j in range(2):
            if i == 0:
                x = 0.4 * np.sin(2 * np.pi * (500 + 40 * j) * t)
            else:
                x = 0.3 * rng.standard_normal(t.shape)
            p = str(d / f"{c}-{j}.wav")
            write_wav(p, (x * 32000).astype(np.int16), rate)
            paths.setdefault(c, []).append(p)
    return paths


@pytest.mark.slow
def test_audio_classify_cli_chain(tmp_path):
    """classify-train -> classify-test -> multi-test -> find-bird-calls ->
    classify-monitor on a synthetic 2-class corpus."""
    wavs = _write_tone_wavs(tmp_path)
    train_list = tmp_path / "train.txt"
    test_list = tmp_path / "test.txt"
    train_list.write_text("".join(f"{wavs[c][0]} {c}\n" for c in "ab"))
    test_list.write_text("".join(f"{wavs[c][1]} {c}\n" for c in "ab"))
    net = str(tmp_path / "c.net")
    r = run_cli("recur_tpu.cli.classify_train",
                ["-c", "ab", "--train-list", str(train_list),
                 "--test-list", str(test_list), "-n", "4", "-w", "256",
                 "-H", "23", "--cycles", "1", "-f", net,
                 "--log-file", str(tmp_path / "c.log"), "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(net)

    r = run_cli("recur_tpu.cli.classify_test",
                ["-f", net, "-c", "ab", "--test-list", str(test_list),
                 "-n", "4", "-w", "256", "--json"])
    assert r.returncode == 0, r.stderr[-2000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert "auc" in json.dumps(out).lower() or out

    r = run_cli("recur_tpu.cli.multi_test",
                [net, net, "-c", "ab", "--test-list", str(test_list),
                 "-n", "4", "-w", "256", "--json"])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli("recur_tpu.cli.find_bird_calls",
                [wavs["a"][1], "-f", net, "-c", "ab", "-w", "256",
                 "-t", "0.9"])
    assert r.returncode == 0, r.stderr[-2000:]

    r = run_cli("recur_tpu.cli.classify_monitor",
                [wavs["b"][1], "-f", net, "-c", "ab", "-w", "256"])
    assert r.returncode == 0, r.stderr[-2000:]


@pytest.mark.slow
def test_text_classify_cli(tmp_path):
    """text-classify trains a 2-language classifier; results CLI scores."""
    f1 = tmp_path / "lang1.txt"
    f2 = tmp_path / "lang2.txt"
    f1.write_text("the cat sat on the mat and then ran off " * 30)
    f2.write_text("zuzu quix vrom klatu barada nikto blarg " * 30)
    lst = tmp_path / "list.txt"
    lst.write_text(f"{f1} en\n{f2} zz\n")
    net = str(tmp_path / "tc.net")
    r = run_cli("recur_tpu.cli.text_classify",
                ["--file-list", str(lst), "-H", "19", "--depth", "8",
                 "--epochs", "2", "--multi-tap", "4", "-l", "0.01",
                 "--filename", net, "--log-file", str(tmp_path / "tc.log"),
                 "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(net)
    r = run_cli("recur_tpu.cli.text_classify_results",
                ["-f", net, str(f1), str(f2)])
    assert r.returncode == 0, r.stderr[-2000:]
    assert r.stdout.strip()


def test_xml_lang_classify_cli(tmp_path):
    xml = tmp_path / "tei.xml"
    xml.write_text(
        '<TEI xmlns:xml="http://www.w3.org/XML/1998/namespace">'
        '<text><p xml:lang="en">' +
        "the quick brown fox jumps over the lazy dog " * 20 +
        '</p><p xml:lang="fr">' +
        "portez ce vieux whisky au juge blond qui fume " * 20 +
        "</p></text></TEI>")
    r = run_cli("recur_tpu.cli.xml_lang_classify",
                [str(xml), "-H", "19", "--epochs", "1", "--multi-tap", "4",
                 "-f", str(tmp_path / "x.net"),
                 "--log-file", str(tmp_path / "x.log"), "-q"])
    assert r.returncode == 0, r.stderr[-2000:]


def test_parrot_cli(tmp_path):
    import numpy as np
    from recur_tpu.audio.wavio import write_wav
    t = np.arange(8000) / 8000.0
    write_wav(str(tmp_path / "in.wav"),
              (0.4 * np.sin(2 * np.pi * 330 * t) * 32000).astype(np.int16),
              8000)
    out = str(tmp_path / "dream.wav")
    r = run_cli("recur_tpu.cli.parrot",
                ["--train-audio", str(tmp_path / "in.wav"), "--epochs", "1",
                 "-o", out, "-n", "0.5", "-H", "23", "-w", "256",
                 "-f", str(tmp_path / "p.net"), "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_rnnca_player_cli(tmp_path):
    import numpy as np
    from recur_tpu.utils.video_io import write_y4m
    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 255, (3, 24, 32), np.uint8).astype(np.uint8)
              for _ in range(4)]
    vid = str(tmp_path / "in.y4m")
    write_y4m(vid, frames, 32, 24)
    out = str(tmp_path / "out.y4m")
    r = run_cli("recur_tpu.cli.rnnca_player",
                ["--train-video", vid, "--epochs", "1", "-o", out,
                 "-n", "3", "-H", "23", "-f", str(tmp_path / "r.net"), "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


def test_recur_player_cli(tmp_path):
    import numpy as np
    from recur_tpu.utils.video_io import write_y4m
    rng = np.random.default_rng(2)
    frames = [rng.integers(0, 255, (3, 24, 32), np.uint8).astype(np.uint8)
              for _ in range(4)]
    vid = str(tmp_path / "in.y4m")
    write_y4m(vid, frames, 32, 24)
    out = str(tmp_path / "out.y4m")
    r = run_cli("recur_tpu.cli.recur_player",
                ["--train-video", vid, "--epochs", "1", "-o", out,
                 "-n", "2", "-f", str(tmp_path / "rc.net"), "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(out)


@pytest.mark.skipif(not os.path.exists(EREWHON), reason="corpus missing")
@pytest.mark.slow
def test_text_predict_override_params(tmp_path):
    """--reload keeps the file's learn-rate; --reload -o applies the CLI's
    (text-predict.c:517-522)."""
    net = str(tmp_path / "o.net")
    base = ["--stop-after", "300", "--multi-tap", "4",
            "--report-interval", "200", "--filename", net, "-q"]
    r = run_cli("recur_tpu.cli.text_predict",
                base + ["--learn-rate", "1e-4",
                        "--log-file", str(tmp_path / "o1.log")])
    assert r.returncode == 0, r.stderr[-2000:]
    r = run_cli("recur_tpu.cli.text_predict",
                base + ["--learn-rate", "7e-3", "--reload",
                        "--log-file", str(tmp_path / "o2.log")])
    assert r.returncode == 0, r.stderr[-2000:]
    lr = [l for l in (tmp_path / "o2.log").read_text().splitlines()
          if l.startswith("learn-rate")][-1]
    assert lr.split()[1] == "0.0001"
    r = run_cli("recur_tpu.cli.text_predict",
                base + ["--learn-rate", "7e-3", "--reload", "-o",
                        "--log-file", str(tmp_path / "o3.log")])
    assert r.returncode == 0, r.stderr[-2000:]
    lr = [l for l in (tmp_path / "o3.log").read_text().splitlines()
          if l.startswith("learn-rate")][-1]
    assert lr.split()[1] == "0.007"


def test_text_predict_log_keys(tmp_path):
    """A fresh training log must carry every key ./plot's DEFAULT_KEYS wants
    (recur-nn.c:415-448, 762-770; round-1 missing #6)."""
    log = tmp_path / "t.log"
    r = run_cli("recur_tpu.cli.text_predict",
                ["--text", "/root/reference/test-images/erewhon.txt",
                 "--stop-after", "3000", "--quiet", "--log-weight-sum",
                 "--log-file", str(log),
                 "--basename", str(tmp_path / "t"),
                 "--filename", str(tmp_path / "t.net")])
    assert r.returncode == 0, r.stderr[-2000:]
    keys = {line.split()[0] for line in log.read_text().splitlines()
            if line.strip()}
    default_keys = {"error_sum", "error", "depth", "error_gain", "correct",
                    "top_error_raw", "weight_sum", "hidden_zeros",
                    "hidden_magnitude", "hidden_sum", "ih_scale",
                    "t_entropy", "v_entropy", "per_second"}
    missing = default_keys - keys
    assert not missing, missing


@pytest.mark.skipif(not os.path.exists(EREWHON), reason="corpus missing")
@pytest.mark.slow
def test_text_cross_entropy_ensemble(tmp_path):
    """Repeated -f scores with a mixture ensemble: self-ensemble is
    identical to the single net; a two-seed ensemble runs end-to-end, as
    does scripts/ensemble_eval.py on the validation protocol."""
    nets = []
    for seed in (1, 2):
        net = str(tmp_path / f"e{seed}.net")
        r = run_cli("recur_tpu.cli.text_predict",
                    ["--stop-after", "600", "--multi-tap", "4",
                     "--learn-rate", "1e-4", "--rng-seed", str(seed),
                     "--report-interval", "300", "--filename", net, "-q"])
        assert r.returncode == 0, r.stderr[-2000:]
        nets.append(net)
    sample = str(tmp_path / "s.txt")
    with open(EREWHON, "rb") as f, open(sample, "wb") as g:
        g.write(f.read(1500))

    single = run_cli("recur_tpu.cli.text_cross_entropy",
                     ["-f", nets[0], sample])
    selfpair = run_cli("recur_tpu.cli.text_cross_entropy",
                       ["-f", nets[0], "-f", nets[0], sample])
    assert single.returncode == 0 and selfpair.returncode == 0
    score = float(single.stdout.split(":")[1].split()[0])
    self_score = float(selfpair.stdout.split(":")[1].split()[0])
    assert abs(score - self_score) < 2e-3, (score, self_score)

    pair = run_cli("recur_tpu.cli.text_cross_entropy",
                   ["-f", nets[0], "-f", nets[1], sample])
    assert pair.returncode == 0, pair.stderr[-2000:]
    assert "bits/char" in pair.stdout
    geo = run_cli("recur_tpu.cli.text_cross_entropy",
                  ["-f", nets[0], "-f", nets[1],
                   "--ensemble-op", "geometric", sample])
    assert geo.returncode == 0, geo.stderr[-2000:]

    out = str(tmp_path / "ens.json")
    r = subprocess.run(
        [sys.executable, "scripts/ensemble_eval.py", "--text", sample,
         "--validate-chars", "400", "--out", out] + nets,
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.load(open(out))
    assert rec["ensemble_mixture"] > 0
    assert len(rec["per_net"]) == 2

    # --prefer-best swaps members for their <net>.best record snapshots
    # (here: a copy of the other net, so the per_net keys prove the swap)
    shutil.copy(nets[1], nets[0] + ".best")
    r = subprocess.run(
        [sys.executable, "scripts/ensemble_eval.py", "--text", sample,
         "--validate-chars", "400", "--prefer-best", "--out", out] + nets,
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.load(open(out))
    assert nets[0] + ".best" in rec["per_net"], rec["per_net"]
    assert nets[1] in rec["per_net"]


@pytest.mark.skipif(not os.path.exists(EREWHON), reason="corpus missing")
@pytest.mark.slow
def test_ensemble_harvest_collects_and_excludes(tmp_path):
    """ensemble_harvest globs .best/.ema/.g<GEN> snapshots from a sweep
    dir, honours --exclude (distilled students stay out of mixtures that
    already contain their teachers), and a mixture of identical copies
    scores exactly the solo net."""
    net = str(tmp_path / "seed.net")
    r = run_cli("recur_tpu.cli.text_predict",
                ["--stop-after", "300", "--multi-tap", "4",
                 "--learn-rate", "1e-4", "--report-interval", "300",
                 "--filename", net, "-q"])
    assert r.returncode == 0, r.stderr[-2000:]
    work = tmp_path / "sweep"
    work.mkdir()
    for member in ("a.net.best", "b.net.ema", "b.net.g500000",
                   "h-distill-x.net.best"):
        shutil.copy(net, work / member)
    sample = str(tmp_path / "s.txt")
    with open(EREWHON, "rb") as f, open(sample, "wb") as g:
        g.write(f.read(1500))
    out = str(tmp_path / "harvest.json")
    r = subprocess.run(
        [sys.executable, "scripts/ensemble_harvest.py", "--text", sample,
         "--workdir", str(work), "--validate-chars", "400",
         "--max-solo", "99", "--exclude", "distill", "--out", out],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env=dict(os.environ, PYTHONPATH=REPO, JAX_PLATFORMS="cpu"))
    assert r.returncode == 0, r.stderr[-2000:]
    rec = json.load(open(out))
    names = sorted(os.path.basename(m) for m in rec["members"])
    assert names == ["a.net.best", "b.net.ema", "b.net.g500000"], names
    # identical members: the mixture IS the solo score
    solos = set(round(v, 6) for v in rec["per_net"].values())
    assert len(solos) == 1
    assert abs(rec["ensemble_mixture"] - next(iter(solos))) < 1e-4


def test_sweep_driver_seeds_lost_reload_target(tmp_path):
    """A --reload arm whose .net target is gone (gitignored; only the
    .best snapshot is committed) is seeded from the .best so the leg
    continues from the record instead of restarting at generation 0."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from quality_sweep import seed_reload_target
    finally:
        sys.path.pop(0)
    target = tmp_path / "arm.net"
    (tmp_path / "arm.net.best").write_bytes(b"weights")
    extra = ["--reload", "--filename", "arm.net"]
    assert seed_reload_target(extra, repo=str(tmp_path)) == "arm.net.best"
    assert target.read_bytes() == b"weights"
    # present target: untouched
    target.write_bytes(b"newer")
    assert seed_reload_target(extra, repo=str(tmp_path)) is None
    assert target.read_bytes() == b"newer"
    # non-reload arms never seed
    assert seed_reload_target(["--filename", "arm.net"],
                              repo=str(tmp_path)) is None
    # the helper scans the FULL cmd with argparse last-wins semantics:
    # a driver-default --filename earlier in cmd is overridden by the
    # probe's own, and --reload may come from opt.extra at the end
    target.unlink()
    cmd = ["text_predict", "--filename", "default/tag.net",
           "--quiet", "--filename", "arm.net", "--reload"]
    assert seed_reload_target(cmd, repo=str(tmp_path)) == "arm.net.best"
    assert target.read_bytes() == b"weights"
    # malformed: --filename as the final token must not crash the driver
    assert seed_reload_target(["--reload", "--filename"],
                              repo=str(tmp_path)) is None
    # a --reload arm relying on the driver default (single --filename)
    target2 = tmp_path / "tag.net"
    (tmp_path / "tag.net.best").write_bytes(b"w2")
    assert seed_reload_target(["--filename", "tag.net", "--reload"],
                              repo=str(tmp_path)) == "tag.net.best"
    assert target2.read_bytes() == b"w2"


def test_sweep_driver_resumes_interrupted_leg(tmp_path):
    """maybe_resume (round 5): a non-reload arm whose tag artifact exists
    continues it with --reload instead of restarting at generation 0 (a
    watchdog-killed pyc leg restarted fresh and threw away 1.8M gens)."""
    sys.path.insert(0, os.path.join(REPO, "scripts"))
    try:
        from quality_sweep import maybe_resume
    finally:
        sys.path.pop(0)
    # no artifact: fresh start, cmd untouched
    cmd = ["--filename", "arm.net"]
    assert maybe_resume(cmd, repo=str(tmp_path)) is None
    assert cmd == ["--filename", "arm.net"]
    # interrupted attempt left the .net: resume it in place
    (tmp_path / "arm.net").write_bytes(b"mid-leg")
    cmd = ["--filename", "arm.net"]
    assert maybe_resume(cmd, repo=str(tmp_path)) == "arm.net"
    assert cmd[-1] == "--reload"
    # only the .best snapshot survived (fresh session): copy it in
    (tmp_path / "arm.net").unlink()
    (tmp_path / "arm.net.best").write_bytes(b"record")
    cmd = ["--filename", "arm.net"]
    assert maybe_resume(cmd, repo=str(tmp_path)) == "arm.net.best"
    assert cmd[-1] == "--reload"
    assert (tmp_path / "arm.net").read_bytes() == b"record"
    # arms that already carry --reload keep seed_reload_target semantics
    (tmp_path / "arm.net").unlink()
    cmd = ["--reload", "--filename", "arm.net"]
    assert maybe_resume(cmd, repo=str(tmp_path)) == "arm.net.best"
    assert cmd.count("--reload") == 1
    # malformed --filename tail must not crash the driver
    assert maybe_resume(["--filename"], repo=str(tmp_path)) is None
    assert maybe_resume([], repo=str(tmp_path)) is None
