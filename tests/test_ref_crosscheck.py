"""scripts/ref_crosscheck.py — the reference-binary format cross-check.

Pins the assembly around the real binary (which needs the refbuild shim
and so isn't run here): the doubled-tail temp file handed to the binary,
the score parse, and the logged-sidecar delta.  The binary is replaced
by a stub that records its argv and prints the reference's output shape
(text-cross-entropy.c:198 "%s %.5f").
"""

import importlib.util
import json
import os
import stat

import pytest

from recur_tpu import nn
from recur_tpu.models.alphabet import Alphabet, Metadata
from recur_tpu.ops import init as winit


@pytest.fixture(scope="module")
def tiny_net(tmp_path_factory):
    """A small net in OUR charmodel metadata format (the caravel fixture's
    metadata is JSON and has no alphabet key-value block)."""
    a = Alphabet.from_chars(" abcdefghijklmnopqrstuvwxyz.")
    net = nn.new_net(len(a), 17, len(a), rng_seed=3, depth=6,
                     learn_rate=0.01, momentum=0.9)
    winit.randomise_weights(net)
    net.metadata = Metadata.from_alphabet(a).construct()
    path = tmp_path_factory.mktemp("net") / "x.net"
    nn.save_net(net, str(path))
    return str(path)


@pytest.fixture(scope="module")
def mod():
    spec = importlib.util.spec_from_file_location(
        "ref_crosscheck", os.path.join(os.path.dirname(__file__), "..",
                                       "scripts", "ref_crosscheck.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


@pytest.fixture
def stub(tmp_path):
    """A fake text-cross-entropy: logs argv, checks the doubled tail,
    emits the reference's one-line output."""
    argv_log = tmp_path / "argv.json"
    script = tmp_path / "text-cross-entropy"
    script.write_text(
        "#!/usr/bin/env python3\n"
        "import json, sys\n"
        f"json.dump(sys.argv[1:], open({str(argv_log)!r}, 'w'))\n"
        "text = open(sys.argv[-1]).read()\n"
        "half = len(text) // 2\n"
        "assert text[:half] == text[half:], 'tail must be doubled'\n"
        "print(sys.argv[-1], '%.5f' % 2.34567)\n")
    script.chmod(script.stat().st_mode | stat.S_IEXEC)
    return script, argv_log


def test_score_and_delta(mod, stub, tiny_net, tmp_path):
    binary, argv_log = stub
    net = tmp_path / "x.net"
    os.link(tiny_net, net)
    with open(str(net) + ".json", "w") as f:
        json.dump({"v_entropy": 2.345, "generation": 7}, f)
    corpus = tmp_path / "corpus.txt"
    corpus.write_text("the quick brown fox jumps over the lazy dog. " * 40)
    rec = mod.score_with_reference(str(net), str(corpus),
                                   validate_chars=64, binary=str(binary))
    assert rec["reference_binary_bits_per_char"] == 2.34567
    assert rec["logged_v_entropy"] == 2.345
    assert rec["delta"] == round(2.34567 - 2.345, 4)
    argv = json.load(open(argv_log))
    # -f <net> -i <validate_chars> <tmpfile>
    assert argv[argv.index("-f") + 1] == str(net)
    assert argv[argv.index("-i") + 1] == "64"
    # the temp file is cleaned up
    assert not os.path.exists(argv[-1])


def test_failing_binary_raises(mod, tiny_net, tmp_path):
    bad = tmp_path / "bad"
    bad.write_text("#!/bin/sh\necho broken >&2\nexit 3\n")
    bad.chmod(bad.stat().st_mode | stat.S_IEXEC)
    corpus = tmp_path / "c.txt"
    corpus.write_text("abcdefgh" * 32)
    with pytest.raises(RuntimeError, match="broken"):
        mod.score_with_reference(tiny_net, str(corpus),
                                 validate_chars=32, binary=str(bad))
