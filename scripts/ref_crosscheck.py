#!/usr/bin/env python
"""Score record nets with the REFERENCE's own binary (format compliance).

For each net, the corpus is encoded with the net's stored alphabet
exactly as text-predict --validate-chars does, the last N symbols are
decoded back to text, and the reference's text-cross-entropy
(rnn_load_net, recur-nn-io.c:149; get_cross_entropy,
charmodel-predict.c:63-80) scores a doubled copy of that tail with
--ignore-first N: the first lap primes the hidden state through the
skipped chars (charmodel-predict.c:69-71), the second lap is scored —
the same warm-carried-hidden protocol as the training logs' v_entropy
(RnnCharVentropy, charmodel-predict.c:216-257; our Ventropy warms
across laps of the same tail), up to the lap skip (5 vs N) and the
normalisation tail (len-skip-1).  Agreement within a few hundredths of
a bit proves the reference's loader AND forward pass reproduce our
nets' quality — the .net files are drop-in for reference users.

Build the binary first:  scripts/refbuild/build.sh

    PYTHONPATH=/root/repo python scripts/ref_crosscheck.py \
        --out artifacts/ref_crosscheck/crosscheck.json \
        artifacts/sweep/h799-distill-best41-a50.net.best ...
"""

import argparse
import json
import os
import re
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BIN = "/tmp/refbuild/text-cross-entropy"
EREWHON = "/root/reference/test-images/erewhon.txt"


def score_with_reference(net_path: str, corpus: str,
                         validate_chars: int = 10000,
                         binary: str = BIN) -> dict:
    from recur_tpu import nn
    from recur_tpu.models.alphabet import Metadata

    net = nn.load_net(net_path)
    alpha = Metadata.parse(net.metadata).to_alphabet()
    with open(corpus, "rb") as f:
        tokens = alpha.encode(f.read())
    tail = alpha.decode(tokens[-validate_chars:])
    fd, tmp = tempfile.mkstemp(suffix=".txt")
    try:
        with os.fdopen(fd, "w") as f:
            f.write(tail + tail)
        r = subprocess.run(
            ["nice", "-n", "19", binary, "-f", net_path,
             "-i", str(validate_chars), tmp],
            capture_output=True, text=True, timeout=3600)
    finally:
        os.unlink(tmp)
    if r.returncode != 0:
        raise RuntimeError(f"{binary} failed on {net_path}: "
                           f"{r.stderr.strip()[-500:]}")
    m = re.search(r" (\d+\.\d+)\s*$", r.stdout.strip().splitlines()[-1])
    if not m:
        raise RuntimeError(f"unparsable output: {r.stdout[-200:]}")
    ref_score = float(m.group(1))
    rec = {"net": os.path.relpath(net_path, REPO), "corpus": corpus,
           "validate_chars": validate_chars,
           "reference_binary_bits_per_char": ref_score}
    sidecar = net_path + ".json"
    if os.path.exists(sidecar):
        with open(sidecar) as f:
            logged = json.load(f)
        rec["logged_v_entropy"] = logged.get("v_entropy")
        rec["logged_generation"] = logged.get("generation")
        if rec["logged_v_entropy"]:
            rec["delta"] = round(ref_score - rec["logged_v_entropy"], 4)
    return rec


def main(argv=None) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("nets", nargs="+")
    p.add_argument("--corpus", default=EREWHON,
                   help="corpus whose tail is the validation text; "
                        "per-net override with NET=CORPUS syntax")
    p.add_argument("--validate-chars", type=int, default=10000)
    p.add_argument("--binary", default=BIN)
    p.add_argument("--out", default=None)
    opt = p.parse_args(argv)
    if not os.path.exists(opt.binary):
        p.error(f"{opt.binary} missing — run scripts/refbuild/build.sh")
    rows = []
    for spec in opt.nets:
        net_path, _, corpus = spec.partition("=")
        rec = score_with_reference(net_path, corpus or opt.corpus,
                                   opt.validate_chars, opt.binary)
        rows.append(rec)
        print(json.dumps(rec), flush=True)
    record = {"binary": opt.binary,
              "protocol": "doubled validation tail, --ignore-first "
                          "validate_chars (first lap primes, second "
                          "scored: warm-carried-hidden, matching the "
                          "logged v_entropy protocol)",
              "rows": rows}
    if opt.out:
        os.makedirs(os.path.dirname(opt.out), exist_ok=True)
        with open(opt.out, "w") as f:
            json.dump(record, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
