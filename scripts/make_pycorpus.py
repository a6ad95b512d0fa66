#!/usr/bin/env python
"""Build the second-corpus fixture for the quality-recipe replication.

VERDICT r4 next-step #1: every erewhon quality record was tuned against
one 10k-char validation tail of one 560KB book; the round-5 replication
needs a *never-tuned* corpus of comparable size.  No second English book
ships in this image (zero egress), so the corpus is Python-3.12 stdlib
source: deterministic, license-clean, byte-stable, and a genuinely
different character-level domain (punctuation-heavy, case-significant,
long-range indentation structure).

Files are the top-level stdlib modules sorted by name, concatenated until
the corpus reaches erewhon.txt's size (471,659 bytes), so the train/
validation split protocol (charmodel-predict.c:216-257 ventropy on the
tail) carries over unchanged.

    python scripts/make_pycorpus.py          # writes corpus/pycorpus.txt
"""

import glob
import os
import sys
import sysconfig

TARGET_BYTES = 471_659  # len(erewhon.txt): scale-match the tuned corpus
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "corpus", "pycorpus.txt")


def main() -> int:
    stdlib = sysconfig.get_path("stdlib")
    files = sorted(glob.glob(os.path.join(stdlib, "*.py")))
    if not files:
        print(f"no stdlib sources under {stdlib}", file=sys.stderr)
        return 1
    chunks, size = [], 0
    for path in files:
        with open(path, "rb") as f:
            data = f.read()
        chunks.append(data)
        size += len(data)
        if size >= TARGET_BYTES:
            break
    corpus = b"".join(chunks)[:TARGET_BYTES]
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "wb") as f:
        f.write(corpus)
    n_files = len(chunks)
    print(f"wrote {OUT}: {len(corpus)} bytes from {n_files} stdlib files "
          f"({os.path.basename(files[0])} .. {os.path.basename(files[n_files-1])})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
